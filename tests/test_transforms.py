import numpy as np
from PIL import Image

from mm_interleaved_tpu.data.transforms import (
    DualImageTransform,
    ImageTransform,
    create_transform,
)


def _img(h=100, w=80):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8))


def test_single_transform():
    t = ImageTransform(size=32)
    out = t(_img())
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # deterministic without rng
    np.testing.assert_array_equal(out, t(_img()))


def test_dual_transform_alignment():
    t = DualImageTransform(encoder_size=16, decoder_size=32)
    enc, dec = t(_img())
    assert enc.shape == (16, 16, 3) and dec.shape == (32, 32, 3)
    # same crop: downscaling dec to enc size should be close to enc
    from mm_interleaved_tpu.data import native

    dec_small = native.resize_bicubic(
        (dec * 255).astype(np.uint8), 16, 16
    ).astype(np.float32) / 255.0
    assert np.abs(dec_small - enc).mean() < 0.03


def test_random_flip_uses_rng():
    t = ImageTransform(size=16, random_flip=True)
    img = _img()
    outs = {t(img, np.random.RandomState(s)).tobytes() for s in range(8)}
    assert len(outs) == 2  # flipped and unflipped variants


def test_factory():
    assert isinstance(create_transform("numpy"), ImageTransform)
    assert isinstance(create_transform("dual_numpy"), DualImageTransform)
    assert not create_transform("resize").center_crop
    assert create_transform("flip").random_flip
