"""Native C++ data-path kernels vs PIL/numpy references."""

import numpy as np
import pytest
from PIL import Image

from mm_interleaved_tpu.data import native


def test_native_builds():
    assert native.is_available(), "g++ build of native/mmi_native.cpp failed"


def test_u8_to_f32():
    x = np.random.RandomState(0).randint(0, 256, (7, 5, 3), np.uint8)
    np.testing.assert_allclose(
        native.u8_to_f32(x), x.astype(np.float32) / 255.0, atol=1e-7
    )


def test_bicubic_matches_pil_closely():
    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, (64, 48, 3), np.uint8)
    ours = native.resize_bicubic(src, 32, 24).astype(np.float32)
    pil = np.asarray(
        Image.fromarray(src).resize((24, 32), Image.BICUBIC)
    ).astype(np.float32)
    # PIL uses a separable implementation with slightly different edge
    # handling; interior pixels agree to within a few grey levels.
    diff = np.abs(ours - pil)[2:-2, 2:-2]
    assert diff.mean() < 2.0, diff.mean()
    assert np.median(diff) <= 1.0


def test_crop_resize_fused():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 256, (40, 40, 3), np.uint8)
    out = native.crop_resize_to_f32(src, 4, 6, 32, 28, 16, 14)
    assert out.shape == (16, 14, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # cross-check against two-step native path
    two_step = native.resize_bicubic(
        src[4:36, 6:34], 16, 14
    ).astype(np.float32) / 255.0
    assert np.abs(out - two_step).mean() < 0.02
