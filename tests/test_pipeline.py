"""Training pipeline: synthetic doc stream -> packing -> collation (host-only)."""

import numpy as np

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.data.pipeline import build_train_iterator

CFG = tiny_config()


def test_synthetic_train_iterator_shapes():
    data_cfg = dict(
        datasets=[{"name": "synthetic", "num_samples": 40}],
        per_device_batch_size=4,
        seed=0,
    )
    it, example = build_train_iterator(data_cfg, CFG)
    S = CFG.special
    for _ in range(3):
        batch = next(it)
        assert batch["text_ids"].shape == (4, CFG.seq_len)
        assert batch["image_tensors"].shape[:2] == (4, CFG.max_num_images)
        assert batch["image_tensors_dec"].shape[2] == (
            CFG.image_decoder.image_size
        )
        n_img_tok = (batch["text_ids"] == S.image_token_id).sum(axis=1)
        np.testing.assert_array_equal(
            n_img_tok // CFG.num_img_token, batch["num_image_per_seq"]
        )
        assert (batch["num_image_per_seq"] >= 1).all()
        assert (batch["num_image_per_seq"] <= CFG.max_num_images).all()


def test_iterator_is_deterministic():
    data_cfg = dict(
        datasets=[{"name": "synthetic", "num_samples": 20}],
        per_device_batch_size=2,
        seed=7,
    )
    it1, _ = build_train_iterator(data_cfg, CFG)
    it2, _ = build_train_iterator(data_cfg, CFG)
    b1, b2 = next(it1), next(it2)
    np.testing.assert_array_equal(b1["text_ids"], b2["text_ids"])
    np.testing.assert_allclose(b1["image_tensors"], b2["image_tensors"])
