"""Storytelling: collator + autoregressive image-feedback eval loop."""

import numpy as np
import jax
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.data.collators_extra import StoryCollator
from mm_interleaved_tpu.data.tokenizer import SimpleWordTokenizer
from mm_interleaved_tpu.engine.evaluator import EvalConfig, Evaluator
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

CFG = tiny_config(with_image_decoder=True)
TOK = SimpleWordTokenizer(vocab_size=CFG.llm.vocab_size)


def story_items(n=2, frames=2, seed=0):
    rng = np.random.RandomState(seed)
    return [
        dict(
            sentences=[f"scene {i} frame {j}" for j in range(frames)],
            images=[rng.rand(56, 56, 3).astype(np.float32)
                    for _ in range(frames)],
            target_rounds=[frames - 1],
            index=i,
            story_id=f"s{i}",
        )
        for i in range(n)
    ]


def test_story_collator_shapes():
    coll = StoryCollator(TOK, TOK.special, num_img_token=CFG.num_img_token,
                         seq_len=48, max_num_images=CFG.max_num_images)
    batch = coll(story_items())
    assert batch["text_ids"].shape[0] == 2
    assert batch["target_image_slots"].shape == (2, 1)
    assert (batch["target_image_slots"][:, 0] == 1).all()
    n_img_tok = (batch["text_ids"] == TOK.special.image_token_id).sum(axis=1)
    np.testing.assert_array_equal(
        n_img_tok // CFG.num_img_token, batch["num_image_per_seq"]
    )


def _toy_feature_fn(images):
    """[N, H, W, 3] -> [N, 8]: fixed random projection of downsampled
    pixels (stand-in for CLIP/Inception features in loop tests)."""
    x = np.asarray(images, np.float32)
    x = x[:, :: max(1, x.shape[1] // 4), :: max(1, x.shape[2] // 4)]
    flat = x.reshape(len(x), -1)
    proj = np.random.RandomState(0).randn(flat.shape[1], 8)
    return flat @ proj


@pytest.fixture(scope="module")
def story_model():
    model = MMInterleaved(CFG)
    coll = StoryCollator(TOK, TOK.special, num_img_token=CFG.num_img_token,
                         seq_len=48, max_num_images=CFG.max_num_images)
    batch = coll(story_items())
    import jax.numpy as jnp

    jbatch = {k: (jnp.asarray(v) if not isinstance(v, list) else v)
              for k, v in batch.items()}
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        jbatch["text_ids"], jbatch["image_tensors"],
        jbatch["num_image_per_seq"], jbatch["attention_mask"],
        image_tensors_dec=jnp.zeros(
            (2, CFG.max_num_images, 16, 16, 3), jnp.float32
        ),
    )
    return model, params, coll, jbatch


@pytest.mark.slow
def test_storytelling_eval_loop(story_model, tmp_path):
    model, params, coll, jbatch = story_model
    ev = Evaluator(model, params, TOK, EvalConfig(
        num_inference_steps=2, output_dir=str(tmp_path),
    ))
    result = ev.evaluate_storytelling(
        iter([jbatch]), "tiny_story", feature_fn=_toy_feature_fn
    )
    assert result["num_generated"] == 2
    assert np.isfinite(result["fid"]) and result["fid"] >= 0.0
    assert -1.0 <= result["clip_sim_i2i"] <= 1.0
    import os

    files = os.listdir(tmp_path / "tiny_story")
    assert len(files) == 2


@pytest.mark.slow
def test_segm2img_eval_loop(story_model, tmp_path):
    """ADE20k-style generate_segm route: StoryCollator batch, pluggable
    segmenter, official intersection-and-union mIoU."""
    model, params, coll, jbatch = story_model
    ev = Evaluator(model, params, TOK, EvalConfig(
        num_inference_steps=2, output_dir=str(tmp_path),
    ))
    rng = np.random.RandomState(3)
    gt = {i: rng.randint(0, 5, (16, 16)) for i in range(2)}

    def fake_segment(img):
        # constant class-1 prediction at generated resolution
        return np.ones(img.shape[:2], np.int32)

    result = ev.evaluate_segm2img(
        iter([jbatch]), gt, segment_fn=fake_segment,
        dataset_name="tiny_ade20k", num_classes=5,
    )
    assert result["num_generated"] == 2
    assert 0.0 <= result["miou"] <= 1.0


@pytest.mark.slow
def test_t2i_eval_fid_and_rerank(story_model, tmp_path):
    """t2i loop with in-loop FID + 2-candidate rerank."""
    from mm_interleaved_tpu.utils.fid import make_clip_rerank_fn

    model, params, coll, jbatch = story_model
    ev = Evaluator(model, params, TOK, EvalConfig(
        num_inference_steps=2, output_dir=str(tmp_path),
    ))

    def text_feature_fn(captions):
        rng = np.random.RandomState(1)
        return rng.randn(len(captions), 8)

    rerank = make_clip_rerank_fn(_toy_feature_fn, text_feature_fn)
    batch = dict(jbatch)
    batch["meta"] = [(i, f"caption {i}") for i in range(2)]
    result = ev.evaluate_t2i(
        iter([batch]), "tiny_t2i", num_candidates=2,
        rerank_fn=rerank, feature_fn=_toy_feature_fn,
    )
    assert result["num_generated"] == 2
    assert np.isfinite(result["fid"]) and result["fid"] >= 0.0
