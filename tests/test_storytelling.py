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


@pytest.mark.slow
def test_storytelling_eval_loop(tmp_path):
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
    ev = Evaluator(model, params, TOK, EvalConfig(
        num_inference_steps=2, output_dir=str(tmp_path),
    ))
    result = ev.evaluate_storytelling(iter([jbatch]), "tiny_story")
    assert result["num_generated"] == 2
    import os

    files = os.listdir(tmp_path / "tiny_story")
    assert len(files) == 2
