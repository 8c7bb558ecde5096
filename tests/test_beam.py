"""Beam search: beam-1 == greedy; beam-K returns valid, better-scored text."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.generation.beam import beam_search
from mm_interleaved_tpu.generation.text import (
    TextGenerationConfig,
    generate_tokens,
)

CFG = tiny_config(with_image_decoder=False)
S = CFG.special
NTOK = CFG.num_img_token


@pytest.fixture(scope="module")
def setup():
    model = MMInterleaved(CFG)
    rng = np.random.RandomState(0)
    L = 16
    row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * NTOK + [7, 8]
    pad = L - len(row)
    ids = np.array([[S.pad_token_id] * pad + row], dtype=np.int32)
    att = np.ones_like(ids)
    att[0, :pad] = 0
    imgs = rng.rand(1, CFG.max_num_images, 56, 56, 3).astype(np.float32)
    batch = dict(
        text_ids=jnp.array(ids),
        image_tensors=jnp.array(imgs),
        num_image_per_seq=jnp.ones((1,), jnp.int32),
        attention_mask=jnp.array(att),
    )
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, **batch)
    prep = model.apply(
        params, batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"], method=model.prepare_mm_embeds,
    )
    return model, params, batch, prep


def test_beam1_matches_greedy(setup):
    model, params, batch, prep = setup
    cfg = TextGenerationConfig(
        max_new_tokens=5, num_beams=1,
        eos_token_ids=(999,),  # never stop
        pad_token_id=S.pad_token_id,
    )
    greedy = generate_tokens(
        model, params, prep["mm_embeds"], batch["attention_mask"],
        prep["mmfs_values"], prep["cross_attention_mask"], cfg,
    )
    beam = beam_search(
        model, params, prep["mm_embeds"], batch["attention_mask"],
        prep["mmfs_values"], prep["cross_attention_mask"], cfg,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam))


def test_beam_k_valid_and_not_worse(setup):
    model, params, batch, prep = setup
    cfg3 = TextGenerationConfig(
        max_new_tokens=5, num_beams=3,
        eos_token_ids=(999,), pad_token_id=S.pad_token_id,
        length_penalty=0.0,  # pure logprob comparison
    )
    beam = np.asarray(beam_search(
        model, params, prep["mm_embeds"], batch["attention_mask"],
        prep["mmfs_values"], prep["cross_attention_mask"], cfg3,
    ))
    assert beam.shape == (1, 5)
    assert (beam >= 0).all() and (beam < CFG.llm.vocab_size).all()

    # score both sequences by teacher-forcing: beam-3 must be >= greedy
    cfg1 = TextGenerationConfig(
        max_new_tokens=5, num_beams=1,
        eos_token_ids=(999,), pad_token_id=S.pad_token_id,
    )
    greedy = np.asarray(generate_tokens(
        model, params, prep["mm_embeds"], batch["attention_mask"],
        prep["mmfs_values"], prep["cross_attention_mask"], cfg1,
    ))

    def seq_logprob(tokens):
        ids = np.concatenate(
            [np.asarray(batch["text_ids"]), tokens], axis=1
        )
        att = np.concatenate(
            [np.asarray(batch["attention_mask"]), np.ones_like(tokens)],
            axis=1,
        )
        prep2 = model.apply(
            params, jnp.asarray(ids), batch["image_tensors"],
            batch["num_image_per_seq"], method=model.prepare_mm_embeds,
        )
        hidden, _ = model.apply(
            params, prep2["mm_embeds"], jnp.asarray(att),
            prep2["mmfs_values"], prep2["cross_attention_mask"],
            method=lambda m, *a: m.mm_decoder(*a),
        )
        logits = model.apply(
            params, hidden, method=lambda m, h: m.text_decoder(h)
        ).astype(jnp.float32)
        L = batch["text_ids"].shape[1]
        lp = jax.nn.log_softmax(logits[:, L - 1 : L + 4], axis=-1)
        tok = jnp.asarray(tokens)
        return float(
            jnp.take_along_axis(lp, tok[..., None], axis=-1).sum()
        )

    assert seq_logprob(beam) >= seq_logprob(greedy) - 1e-4
