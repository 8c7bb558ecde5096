import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.generation.text import (
    TextGenerationConfig,
    generate_texts,
    _sample_token,
    _apply_repetition_penalty,
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
    ids = np.array(
        [[S.pad_token_id] * pad + row,
         [S.pad_token_id] * (pad + 1) + row[:-1]],
        dtype=np.int32,
    )
    att = (ids != S.pad_token_id).astype(np.int32)
    # left-padded rows: mark left pads as 0 even though pad==real token ids
    att[0, :pad] = 0
    att[1, : pad + 1] = 0
    imgs = rng.rand(2, CFG.max_num_images, 56, 56, 3).astype(np.float32)
    n_img = np.array([1, 1], dtype=np.int32)
    batch = dict(
        text_ids=jnp.array(ids),
        image_tensors=jnp.array(imgs),
        num_image_per_seq=jnp.array(n_img),
        attention_mask=jnp.array(att),
    )
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        **batch,
    )
    return model, params, batch


def test_greedy_generation_shapes_and_determinism(setup):
    model, params, batch = setup
    cfg = TextGenerationConfig(
        max_new_tokens=6,
        eos_token_ids=(S.eos_token_id, S.soi_token_id),
        pad_token_id=S.pad_token_id,
    )
    out1 = generate_texts(
        model, params, batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"], batch["attention_mask"], cfg,
    )
    out2 = generate_texts(
        model, params, batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"], batch["attention_mask"], cfg,
    )
    assert out1.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert (np.asarray(out1) >= 0).all() and (
        np.asarray(out1) < CFG.llm.vocab_size
    ).all()


def test_greedy_matches_stepwise_full_forward(setup):
    """Cached greedy decode must equal re-running the full forward each step
    (the no-cache oracle)."""
    model, params, batch = setup
    cfg = TextGenerationConfig(
        max_new_tokens=4, eos_token_ids=(999,),  # never stop
        pad_token_id=S.pad_token_id,
    )
    got = np.asarray(
        generate_texts(
            model, params, batch["text_ids"], batch["image_tensors"],
            batch["num_image_per_seq"], batch["attention_mask"], cfg,
        )
    )

    # oracle: grow the sequence, full forward each time, argmax at the end
    ids = np.asarray(batch["text_ids"]).copy()
    att = np.asarray(batch["attention_mask"]).copy()
    toks = []
    for _ in range(4):
        prep = model.apply(
            params, jnp.array(ids), batch["image_tensors"],
            batch["num_image_per_seq"], method=model.prepare_mm_embeds,
        )
        hidden, _ = model.apply(
            params, prep["mm_embeds"], jnp.array(att),
            prep["mmfs_values"], prep["cross_attention_mask"],
            method=lambda m, *a: m.mm_decoder(*a),
        )
        logits = model.apply(
            params, hidden, method=lambda m, h: m.text_decoder(h)
        )
        nxt = np.asarray(
            jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
        ).astype(np.int32)
        toks.append(nxt)
        ids = np.concatenate([ids, nxt[:, None]], axis=1)
        att = np.concatenate([att, np.ones((2, 1), np.int32)], axis=1)
    want = np.stack(toks, axis=1)
    np.testing.assert_array_equal(got, want)


def test_nucleus_sampling_valid():
    logits = jnp.array(
        [[2.0, 1.0, 0.5, -1.0, -3.0]], dtype=jnp.float32
    )
    cfg = TextGenerationConfig(do_sample=True, top_p=0.5, temperature=1.0)
    counts = set()
    for i in range(20):
        t = int(_sample_token(logits, jax.random.PRNGKey(i), cfg)[0])
        counts.add(t)
    # with top_p=0.5 only the top token(s) survive
    assert counts <= {0, 1}


def test_repetition_penalty():
    logits = jnp.array([[1.0, -1.0, 2.0]])
    presence = jnp.array([[True, True, False]])
    out = np.asarray(_apply_repetition_penalty(logits, presence, 2.0))
    np.testing.assert_allclose(out, [[0.5, -2.0, 2.0]])
