"""Weight-only int8 decode path (ops/quant.py).

QDense must be bit-identical to nn.Dense when no qscale side-car is
present (same param tree, same math); with quantized weights the LLM
forward/prefill/decode must track the bf16 baseline within weight-only
int8 error, on both the unrolled and scan_layers layouts.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from mm_interleaved_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    LlamaModel,
    stack_llama_layers,
)
from mm_interleaved_tpu.ops.quant import (
    QDense,
    dequantize_int8,
    quantize_int8,
    quantize_llm_weights,
)

TINY = LlamaConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=64,
    cross_attention_frequency=2,
    image_embed_dim=16,
    spatial_shapes=(4,),
    mmfs_heads=2,
    mmfs_points=2,
    max_num_image_per_seq=5,
)


def test_qdense_matches_dense_without_sidecar():
    x = jnp.array(np.random.RandomState(0).randn(3, 16).astype(np.float32))
    dense = nn.Dense(8, use_bias=True)
    qdense = QDense(8, use_bias=True)
    v = dense.init(jax.random.PRNGKey(1), x)
    vq = qdense.init(jax.random.PRNGKey(1), x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), v, vq
    )
    np.testing.assert_allclose(
        np.asarray(dense.apply(v, x)), np.asarray(qdense.apply(v, x)),
        rtol=1e-6,
    )


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    w = jnp.array(rng.randn(64, 32).astype(np.float32))
    q, s = quantize_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 32)
    back = dequantize_int8(q, s, jnp.float32)
    # absmax symmetric: max error is scale/2 = amax/254 per channel
    err = np.abs(np.asarray(back - w))
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert (err <= amax / 254 + 1e-7).all()


def test_quantize_llm_weights_structure():
    rng = np.random.RandomState(0)
    B, T, n_img = 2, 8, 2
    embeds = jnp.array(rng.randn(B, T, TINY.hidden_size).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)
    hw = sum(s * s for s in TINY.spatial_shapes)
    vis = jnp.array(
        rng.randn(B, n_img, hw, TINY.image_embed_dim).astype(np.float32)
    )
    xmask = jnp.ones((B, T, n_img), jnp.int32)
    variables = jax.jit(LlamaModel(TINY).init)(
        jax.random.PRNGKey(0), embeds, mask, vis, xmask
    )
    qvars = quantize_llm_weights(variables)
    p = qvars["params"]["layers_0"]["self_attn"]
    assert p["q_proj"]["kernel"].dtype == jnp.int8
    assert qvars["qscale"]["layers_0"]["self_attn"]["q_proj"][
        "scale"
    ].shape == (TINY.hidden_size,)
    # non-proj leaves untouched
    assert (
        qvars["params"]["embed_tokens"]["embedding"].dtype == jnp.float32
    )
    # MMFS projections not quantized (decode reuses prefill-sown values)
    mmfs = qvars["params"]["layers_0"]["llama_cross_attn"]["attn"]
    for k in mmfs:
        leaves = jax.tree.leaves(mmfs[k])
        assert all(l.dtype != jnp.int8 for l in leaves), k
    # double-quantization guarded
    with pytest.raises(AssertionError):
        quantize_llm_weights(qvars)


@pytest.fixture(scope="module")
def llm_inputs():
    rng = np.random.RandomState(1)
    B, T, n_img = 2, 10, 2
    embeds = jnp.array(
        rng.randn(B, T, TINY.hidden_size).astype(np.float32) * 0.1
    )
    mask = jnp.ones((B, T), jnp.int32)
    hw = sum(s * s for s in TINY.spatial_shapes)
    vis = jnp.array(
        rng.randn(B, n_img, hw, TINY.image_embed_dim).astype(np.float32)
    )
    xmask = jnp.ones((B, T, n_img), jnp.int32)
    variables = jax.jit(LlamaModel(TINY).init)(
        jax.random.PRNGKey(0), embeds, mask, vis, xmask
    )
    return variables, (embeds, mask, vis, xmask)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def test_forward_tracks_bf16_baseline(llm_inputs):
    variables, (embeds, mask, vis, xmask) = llm_inputs
    model = LlamaModel(TINY)
    h_ref, _ = model.apply(variables, embeds, mask, vis, xmask)
    qvars = quantize_llm_weights(variables)
    h_q, _ = model.apply(qvars, embeds, mask, vis, xmask)
    assert _rel_err(h_q, h_ref) < 0.05


def test_prefill_decode_with_quantized_weights(llm_inputs):
    variables, (embeds, mask, vis, xmask) = llm_inputs
    model = LlamaModel(TINY)
    qvars = quantize_llm_weights(variables)

    outs = {}
    for name, v in (("ref", variables), ("q", qvars)):
        cache = KVCache.create(TINY, 2, 16)
        h_pre, cache = model.apply(
            v, embeds[:, :6], mask[:, :6], vis, xmask[:, :6], cache=cache
        )
        h_t, _ = model.apply(
            v, embeds[:, 6:7], mask[:, 6:7], vis, xmask[:, 6:7], cache=cache
        )
        outs[name] = (h_pre, h_t)
    assert _rel_err(outs["q"][0], outs["ref"][0]) < 0.05
    assert _rel_err(outs["q"][1], outs["ref"][1]) < 0.05


def test_scan_layers_quantized():
    scan_cfg = dataclasses.replace(
        TINY, num_hidden_layers=4, scan_layers=True
    )
    unroll_cfg = dataclasses.replace(TINY, num_hidden_layers=4)
    rng = np.random.RandomState(2)
    B, T = 2, 8
    embeds = jnp.array(
        rng.randn(B, T, TINY.hidden_size).astype(np.float32) * 0.1
    )
    mask = jnp.ones((B, T), jnp.int32)
    variables = jax.jit(LlamaModel(unroll_cfg).init)(
        jax.random.PRNGKey(0), embeds, mask, None, None
    )
    stacked = {
        "params": stack_llama_layers(
            variables["params"], 4, unroll_cfg.cross_attention_frequency
        )
    }
    q_stacked = quantize_llm_weights(stacked)
    sc = q_stacked["qscale"]["block"]["layer_0"]["self_attn"]["q_proj"][
        "scale"
    ]
    assert sc.shape == (2, TINY.hidden_size)  # per-block scales

    h_ref, _ = LlamaModel(unroll_cfg).apply(variables, embeds, mask, None, None)
    h_q, _ = LlamaModel(scan_cfg).apply(q_stacked, embeds, mask, None, None)
    assert _rel_err(h_q, h_ref) < 0.05


def test_quantized_generate_runs():
    """End-to-end generate_texts with quantized LLM weights (greedy)."""
    from mm_interleaved_tpu.generation.text import (
        TextGenerationConfig,
        generate_texts,
    )
    from mm_interleaved_tpu.configs import tiny_config
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

    cfg = tiny_config(with_image_decoder=False)
    S = cfg.special
    model = MMInterleaved(cfg)
    rng = np.random.RandomState(3)
    L = 16
    row = ([S.bos_token_id, 5, S.soi_token_id]
           + [S.image_token_id] * cfg.num_img_token + [7, 8])
    ids = np.array([row + [9] * (L - len(row))] * 2, np.int32)
    att = np.ones_like(ids)
    batch = dict(
        text_ids=jnp.array(ids),
        image_tensors=jnp.array(
            rng.rand(2, cfg.max_num_images, 56, 56, 3).astype(np.float32)
        ),
        num_image_per_seq=jnp.array([1, 1], np.int32),
        attention_mask=jnp.array(att),
    )
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, **batch)
    gcfg = TextGenerationConfig(
        max_new_tokens=4,
        eos_token_ids=(S.eos_token_id,),
        pad_token_id=S.pad_token_id,
    )
    toks_ref = generate_texts(
        model, variables, batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"], batch["attention_mask"], gcfg,
    )
    qvars = quantize_llm_weights(variables)
    toks_q = generate_texts(
        model, qvars, batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"], batch["attention_mask"], gcfg,
    )
    assert toks_q.shape == toks_ref.shape == (2, 4)
