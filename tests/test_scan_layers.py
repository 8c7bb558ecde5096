"""scan_layers (block-scanned decoder stack) vs the unrolled stack.

The scanned layout must be a pure re-layout: with `stack_llama_layers`-
converted params, forward, prefill + decode, sown vision-value caches and
gradients all match the unrolled model.  Partition rules must leave the
leading n_blocks axis replicated (right-aligned specs).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    LlamaModel,
    stack_llama_layers,
    unstack_llama_layers,
)

TINY = LlamaConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    max_position_embeddings=64,
    cross_attention_frequency=2,
    image_embed_dim=16,
    spatial_shapes=(4,),
    mmfs_heads=2,
    mmfs_points=2,
    max_num_image_per_seq=5,
)
TINY_SCAN = dataclasses.replace(TINY, scan_layers=True)


@pytest.fixture(scope="module")
def pair():
    """(unrolled params, stacked params, inputs) on the same weights."""
    rng = np.random.RandomState(0)
    B, T, n_img = 2, 10, 2
    embeds = jnp.array(rng.randn(B, T, TINY.hidden_size).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)
    hw = sum(s * s for s in TINY.spatial_shapes)
    vis = jnp.array(
        rng.randn(B, n_img, hw, TINY.image_embed_dim).astype(np.float32)
    )
    xmask = jnp.ones((B, T, n_img), jnp.int32)
    params = jax.jit(LlamaModel(TINY).init)(
        jax.random.PRNGKey(0), embeds, mask, vis, xmask
    )
    # non-zero gates so the cross-attention path actually contributes
    p = jax.tree.map(
        lambda x: x + 0.3 if x.ndim == 1 and x.shape == (1,) else x,
        params["params"],
    )
    stacked = stack_llama_layers(
        p, TINY.num_hidden_layers, TINY.cross_attention_frequency
    )
    return (
        {"params": p},
        {"params": stacked},
        (embeds, mask, vis, xmask),
    )


def test_stack_roundtrip(pair):
    params, stacked, _ = pair
    back = unstack_llama_layers(
        stacked["params"], TINY.num_hidden_layers,
        TINY.cross_attention_frequency,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["params"], back,
    )


def test_scan_param_tree_matches_init(pair):
    """stack_llama_layers produces exactly the tree nn.scan initialises."""
    _, stacked, (embeds, mask, vis, xmask) = pair
    init = jax.jit(LlamaModel(TINY_SCAN).init)(
        jax.random.PRNGKey(0), embeds, mask, vis, xmask
    )

    def paths(t):
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp): np.shape(v)
            for kp, v in jax.tree_util.tree_flatten_with_path(t)[0]
        }

    assert paths(init["params"]) == paths(stacked["params"])


def test_forward_equivalence(pair):
    params, stacked, (embeds, mask, vis, xmask) = pair
    h_unrolled, _ = LlamaModel(TINY).apply(params, embeds, mask, vis, xmask)
    h_scan, _ = LlamaModel(TINY_SCAN).apply(stacked, embeds, mask, vis, xmask)
    np.testing.assert_allclose(
        np.asarray(h_scan), np.asarray(h_unrolled), rtol=1e-5, atol=1e-5
    )


def test_prefill_decode_equivalence(pair):
    params, stacked, (embeds, mask, vis, xmask) = pair
    B, T, _ = embeds.shape
    out = {}
    for name, cfg, p in (
        ("unrolled", TINY, params), ("scan", TINY_SCAN, stacked)
    ):
        model = LlamaModel(cfg)
        cache = KVCache.create(cfg, B, 16)
        h_pre, cache = model.apply(
            p, embeds[:, :6], mask[:, :6], vis, xmask[:, :6], cache=cache
        )
        h_t, cache = model.apply(
            p, embeds[:, 6:7], mask[:, 6:7], vis, xmask[:, 6:7], cache=cache
        )
        out[name] = (h_pre, h_t, cache)
    np.testing.assert_allclose(
        np.asarray(out["scan"][0]), np.asarray(out["unrolled"][0]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["scan"][1]), np.asarray(out["unrolled"][1]),
        rtol=1e-5, atol=1e-5,
    )
    for field in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(out["scan"][2], field)),
            np.asarray(getattr(out["unrolled"][2], field)),
            rtol=1e-5, atol=1e-5,
        )
    assert int(out["scan"][2].length) == int(out["unrolled"][2].length)


def test_sown_vision_values_match_cache_layout(pair):
    """The scanned prefill sows projected vision values stacked over blocks —
    exactly the [n_cross, B, n_img, hw, d] layout `extract_vision_values`
    hands to decode — and feeding them back reproduces the full pass."""
    params, stacked, (embeds, mask, vis, xmask) = pair
    B, T, _ = embeds.shape

    model = LlamaModel(TINY_SCAN)
    cache = KVCache.create(TINY_SCAN, B, 16)
    (h_pre, cache), inters = model.apply(
        stacked, embeds[:, :6], mask[:, :6], vis, xmask[:, :6], cache=cache,
        mutable=["intermediates"],
    )
    md = inters["intermediates"]
    vvc = md["block"]["layer_0"]["llama_cross_attn"]["attn"][
        "projected_value"][0]
    n_cross = TINY.num_hidden_layers // TINY.cross_attention_frequency
    assert vvc.shape[0] == n_cross and vvc.shape[1:3] == (B, vis.shape[1])

    # unrolled reference decode step
    model_u = LlamaModel(TINY)
    cache_u = KVCache.create(TINY, B, 16)
    _, cache_u = model_u.apply(
        params, embeds[:, :6], mask[:, :6], vis, xmask[:, :6], cache=cache_u
    )
    h_ref, _ = model_u.apply(
        params, embeds[:, 6:7], mask[:, 6:7], vis, xmask[:, 6:7],
        cache=cache_u,
    )

    h_t, _ = model.apply(
        stacked, embeds[:, 6:7], mask[:, 6:7], None, xmask[:, 6:7],
        cache=cache, vision_value_cache=vvc,
    )
    np.testing.assert_allclose(
        np.asarray(h_t), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )


def test_grad_equivalence(pair):
    params, stacked, (embeds, mask, vis, xmask) = pair

    def loss(p, cfg):
        h, _ = LlamaModel(cfg).apply({"params": p}, embeds, mask, vis, xmask)
        return (h.astype(jnp.float32) ** 2).mean()

    gu = jax.grad(loss)(params["params"], TINY)
    gs = jax.grad(loss)(stacked["params"], TINY_SCAN)
    gu_stacked = stack_llama_layers(
        jax.tree.map(np.asarray, gu), TINY.num_hidden_layers,
        TINY.cross_attention_frequency,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        gu_stacked, jax.tree.map(np.asarray, gs),
    )


def test_partition_specs_right_aligned():
    """Stacked kernels keep their (fsdp, tensor) split on the trailing dims;
    the n_blocks axis stays replicated."""
    from jax.sharding import PartitionSpec as P

    from mm_interleaved_tpu.parallel.partition import make_mesh, spec_for_path

    mesh = make_mesh(1, 2, 2, devices=jax.devices("cpu")[:4]) \
        if len(jax.devices("cpu")) >= 4 else None
    if mesh is None:
        pytest.skip("needs 4 virtual cpu devices")
    path = "mm_decoder/block/layer_0/self_attn/q_proj/kernel"
    assert spec_for_path(path, (10, 128, 128), mesh) == P(None, "fsdp", "tensor")
    assert spec_for_path(path, (128, 128), mesh) == P("fsdp", "tensor")
    # conv kernels (4D) stay unsharded either way
    assert spec_for_path("x/conv1/kernel", (3, 3, 64, 64), mesh) == \
        P(None, None, None, None)
