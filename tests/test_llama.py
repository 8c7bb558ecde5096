import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    LlamaModel,
    TextDecoder,
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


def make_model_and_inputs(seed=0, B=2, T=10, n_img=2, with_vision=True):
    rng = np.random.RandomState(seed)
    model = LlamaModel(TINY)
    embeds = jnp.array(rng.randn(B, T, TINY.hidden_size).astype(np.float32))
    mask = jnp.ones((B, T), jnp.int32)
    vis = None
    xmask = None
    if with_vision:
        hw = sum(s * s for s in TINY.spatial_shapes)
        vis = jnp.array(rng.randn(B, n_img, hw, TINY.image_embed_dim).astype(np.float32))
        xmask = jnp.ones((B, T, n_img), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), embeds, mask, vis, xmask)
    return model, params, embeds, mask, vis, xmask


def test_forward_shapes():
    model, params, embeds, mask, vis, xmask = make_model_and_inputs()
    h, cache = model.apply(params, embeds, mask, vis, xmask)
    assert h.shape == embeds.shape
    assert cache is None
    assert np.isfinite(np.asarray(h)).all()


def test_zero_gate_means_vision_noop_at_init():
    """MMFS gate is zero-init, so at init vision must not change outputs."""
    model, params, embeds, mask, vis, xmask = make_model_and_inputs()
    h_with, _ = model.apply(params, embeds, mask, vis, xmask)
    h_without, _ = model.apply(params, embeds, mask, None, None)
    np.testing.assert_allclose(
        np.asarray(h_with), np.asarray(h_without), atol=1e-6
    )


def test_incremental_decode_matches_full_forward():
    """Prefill + token-by-token decode through the KV cache must equal one
    full forward pass (the invariant HF's dynamic cache provides)."""
    model, params, embeds, mask, vis, xmask = make_model_and_inputs(T=8)
    h_full, _ = model.apply(params, embeds, mask, vis, xmask)

    B, T, _ = embeds.shape
    max_len = 16
    cache = KVCache.create(TINY, B, max_len)

    # prefill first 5 tokens
    h_pre, cache = model.apply(
        params, embeds[:, :5], mask[:, :5], vis, xmask[:, :5], cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(h_pre), np.asarray(h_full[:, :5]), rtol=2e-3, atol=2e-4
    )

    # decode the remaining tokens one at a time
    for t in range(5, T):
        h_t, cache = model.apply(
            params,
            embeds[:, t : t + 1],
            mask[:, t : t + 1],
            vis,
            xmask[:, t : t + 1],
            cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(h_t[:, 0]),
            np.asarray(h_full[:, t]),
            rtol=2e-3,
            atol=2e-4,
            err_msg=f"token {t}",
        )
    assert int(cache.length) == T


def test_left_padding_positions():
    """Left-padded prefill must produce the same final-token hidden state as
    the unpadded sequence (RoPE positions derived from the mask)."""
    model, params, embeds, mask, vis, xmask = make_model_and_inputs(
        B=1, T=6, with_vision=False
    )
    h_ref, _ = model.apply(params, embeds, mask, None, None)

    pad = jnp.zeros((1, 3, TINY.hidden_size), jnp.float32)
    embeds_padded = jnp.concatenate([pad, embeds], axis=1)
    mask_padded = jnp.concatenate([jnp.zeros((1, 3), jnp.int32), mask], axis=1)
    h_pad, _ = model.apply(params, embeds_padded, mask_padded, None, None)
    np.testing.assert_allclose(
        np.asarray(h_pad[:, -1]), np.asarray(h_ref[:, -1]), rtol=2e-3, atol=2e-4
    )


def test_cache_reorder():
    cache = KVCache.create(TINY, 4, 8)
    cache = KVCache(
        k=cache.k + jnp.arange(4)[None, :, None, None, None],
        v=cache.v,
        valid=cache.valid,
        length=cache.length,
    )
    re = cache.reorder(jnp.array([3, 3, 0, 1]))
    np.testing.assert_array_equal(
        np.asarray(re.k[0, :, 0, 0, 0]), np.array([3.0, 3.0, 0.0, 1.0])
    )


def test_text_decoder_dual_head():
    cfg = TINY
    td = TextDecoder(cfg, orig_vocab_size=120)
    h = jnp.array(np.random.RandomState(0).randn(2, 3, cfg.hidden_size).astype(np.float32))
    params = td.init(jax.random.PRNGKey(1), h)
    logits = td.apply(params, h)
    assert logits.shape == (2, 3, cfg.vocab_size)
    # at init: new-vocab logits = head(-100 bias + xavier W) + head_new(95)
    # -> roughly -5 plus the xavier head contribution; must be << old vocab
    new_slice = np.asarray(logits[..., 120:])
    assert new_slice.mean() < -3.0
