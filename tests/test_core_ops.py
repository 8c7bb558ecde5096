import numpy as np
import jax
import jax.numpy as jnp
import torch

from mm_interleaved_tpu.ops import (
    rms_norm,
    rotary_cos_sin,
    apply_rotary_embedding,
    dot_product_attention,
    get_2d_sincos_pos_embed,
    get_1d_sincos_pos_embed,
    resize_abs_pos_embed,
)


def test_rms_norm_matches_torch():
    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    w = np.random.RandomState(1).rand(16).astype(np.float32)
    got = rms_norm(jnp.array(x), jnp.array(w))
    xt = torch.tensor(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    want = (xt * torch.rsqrt(var + 1e-6)) * torch.tensor(w)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


def test_rotary_roundtrip_norm_preserving():
    cos, sin = rotary_cos_sin(8, 32)
    q = jnp.array(np.random.RandomState(0).randn(1, 4, 2, 8).astype(np.float32))
    pos = jnp.arange(4)[None, :]
    q_rot, _ = apply_rotary_embedding(q, q, cos, sin, pos)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_rot), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        rtol=1e-5,
    )
    # position 0 is identity
    q0, _ = apply_rotary_embedding(q[:, :1], q[:, :1], cos, sin, pos[:, :1])
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q[:, :1]), rtol=1e-6)


def test_attention_causal_matches_full_mask():
    rng = np.random.RandomState(0)
    q = jnp.array(rng.randn(2, 6, 2, 8).astype(np.float32))
    k = jnp.array(rng.randn(2, 6, 2, 8).astype(np.float32))
    v = jnp.array(rng.randn(2, 6, 2, 8).astype(np.float32))
    got = dot_product_attention(q, k, v, causal=True)
    mask = jnp.tril(jnp.ones((6, 6), bool))[None, None]
    want = dot_product_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_attention_causal_prefix_alignment():
    """With Tq < Tk the causal mask aligns to the end (KV-cache decode)."""
    rng = np.random.RandomState(1)
    q = jnp.array(rng.randn(1, 1, 1, 4).astype(np.float32))
    k = jnp.array(rng.randn(1, 5, 1, 4).astype(np.float32))
    v = jnp.array(rng.randn(1, 5, 1, 4).astype(np.float32))
    got = dot_product_attention(q, k, v, causal=True)
    want = dot_product_attention(q, k, v)  # last query sees all 5 keys
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_attention_segment_ids_match_dense_mask():
    """Segment-id padding (the Pallas-eligible form) must equal the dense
    causal+padding mask (what the cache path uses)."""
    rng = np.random.RandomState(2)
    B, T, H, D = 2, 8, 2, 4
    q = jnp.array(rng.randn(B, T, H, D).astype(np.float32))
    k = jnp.array(rng.randn(B, T, H, D).astype(np.float32))
    v = jnp.array(rng.randn(B, T, H, D).astype(np.float32))
    valid = jnp.array([[1, 1, 1, 1, 1, 0, 0, 0],
                       [0, 0, 1, 1, 1, 1, 1, 1]], jnp.int32)

    seg_out = dot_product_attention(
        q, k, v, causal=True, q_segment_ids=valid, kv_segment_ids=valid,
    )
    qi = jnp.arange(T)[:, None]
    ki = jnp.arange(T)[None, :]
    dense = (ki <= qi)[None, None] & valid.astype(bool)[:, None, None, :]
    dense_out = dot_product_attention(q, k, v, mask=dense)
    # compare only at valid query positions (invalid ones differ: segment
    # form lets pads attend pads, dense form lets them attend real tokens)
    vmask = np.asarray(valid, bool)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(seg_out) * vmask, np.asarray(dense_out) * vmask,
        rtol=1e-5, atol=1e-6,
    )


def test_sincos_pos_embed_shapes():
    assert get_2d_sincos_pos_embed(16, 4).shape == (16, 16)
    assert get_2d_sincos_pos_embed(16, 4, cls_token=True).shape == (17, 16)
    assert get_1d_sincos_pos_embed(32, 10).shape == (10, 32)


def test_resize_abs_pos_embed():
    pe = jnp.array(get_2d_sincos_pos_embed(16, 4))
    out = resize_abs_pos_embed(pe, 4, 8)
    assert out.shape == (64, 16)
    # identity when sizes match
    assert resize_abs_pos_embed(pe, 4, 4) is pe


def test_query_chunked_attention_matches_unchunked():
    """The big-logits query-chunked XLA path (peak-memory bound for the
    flagship AOT fit check) is numerically identical to the dense path,
    including end-aligned causal masking and segment ids."""
    import jax

    from mm_interleaved_tpu.ops import attention as A

    rng = np.random.RandomState(0)
    B, Tq, Tk, H, D = 2, 512, 512, 2, 8
    q = jnp.asarray(rng.randn(B, Tq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Tk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Tk, H, D).astype(np.float32))
    qseg = jnp.asarray(rng.randint(0, 2, (B, Tq)), jnp.int32)
    kseg = jnp.asarray(rng.randint(0, 2, (B, Tk)), jnp.int32)

    cases = [dict(), dict(causal=True),
             dict(causal=True, q_segment_ids=qseg, kv_segment_ids=kseg)]
    for kw in cases:
        want = dot_product_attention(q, k, v, allow_pallas=False, **kw)
        # force chunking by shrinking the logits budget
        orig = A._query_chunk
        A._query_chunk = lambda q, k, b, m, budget_bytes=B * H * Tq * Tk: (
            orig(q, k, b, m, budget_bytes)
        )
        try:
            got = dot_product_attention(q, k, v, allow_pallas=False, **kw)
        finally:
            A._query_chunk = orig
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6,
        )


def test_query_chunked_causal_prefix_alignment():
    """Chunked causal attention with Tk > Tq (prefix KV cache) keeps the
    end-aligned global row indices."""
    from mm_interleaved_tpu.ops import attention as A

    rng = np.random.RandomState(1)
    B, Tq, Tk, H, D = 1, 256, 640, 2, 8
    q = jnp.asarray(rng.randn(B, Tq, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, Tk, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, Tk, H, D).astype(np.float32))
    want = dot_product_attention(q, k, v, causal=True, allow_pallas=False)
    orig = A._query_chunk
    A._query_chunk = lambda *a, **kw: 128
    try:
        got = dot_product_attention(q, k, v, causal=True, allow_pallas=False)
    finally:
        A._query_chunk = orig
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6,
    )
