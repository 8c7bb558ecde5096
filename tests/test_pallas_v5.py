"""Occupancy-gated chunked v5 kernel vs the XLA oracle (interpret mode).

Chunk skipping must be *exact*: an unoccupied row chunk's bilinear matrix
is identically zero, so v5 output and all three gradients must match the
oracle bit-for-bit at f32 tolerance even for adversarial (out-of-grid,
widely scattered) sampling locations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.ops.ms_deform_attn import ms_deform_attn
from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v5 import (
    _level_meta,
    _metas,
    _occupancy_words,
    ms_deform_attn_pallas_v5,
    ms_deform_attn_pallas_v5_trainable,
)


def test_level_meta_chunking():
    """Realistic pyramid levels chunk to >=256-texel lane-aligned rows;
    odd test shapes fall back to a single chunk."""
    m = _level_meta(64, 64)
    assert (m.wp, m.hc, m.G) == (64, 4, 16)
    m = _level_meta(32, 32)
    assert (m.wp, m.hc, m.G) == (32, 8, 4)
    m = _level_meta(8, 8)
    assert (m.wp, m.G) == (16, 1)
    for h, w in [(12, 16), (7, 9), (3, 4), (6, 8)]:
        m = _level_meta(h, w)
        assert m.G >= 1 and m.h % m.G == 0 and (m.hc * m.wp) % 128 == 0


def test_occupancy_is_conservative():
    """Every texel row that can receive weight lies in an occupied chunk."""
    rng = np.random.RandomState(0)
    shapes = ((32, 32),)
    P, B, H, Q = 4, 1, 2, 128
    metas = _metas(shapes)
    loc = rng.uniform(-0.2, 1.2, (B, Q, H, 1, P, 2)).astype(np.float32)
    w = rng.rand(B, Q, H, 1, P).astype(np.float32)
    value = rng.randn(B, 1024, H, 8).astype(np.float32)
    from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v5 import _host_prep

    slab, _, Qp = _host_prep(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w), 128
    )
    occ = np.asarray(_occupancy_words(slab, metas, P, 128))
    m = metas[0]
    ys = loc[..., 1] * 32 - 0.5  # [B, Q, H, 1, P]
    for g in range(m.G):
        bit = (occ[0, :, 0, 0] >> g) & 1  # [H]
        lo, hi = g * m.hc, (g + 1) * m.hc
        for hh in range(H):
            touches = (
                (ys[0, :, hh, 0] > lo - 1) & (ys[0, :, hh, 0] < hi)
                & (w[0, :, hh, 0] != 0)
            ).any()
            assert bool(bit[hh]) == bool(touches)


@pytest.mark.parametrize("shapes,Lq,P", [
    (((12, 16), (6, 8), (3, 4)), 50, 6),  # non-power-of-2 (single chunk)
    (((16, 16), (8, 8)), 40, 8),
    (((32, 32), (16, 16), (8, 8)), 150, 8),  # chunked level-0 (G=4)
    (((7, 9),), 21, 4),  # H coprime with the lane count (wp = 128)
])
def test_v5_matches_oracle_interpret(shapes, Lq, P):
    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in shapes)
    B, H, D = 2, 4, 16
    L = len(shapes)
    value = rng.randn(B, S, H, D).astype(np.float32) * 0.1
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, H, L, P).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    got = ms_deform_attn_pallas_v5(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        tile_q=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_v5_clustered_queries_skip_chunks():
    """Grid-local queries (the UNet regime) mark only a band of chunks and
    still reproduce the oracle exactly."""
    rng = np.random.RandomState(1)
    shapes = ((64, 64), (32, 32))
    B, H, P, D = 1, 2, 8, 16
    # row-major latent grid queries, tile 128 = 2 latent rows
    gy, gx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    ref = np.stack([(gx + 0.5) / 64, (gy + 0.5) / 64], -1).reshape(1, -1, 2)
    Lq = ref.shape[1]
    loc = ref[:, :, None, None, None, :] + rng.uniform(
        -0.03, 0.03, (B, Lq, H, 2, P, 2)
    )
    loc = loc.astype(np.float32)
    w = rng.rand(B, Lq, H, 2, P).astype(np.float32)
    value = rng.randn(B, 64 * 64 + 32 * 32, H, D).astype(np.float32) * 0.1

    from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v5 import _host_prep

    metas = _metas(shapes)
    slab, _, _ = _host_prep(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w), 128
    )
    occ = np.asarray(_occupancy_words(slab, metas, P, 128))
    # level-0 bits: each 128-query tile (2 latent rows) must occupy only a
    # small band of the 16 chunks
    n_bits = np.zeros(occ.shape[2], np.int64)
    for g in range(metas[0].G):
        n_bits += ((occ[0, 0, :, 0] >> g) & 1)
    assert n_bits.max() <= 3, n_bits

    want = ms_deform_attn(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w)
    )
    got = ms_deform_attn_pallas_v5(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_v5_backward_matches_xla_autodiff():
    """Occupancy-gated backward reproduces jax.grad through the XLA gather
    path for all three inputs, including gradients that cross chunk
    boundaries."""
    rng = np.random.RandomState(0)
    shapes = ((32, 32), (6, 8), (3, 4))
    P, B, H, D, Q = 6, 2, 2, 16, 50
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, H, D).astype(np.float32) * 0.1
    # interior points: the location gradient is defined away from texel edges
    loc = rng.uniform(0.05, 0.95, (B, Q, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Q, H, L, P).astype(np.float32)

    def loss_xla(v, l, a):
        return (ms_deform_attn(v, shapes, l, a) ** 2).sum()

    def loss_pal(v, l, a):
        return (ms_deform_attn_pallas_v5_trainable(
            v, shapes, l, a, 32, True
        ) ** 2).sum()

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
    )
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
    )
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )


def test_v5_bf16_path():
    rng = np.random.RandomState(0)
    shapes = ((16, 16), (8, 8))
    P, B, H, D, Q = 4, 2, 2, 16, 50
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.randn(B, S, H, D).astype(np.float32) * 0.1, jnp.bfloat16
    )
    loc = jnp.asarray(
        rng.uniform(0.02, 0.98, (B, Q, H, L, P, 2)).astype(np.float32))
    w = jnp.asarray(rng.rand(B, Q, H, L, P).astype(np.float32))

    ref = np.asarray(ms_deform_attn(value, shapes, loc, w), np.float32)
    got = np.asarray(ms_deform_attn_pallas_v5(
        value, shapes, loc, w, 32, True), np.float32)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-2

    def loss_pal(v):
        return (ms_deform_attn_pallas_v5_trainable(
            v, shapes, loc, w, 32, True).astype(jnp.float32) ** 2).sum()

    def loss_ref(v):
        return (ms_deform_attn(
            v, shapes, loc, w).astype(jnp.float32) ** 2).sum()

    g = np.asarray(jax.grad(loss_pal)(value), np.float32)
    gr = np.asarray(jax.grad(loss_ref)(value), np.float32)
    assert np.abs(g - gr).max() / np.abs(gr).max() < 2e-2


def test_v5_query_padding():
    """Q not a multiple of tile_q pads and unpads correctly; padded-query
    grads must not leak (padded slab rows have aw == 0, so they mark no
    chunk occupied)."""
    rng = np.random.RandomState(1)
    shapes = ((8, 8),)
    value = rng.randn(1, 64, 2, 8).astype(np.float32)
    loc = rng.rand(1, 19, 2, 1, 3, 2).astype(np.float32)
    w = rng.rand(1, 19, 2, 1, 3).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    got = ms_deform_attn_pallas_v5(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        tile_q=16, interpret=True,
    )
    assert got.shape == want.shape == (1, 19, 16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )

    def loss(v):
        return (ms_deform_attn_pallas_v5_trainable(
            v, shapes, jnp.array(loc), jnp.array(w), 16, True
        ) ** 2).sum()

    def loss_ref(v):
        return (ms_deform_attn(v, shapes, jnp.array(loc), jnp.array(w)) ** 2).sum()

    gv = jax.grad(loss)(jnp.array(value))
    gv_ref = jax.grad(loss_ref)(jnp.array(value))
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gv_ref), rtol=1e-4, atol=1e-5
    )
