"""Pallas deformable-attention kernels vs the XLA oracle
(interpret mode on CPU; on-chip parity checked in scripts/perf_probe.py).

Production dispatch (`ops.ms_deform_attn`) routes to the v4 dense
bilinear-matrix kernel for both inference and training; v1 (separable
one-hot) is kept as a comparison baseline for the kernel benchmarks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.ops.ms_deform_attn import ms_deform_attn
from mm_interleaved_tpu.ops.ms_deform_attn_pallas import (
    ms_deform_attn_pallas,
)
from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v4 import (
    ms_deform_attn_pallas_v4,
    ms_deform_attn_pallas_v4_trainable,
)


@pytest.mark.parametrize("shapes,Lq,P", [
    (((12, 16), (6, 8), (3, 4)), 50, 6),  # non-square levels, odd sizes
    (((16, 16), (8, 8)), 40, 8),
    (((8, 8),), 33, 2),  # rows below the sublane multiple (padding path)
])
def test_v1_matches_oracle_interpret(shapes, Lq, P):
    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in shapes)
    B, H, D = 2, 4, 16
    L = len(shapes)
    value = rng.randn(B, S, H, D).astype(np.float32) * 0.1
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, H, L, P).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    got = ms_deform_attn_pallas(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        tile_q=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("shapes,Lq,P", [
    (((12, 16), (6, 8), (3, 4)), 50, 6),  # non-power-of-2 H (lane padding)
    (((16, 16), (8, 8)), 40, 8),
    (((8, 8),), 33, 2),
    (((7, 9),), 21, 4),  # H coprime with the lane count (wp = 128)
])
def test_v4_matches_oracle_interpret(shapes, Lq, P):
    """v4 (dense bilinear matrix + single matmul per level) keeps the exact
    f32 numerics of the oracle, including out-of-grid zero semantics."""
    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in shapes)
    B, H, D = 2, 4, 16
    L = len(shapes)
    value = rng.randn(B, S, H, D).astype(np.float32) * 0.1
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, H, L, P).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    got = ms_deform_attn_pallas_v4(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        tile_q=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_v4_bf16_mxu_expand_path():
    """bf16 values select the MXU x-expansion build (`_build_A_mxu`);
    output and dV must track the XLA oracle within bf16 tolerance."""
    rng = np.random.RandomState(0)
    shapes = ((12, 16), (6, 8))
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
    got = np.asarray(ms_deform_attn_pallas_v4(
        value, shapes, loc, w, 32, True), np.float32)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-2

    def loss_pal(v):
        return (ms_deform_attn_pallas_v4_trainable(
            v, shapes, loc, w, 32, True).astype(jnp.float32) ** 2).sum()

    def loss_ref(v):
        return (ms_deform_attn(
            v, shapes, loc, w).astype(jnp.float32) ** 2).sum()

    g = np.asarray(jax.grad(loss_pal)(value), np.float32)
    gr = np.asarray(jax.grad(loss_ref)(value), np.float32)
    assert np.abs(g - gr).max() / np.abs(gr).max() < 2e-2


def test_v4_backward_matches_xla_autodiff():
    """The v4 Pallas backward (custom_vjp: dA = dOut V^T, dV = A^T dOut,
    hat-derivative for locations) reproduces jax.grad through the XLA gather
    path for all three inputs — the TPU replacement of the reference's 6
    CUDA backward variants (ms_deform_im2col_cuda.cuh:305-925)."""
    rng = np.random.RandomState(0)
    shapes = ((12, 16), (6, 8), (3, 4))
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
        return (ms_deform_attn_pallas_v4_trainable(
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


def test_training_mode_dispatch():
    """`pallas_deform_training` routes large-Q calls through the custom_vjp
    kernel and restores the previous mode on exit."""
    import importlib

    # the package re-exports the same-named function, shadowing the module
    M = importlib.import_module("mm_interleaved_tpu.ops.ms_deform_attn")

    with M.pallas_deform_training():
        assert getattr(M._DISPATCH, "training", False)
        assert M._pallas_eligible(512) or jax.default_backend() == "cpu"
        # the decode regime must stay on the dense one-hot XLA path
        assert not M._pallas_eligible(M.SMALL_Q_THRESHOLD)
    assert not getattr(M._DISPATCH, "training", False)


def test_v4_query_padding():
    """Q not a multiple of tile_q pads and unpads correctly, in both the
    forward and the backward (padded-query grads must not leak)."""
    rng = np.random.RandomState(1)
    shapes = ((8, 8),)
    value = rng.randn(1, 64, 2, 8).astype(np.float32)
    loc = rng.rand(1, 19, 2, 1, 3, 2).astype(np.float32)
    w = rng.rand(1, 19, 2, 1, 3).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    got = ms_deform_attn_pallas_v4(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        tile_q=16, interpret=True,
    )
    assert got.shape == want.shape == (1, 19, 16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )

    def loss(v):
        return (ms_deform_attn_pallas_v4_trainable(
            v, shapes, jnp.array(loc), jnp.array(w), 16, True
        ) ** 2).sum()

    def loss_ref(v):
        return (ms_deform_attn(v, shapes, jnp.array(loc), jnp.array(w)) ** 2).sum()

    gv = jax.grad(loss)(jnp.array(value))
    gv_ref = jax.grad(loss_ref)(jnp.array(value))
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gv_ref), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize(
    "level_shapes,Lq,n_img",
    [(((8, 8), (4, 4)), 70, 2), (((16, 16), (8, 8), (4, 4), (2, 2)), 128, 3)],
)
def test_mi_factorized_matches_expanded_oracle(level_shapes, Lq, n_img):
    """The factorized multi-image kernel (narrow query/image factors,
    in-kernel expansion + chunked x-lift) equals `ms_deform_attn_multi_image`
    on the explicitly expanded location/weight tensors."""
    from mm_interleaved_tpu.ops.ms_deform_attn import (
        ms_deform_attn_multi_image,
    )
    from mm_interleaved_tpu.ops.ms_deform_attn_pallas_mi import (
        mmfs_deform_factorized,
    )

    rng = np.random.RandomState(3)
    B, H, P, D = 2, 4, 3, 8
    L = len(level_shapes)
    hw = sum(h * w for h, w in level_shapes)
    base = level_shapes[0][0]
    value = rng.randn(B, n_img, hw, H, D).astype(np.float32)
    ref = rng.rand(B, Lq, 2).astype(np.float32)
    off_q = (rng.randn(B, Lq, H, P, 2) * 2).astype(np.float32)
    off_img = (rng.randn(B, n_img, H, P, 2) * 2).astype(np.float32)
    wq = rng.rand(B, Lq, H, L, P).astype(np.float32)
    wi = rng.rand(B, n_img, H, L, P).astype(np.float32)
    # mask one image out through the weight factor (how the module does it)
    wi[:, -1] = 0.0

    got = mmfs_deform_factorized(
        jnp.asarray(value), level_shapes, jnp.asarray(ref),
        jnp.asarray(off_q), jnp.asarray(off_img), jnp.asarray(wq),
        jnp.asarray(wi), inv_base=1.0 / base, interpret=True,
    )

    # expand explicitly: [B, Lq, H, n_img, L, P]
    w_wide = wq[:, :, :, None] * np.transpose(wi, (0, 2, 1, 3, 4))[:, None]
    off_full = off_q[:, :, None] + off_img[:, None]  # [B,Lq,n_img,H,P,2]
    loc = (
        ref[:, :, None, None, None, None, :]
        + np.transpose(off_full, (0, 1, 3, 2, 4, 5))[:, :, :, :, None]
        / base
    )
    loc = np.broadcast_to(loc, (B, Lq, H, n_img, L, P, 2))
    want = ms_deform_attn_multi_image(
        jnp.asarray(value.reshape(B, n_img, hw, H, D)), level_shapes,
        jnp.asarray(loc.astype(np.float32)),
        jnp.asarray(w_wide.astype(np.float32)),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_mi_factorized_cfg_shared_image_side():
    """`mmfs_deform_factorized_prepared` with a half-batch image side
    (cfg_dup=2: query row c*Bv+b reads image row b) equals two stacked
    full-batch calls — the CFG-sharing layout used by the denoise hoist."""
    from mm_interleaved_tpu.ops.ms_deform_attn_pallas_mi import (
        mmfs_deform_factorized,
        mmfs_deform_factorized_prepared,
        prepare_image_side,
    )

    rng = np.random.RandomState(7)
    level_shapes = ((8, 8), (4, 4))
    Bv, H, P, D, Lq, n_img = 2, 4, 3, 8, 70, 2
    L = len(level_shapes)
    hw = sum(h * w for h, w in level_shapes)
    base = level_shapes[0][0]
    value = rng.randn(Bv, n_img, hw, H, D).astype(np.float32)
    off_img = (rng.randn(Bv, n_img, H, P, 2) * 2).astype(np.float32)
    wi = rng.rand(Bv, n_img, H, L, P).astype(np.float32)
    # query side at the duplicated batch (two CFG halves, different queries)
    B = 2 * Bv
    ref = rng.rand(B, Lq, 2).astype(np.float32)
    off_q = (rng.randn(B, Lq, H, P, 2) * 2).astype(np.float32)
    wq = rng.rand(B, Lq, H, L, P).astype(np.float32)

    level_vals, delta = prepare_image_side(
        jnp.asarray(value), level_shapes, jnp.asarray(off_img),
        jnp.asarray(wi), 1.0 / base,
    )
    got = mmfs_deform_factorized_prepared(
        level_vals, delta, level_shapes, jnp.asarray(ref),
        jnp.asarray(off_q), jnp.asarray(wq), inv_base=1.0 / base,
        interpret=True,
    )

    # reference: duplicate the image side explicitly per half
    value2 = np.concatenate([value, value], axis=0)
    off_img2 = np.concatenate([off_img, off_img], axis=0)
    wi2 = np.concatenate([wi, wi], axis=0)
    want = mmfs_deform_factorized(
        jnp.asarray(value2), level_shapes, jnp.asarray(ref),
        jnp.asarray(off_q), jnp.asarray(off_img2), jnp.asarray(wq),
        jnp.asarray(wi2), inv_base=1.0 / base, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )
