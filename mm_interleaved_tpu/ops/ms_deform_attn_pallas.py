"""Pallas TPU kernel for multi-scale deformable attention.

The XLA formulation (`ops/ms_deform_attn.py`) lowers to per-element gathers —
the worst case for the TPU vector unit and the measured bottleneck of both
the ViT-Adapter and the UNet MMFS blocks.  This kernel exploits that bilinear
interpolation is **separable**: the 2D one-hot over H*W texels factors into a
row-selection matmul and a column-selection reduction
(docs/KERNELS.md; same numerics contract as the XLA oracle, tested in
interpret mode against it):

  per (batch, head, query-tile), per level, per point:
    R[TILE_Q, H_l]   = wy0*onehot(y0) + wy1*onehot(y0+1)     # VPU, H_l cols
    T[TILE_Q, W_l*D] = R @ value_l.reshape(H_l, W_l*D)       # MXU
    C[TILE_Q, W_l]   = a_p*(wx0*onehot(x0) + wx1*onehot(x0+1))
    acc[TILE_Q, D]  += sum_w C[:, :, None] * T[TILE_Q, W_l, D]

One-hot build cost scales with H_l + W_l instead of H_l*W_l; the heavy lifting
is dense MXU work.  No gathers, no HBM intermediates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(loc_ref, w_ref, *refs, level_shapes, n_points, head_dim):
    """Block shapes (leading grid singletons kept by BlockSpec):
    loc_ref:   [1, 1, TILE_Q, L, P, 2] (f32)
    refs:      one [1, 1, H_l, W_l*D] value ref per level (host-reshaped —
               Mosaic can't retile [HW, D] -> [H, W*D] in-kernel),
               then out_ref [1, 1, TILE_Q, D]
    w_ref:     [1, 1, TILE_Q, L, P]    (f32)

    Everything is strictly 2D for Mosaic: per point,
    ``T = R @ V[H, W*D]`` selects+blends rows, ``C @ E`` expands the column
    weights to the w-major [W*D] layout, and the per-level sum folds back to
    [TILE_Q, D] with one static fold matmul ``@ G``.
    """
    value_refs = refs[: len(level_shapes)]
    out_ref = refs[len(level_shapes)]
    tile_q = loc_ref.shape[2]
    d = head_dim
    acc = None
    for lid, (h, w) in enumerate(level_shapes):
        wd = w * d
        value_mat = value_refs[lid][0, 0, :, :]  # [H_padded, W*D]
        hp = value_mat.shape[0]  # rows padded to the sublane multiple

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_q, hp), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_q, w), 1)
        # E[w, w*D + j] = 1 (expand column weights over the D lane groups)
        e_rows = jax.lax.broadcasted_iota(jnp.int32, (w, wd), 0)
        e_cols = jax.lax.broadcasted_iota(jnp.int32, (w, wd), 1)
        E = (e_cols // d == e_rows).astype(jnp.float32)
        # G[w*D + j, d] = (j == d)  (fold the w-major groups back to D)
        g_rows = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 0)
        g_cols = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 1)
        G = (g_rows % d == g_cols).astype(jnp.float32)

        # per-point scalars as [TILE_Q, P] slabs; the point loop is a
        # fori_loop reading lane slot 0 and rolling (keeps the Mosaic graph
        # size independent of P — fully unrolled P=8 overflows the backend)
        xs = loc_ref[0, 0, :, lid, :, 0] * w - 0.5  # [TILE_Q, P]
        ys = loc_ref[0, 0, :, lid, :, 1] * h - 0.5
        aws = w_ref[0, 0, :, lid, :]  # [TILE_Q, P]
        xs0 = jnp.floor(xs)
        ys0 = jnp.floor(ys)
        lxs = xs - xs0
        lys = ys - ys0
        xs0i = xs0.astype(jnp.int32)
        ys0i = ys0.astype(jnp.int32)

        def body(_, carry):
            lvl, lxs, lys, xs0i, ys0i, aws = carry
            lx = lxs[:, 0:1]
            ly = lys[:, 0:1]
            x0i = xs0i[:, 0:1]
            y0i = ys0i[:, 0:1]
            aw = aws[:, 0:1]

            # row selection [TILE_Q, Hp]; out-of-grid rows match nothing,
            # which is exactly the oracle's zeros-padding semantics
            R = jnp.where(row_iota == y0i, 1.0 - ly, 0.0) + jnp.where(
                row_iota == y0i + 1, ly, 0.0
            )
            # column selection [TILE_Q, W] (attention weight folded in),
            # expanded to the w-major [W*D] layout on the MXU
            C = aw * (
                jnp.where(col_iota == x0i, 1.0 - lx, 0.0)
                + jnp.where(col_iota == x0i + 1, lx, 0.0)
            )
            T = jnp.dot(
                R.astype(value_mat.dtype), value_mat,
                preferred_element_type=jnp.float32,
            )  # [TILE_Q, W*D]
            C_rep = jnp.dot(C, E, preferred_element_type=jnp.float32)
            lvl = lvl + C_rep * T

            def rl(x):
                return pltpu.roll(x, x.shape[1] - 1, 1)

            return (lvl, rl(lxs), rl(lys), rl(xs0i), rl(ys0i), rl(aws))

        lvl, *_ = jax.lax.fori_loop(
            0, n_points, body,
            (jnp.zeros((tile_q, wd), jnp.float32),
             lxs, lys, xs0i, ys0i, aws),
        )
        contrib = jnp.dot(lvl, G, preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    out_ref[0, 0, :, :] = acc


@functools.partial(
    jax.jit, static_argnames=("level_shapes", "tile_q", "interpret")
)
def ms_deform_attn_pallas(
    value: jax.Array,  # [B, S, H, D]
    level_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jax.Array,  # [B, Q, H, L, P, 2]
    attention_weights: jax.Array,  # [B, Q, H, L, P]
    tile_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for `ms_deform_attn` (same contract); returns
    [B, Q, H*D] in value's dtype.

    Out-of-grid sampling contributes zero, matching the oracle: an on-border
    corner pairs a valid row with an invalid column (or vice versa), and its
    one-hot factor is zero on the invalid axis."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(level_shapes)
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in level_shapes) == S

    q_pad = (-Q) % tile_q
    loc = jnp.pad(
        sampling_locations.astype(jnp.float32),
        ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0), (0, 0)),
    )
    wts = jnp.pad(
        attention_weights.astype(jnp.float32),
        ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)),
    )
    Qp = Q + q_pad
    n_tiles = Qp // tile_q

    loc = loc.transpose(0, 2, 1, 3, 4, 5)  # [B, H, Qp, L, P, 2]
    wts = wts.transpose(0, 2, 1, 3, 4)  # [B, H, Qp, L, P]

    # per-level [B, H, H_l(padded), W_l*D] value arrays (host-side reshape;
    # Mosaic can't retile in-kernel).  Rows pad to the bf16 sublane multiple
    # (16) — the row one-hot never selects padded rows, so zeros are safe.
    sublane = 16
    val = value.transpose(0, 2, 1, 3)  # [B, H, S, D]
    level_vals = []
    padded_rows = []
    start = 0
    for (h_l, w_l) in level_shapes:
        v = jax.lax.slice_in_dim(val, start, start + h_l * w_l, axis=2)
        v = v.reshape(B, H, h_l, w_l * D)
        pad_h = (-h_l) % sublane
        if pad_h:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        padded_rows.append(h_l + pad_h)
        level_vals.append(v)
        start += h_l * w_l

    level_specs = [
        pl.BlockSpec(
            (1, 1, hp, w_l * D),
            lambda b, h, t: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for hp, (h_l, w_l) in zip(padded_rows, level_shapes)
    ]

    out = pl.pallas_call(
        functools.partial(
            _kernel, level_shapes=tuple(level_shapes), n_points=P,
            head_dim=D,
        ),
        grid=(B, H, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_q, L, P, 2),
                lambda b, h, t: (b, h, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tile_q, L, P),
                lambda b, h, t: (b, h, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + level_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, D),
            lambda b, h, t: (b, h, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), jnp.float32),
        interpret=interpret,
    )(
        loc.reshape(B, H, n_tiles * tile_q, L, P, 2),
        wts.reshape(B, H, n_tiles * tile_q, L, P),
        *level_vals,
    )
    out = out[:, :, :Q].transpose(0, 2, 1, 3)  # [B, Q, H, D]
    return out.reshape(B, Q, H * D).astype(value.dtype)


# ======================================================================= #
# v2: stacked-point batching + D-major value layout                        #
# ======================================================================= #
#
# Three structural changes over the kernel above (ROADMAP round-2 items):
#
#   1. **P points batch into the row matmul.**  The host pre-stacks the
#      per-point sampling scalars into [P*TILE_Q, 1] column slabs, so the
#      row-selection matmul runs once per point-chunk at [pc*TILE_Q, H_l]
#      instead of 8 sequential [TILE_Q, H_l] calls inside a fori/roll loop —
#      bigger MXU calls, zero roll traffic.
#   2. **D-major value layout kills the expansion matmul.**  With
#      ``V'[h, d*W + w] = V[h, w, d]``, the column-weight expansion is
#      ``pltpu.repeat(C, D, axis=1)`` (free, VPU) instead of the
#      ``C @ E`` MXU matmul — half the kernel FLOPs gone.
#   3. **Point-chunking bounds VMEM.**  The [pc*TILE_Q, W*D] intermediate is
#      capped at ``vmem_budget`` bytes by picking the largest pc | P that
#      fits, per level.
#
# Numerics are unchanged: one-hots in f32, MXU accumulation in f32, same
# zeros-outside-grid border semantics. Oracle-parity tested in
# tests/test_pallas_kernel.py.


def _kernel_v2(y0_ref, x0_ref, ly_ref, lx_ref, aw_ref, *refs,
               level_shapes, n_points, head_dim, tile_q, chunks):
    value_refs = refs[: len(level_shapes)]
    out_ref = refs[len(level_shapes)]
    d = head_dim
    acc = None
    for lid, (h, w) in enumerate(level_shapes):
        wd = w * d
        value_mat = value_refs[lid][0, 0, :, :]  # [Hp, D*W] (D-major)
        hp = value_mat.shape[0]
        pc = chunks[lid]

        # fold matrix for the D-major layout: G[d*W + w, d'] = (d == d')
        g_rows = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 0)
        g_cols = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 1)
        G = (g_rows // w == g_cols).astype(jnp.float32)

        rows = pc * tile_q
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, hp), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)

        lvl = jnp.zeros((tile_q, wd), jnp.float32)
        for c in range(n_points // pc):
            sl = pl.dslice(c * rows, rows)
            y0 = y0_ref[0, 0, 0, lid, sl, :]  # [rows, 1] i32
            x0 = x0_ref[0, 0, 0, lid, sl, :]
            ly = ly_ref[0, 0, 0, lid, sl, :]  # [rows, 1] f32
            lx = lx_ref[0, 0, 0, lid, sl, :]
            aw = aw_ref[0, 0, 0, lid, sl, :]

            R = jnp.where(row_iota == y0, 1.0 - ly, 0.0) + jnp.where(
                row_iota == y0 + 1, ly, 0.0
            )
            C = aw * (
                jnp.where(col_iota == x0, 1.0 - lx, 0.0)
                + jnp.where(col_iota == x0 + 1, lx, 0.0)
            )
            T = jnp.dot(
                R.astype(value_mat.dtype), value_mat,
                preferred_element_type=jnp.float32,
            )  # [rows, D*W]
            prod = pltpu.repeat(C, d, 1) * T  # [rows, D*W]
            if pc > 1:
                prod = prod.reshape(pc, tile_q, wd).sum(axis=0)
            lvl = lvl + prod
        contrib = jnp.dot(lvl, G, preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    out_ref[0, 0, :, :] = acc


def _stack_points(arr, B, H, n_tiles, tile_q, L, P):
    """[B, H, Qp, L, P] -> [B, H, n_tiles, L, P*TILE_Q, 1] with row p*TQ+q."""
    a = arr.reshape(B, H, n_tiles, tile_q, L, P)
    a = a.transpose(0, 1, 2, 4, 5, 3)  # [B, H, t, L, P, TQ]
    return a.reshape(B, H, n_tiles, L, P * tile_q, 1)


def _pick_chunks(level_shapes, n_points, head_dim, tile_q,
                 vmem_budget: int) -> Tuple[int, ...]:
    out = []
    for (h, w) in level_shapes:
        wd = w * head_dim
        pc = 1
        for cand in (2, 4, 8):
            if (n_points % cand == 0 and cand <= n_points
                    and cand * tile_q * wd * 4 <= vmem_budget):
                pc = cand
        out.append(pc)
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=("level_shapes", "tile_q", "vmem_budget", "interpret"),
)
def ms_deform_attn_pallas_v2(
    value: jax.Array,  # [B, S, H, D]
    level_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jax.Array,  # [B, Q, H, L, P, 2]
    attention_weights: jax.Array,  # [B, Q, H, L, P]
    tile_q: int = 128,
    vmem_budget: int = 2 * 1024 * 1024,
    interpret: bool = False,
) -> jax.Array:
    """Same contract as `ms_deform_attn_pallas`; see the v2 notes above."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(level_shapes)
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in level_shapes) == S

    q_pad = (-Q) % tile_q
    loc = jnp.pad(
        sampling_locations.astype(jnp.float32),
        ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0), (0, 0)),
    ).transpose(0, 2, 1, 3, 4, 5)  # [B, H, Qp, L, P, 2]
    wts = jnp.pad(
        attention_weights.astype(jnp.float32),
        ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)),
    ).transpose(0, 2, 1, 3, 4)  # [B, H, Qp, L, P]
    Qp = Q + q_pad
    n_tiles = Qp // tile_q

    # per-level pixel coordinates + bilinear fractions (host XLA, tiny)
    w_arr = jnp.asarray([w for _, w in level_shapes], jnp.float32)
    h_arr = jnp.asarray([h for h, _ in level_shapes], jnp.float32)
    xs = loc[..., 0] * w_arr[None, None, None, :, None] - 0.5
    ys = loc[..., 1] * h_arr[None, None, None, :, None] - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    stk = functools.partial(
        _stack_points, B=B, H=H, n_tiles=n_tiles, tile_q=tile_q, L=L, P=P
    )
    y0s = stk(y0.astype(jnp.int32))
    x0s = stk(x0.astype(jnp.int32))
    lys = stk(ys - y0)
    lxs = stk(xs - x0)
    aws = stk(wts)

    # per-level D-major value mats [B, H, Hp, D*W]
    sublane = 16
    val = value.transpose(0, 2, 1, 3)  # [B, H, S, D]
    level_vals, padded_rows = [], []
    start = 0
    for (h_l, w_l) in level_shapes:
        v = jax.lax.slice_in_dim(val, start, start + h_l * w_l, axis=2)
        v = v.reshape(B, H, h_l, w_l, D).transpose(0, 1, 2, 4, 3)
        v = v.reshape(B, H, h_l, D * w_l)
        pad_h = (-h_l) % sublane
        if pad_h:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        padded_rows.append(h_l + pad_h)
        level_vals.append(v)
        start += h_l * w_l

    chunks = _pick_chunks(level_shapes, P, D, tile_q, vmem_budget)

    slab_spec = pl.BlockSpec(
        (1, 1, 1, L, P * tile_q, 1),
        lambda b, h, t: (b, h, t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    level_specs = [
        pl.BlockSpec(
            (1, 1, hp, w_l * D),
            lambda b, h, t: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for hp, (h_l, w_l) in zip(padded_rows, level_shapes)
    ]

    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, level_shapes=tuple(level_shapes), n_points=P,
            head_dim=D, tile_q=tile_q, chunks=chunks,
        ),
        grid=(B, H, n_tiles),
        in_specs=[slab_spec] * 5 + level_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, D),
            lambda b, h, t: (b, h, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), jnp.float32),
        interpret=interpret,
    )(y0s, x0s, lys, lxs, aws, *level_vals)
    out = out[:, :, :Q].transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D).astype(value.dtype)


# ======================================================================= #
# backward kernel (training path)                                         #
# ======================================================================= #
#
# The reference ships six hand-written CUDA backward variants
# (ms_deform_im2col_cuda.cuh:305-925: shared-memory tree reductions +
# atomicAdd scatter of grad_value).  In the separable formulation every
# gradient is a *transposed matmul of the same one-hot structure* — no
# scatter at all:
#
#   d_lvl   = d_out @ Gᵀ                      (un-fold)
#   dT      = C_rep ⊙ d_prod ;   dV' += Rᵀ @ dT          (MXU)
#   dC_rep  = T ⊙ d_prod ;      dC   = dC_rep @ G2       (lane fold)
#   d_aw    = Σ_w C̄ ⊙ dC ;      d_lx = aw·Σ_w (1(x0+1)−1(x0)) ⊙ dC
#   dR      = dT @ V'ᵀ ;         d_ly = Σ_h (1(y0+1)−1(y0)) ⊙ dR
#
# grad_value accumulates across query tiles through the sequential TPU grid
# (zero-init at t == 0, read-modify-write after), replacing atomicAdd.


def _kernel_v2_bwd(y0_ref, x0_ref, ly_ref, lx_ref, aw_ref, *refs,
                   level_shapes, n_points, head_dim, tile_q, chunks):
    nl = len(level_shapes)
    value_refs = refs[:nl]
    dout_ref = refs[nl]
    dv_refs = refs[nl + 1: 2 * nl + 1]
    daw_ref, dlx_ref, dly_ref = refs[2 * nl + 1:]
    d = head_dim
    t_id = pl.program_id(2)

    d_out = dout_ref[0, 0, :, :].astype(jnp.float32)  # [TQ, D]

    for lid, (h, w) in enumerate(level_shapes):
        wd = w * d
        value_mat = value_refs[lid][0, 0, :, :]
        hp = value_mat.shape[0]
        pc = chunks[lid]
        rows = pc * tile_q

        g_rows = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 0)
        g_cols = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 1)
        G = (g_rows // w == g_cols).astype(jnp.float32)
        g2_rows = jax.lax.broadcasted_iota(jnp.int32, (wd, w), 0)
        g2_cols = jax.lax.broadcasted_iota(jnp.int32, (wd, w), 1)
        G2 = (g2_rows % w == g2_cols).astype(jnp.float32)

        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, hp), 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)

        # d_lvl = d_out @ Gᵀ : contract the D axis -> [TQ, WD]
        d_lvl = jax.lax.dot_general(
            d_out, G, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        dv_acc = jnp.zeros((hp, wd), jnp.float32)
        for c in range(n_points // pc):
            sl = pl.dslice(c * rows, rows)
            y0 = y0_ref[0, 0, 0, lid, sl, :]
            x0 = x0_ref[0, 0, 0, lid, sl, :]
            ly = ly_ref[0, 0, 0, lid, sl, :]
            lx = lx_ref[0, 0, 0, lid, sl, :]
            aw = aw_ref[0, 0, 0, lid, sl, :]

            oh_y0 = (row_iota == y0).astype(jnp.float32)
            oh_y1 = (row_iota == y0 + 1).astype(jnp.float32)
            oh_x0 = (col_iota == x0).astype(jnp.float32)
            oh_x1 = (col_iota == x0 + 1).astype(jnp.float32)
            R = oh_y0 * (1.0 - ly) + oh_y1 * ly
            Cbar = oh_x0 * (1.0 - lx) + oh_x1 * lx
            C = aw * Cbar

            d_prod = (pltpu.repeat(d_lvl, pc, 0)
                      if pc > 1 else d_lvl)  # [rows, WD]
            C_rep = pltpu.repeat(C, d, 1)
            T = jnp.dot(
                R.astype(value_mat.dtype), value_mat,
                preferred_element_type=jnp.float32,
            )
            dT = C_rep * d_prod
            # dV' += Rᵀ @ dT (contract the row axis)
            dv_acc = dv_acc + jax.lax.dot_general(
                R, dT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dC = jnp.dot(T * d_prod, G2,
                         preferred_element_type=jnp.float32)  # [rows, W]
            daw = jnp.sum(Cbar * dC, axis=1, keepdims=True)
            dlx = aw * jnp.sum((oh_x1 - oh_x0) * dC, axis=1, keepdims=True)
            # dR = dT @ V'ᵀ (contract WD)
            dR = jax.lax.dot_general(
                dT, value_mat.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rows, Hp]
            dly = jnp.sum((oh_y1 - oh_y0) * dR, axis=1, keepdims=True)

            daw_ref[0, 0, 0, lid, sl, :] = daw
            dlx_ref[0, 0, 0, lid, sl, :] = dlx
            dly_ref[0, 0, 0, lid, sl, :] = dly

        @pl.when(t_id == 0)
        def _init():
            dv_refs[lid][0, 0, :, :] = dv_acc

        @pl.when(t_id > 0)
        def _accum():
            dv_refs[lid][0, 0, :, :] += dv_acc


def _v2_host_prep(value, level_shapes, sampling_locations,
                  attention_weights, tile_q):
    """Shared host-side preparation for fwd/bwd: stacked slabs + D-major
    per-level value mats. Returns everything the kernels consume."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(level_shapes)
    P = sampling_locations.shape[4]
    q_pad = (-Q) % tile_q
    loc = jnp.pad(
        sampling_locations.astype(jnp.float32),
        ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0), (0, 0)),
    ).transpose(0, 2, 1, 3, 4, 5)
    wts = jnp.pad(
        attention_weights.astype(jnp.float32),
        ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)),
    ).transpose(0, 2, 1, 3, 4)
    Qp = Q + q_pad
    n_tiles = Qp // tile_q
    w_arr = jnp.asarray([w for _, w in level_shapes], jnp.float32)
    h_arr = jnp.asarray([h for h, _ in level_shapes], jnp.float32)
    xs = loc[..., 0] * w_arr[None, None, None, :, None] - 0.5
    ys = loc[..., 1] * h_arr[None, None, None, :, None] - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    stk = functools.partial(
        _stack_points, B=B, H=H, n_tiles=n_tiles, tile_q=tile_q, L=L, P=P
    )
    slabs = (stk(y0.astype(jnp.int32)), stk(x0.astype(jnp.int32)),
             stk(ys - y0), stk(xs - x0), stk(wts))

    sublane = 16
    val = value.transpose(0, 2, 1, 3)
    level_vals, padded_rows = [], []
    start = 0
    for (h_l, w_l) in level_shapes:
        v = jax.lax.slice_in_dim(val, start, start + h_l * w_l, axis=2)
        v = v.reshape(B, H, h_l, w_l, D).transpose(0, 1, 2, 4, 3)
        v = v.reshape(B, H, h_l, D * w_l)
        pad_h = (-h_l) % sublane
        if pad_h:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        padded_rows.append(h_l + pad_h)
        level_vals.append(v)
        start += h_l * w_l
    return slabs, level_vals, padded_rows, Qp, n_tiles


def _unstack_points(arr, B, H, n_tiles, tile_q, L, P, Q):
    """Inverse of `_stack_points`, sliced back to Q queries:
    [B, H, n_tiles, L, P*TQ, 1] -> [B, Q, H, L, P]."""
    a = arr.reshape(B, H, n_tiles, L, P, tile_q)
    a = a.transpose(0, 1, 2, 5, 3, 4)  # [B, H, t, TQ, L, P]
    a = a.reshape(B, H, n_tiles * tile_q, L, P)
    return a.transpose(0, 2, 1, 3, 4)[:, :Q]


@functools.partial(
    jax.jit,
    static_argnames=("level_shapes", "tile_q", "vmem_budget", "interpret"),
)
def _ms_deform_attn_pallas_v2_bwd(
    value, level_shapes, sampling_locations, attention_weights, d_out,
    tile_q: int = 128, vmem_budget: int = 2 * 1024 * 1024,
    interpret: bool = False,
):
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(level_shapes)
    P = sampling_locations.shape[4]
    slabs, level_vals, padded_rows, Qp, n_tiles = _v2_host_prep(
        value, level_shapes, sampling_locations, attention_weights, tile_q
    )
    chunks = _pick_chunks(level_shapes, P, D, tile_q, vmem_budget)

    # d_out: [B, Q, H*D] -> [B, H, Qp, D]
    dout = d_out.reshape(B, Q, H, D).astype(jnp.float32)
    dout = jnp.pad(dout, ((0, 0), (0, Qp - Q), (0, 0), (0, 0)))
    dout = dout.transpose(0, 2, 1, 3)

    slab_spec = pl.BlockSpec(
        (1, 1, 1, L, P * tile_q, 1),
        lambda b, h, t: (b, h, t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    level_specs = [
        pl.BlockSpec(
            (1, 1, hp, w_l * D),
            lambda b, h, t: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for hp, (h_l, w_l) in zip(padded_rows, level_shapes)
    ]
    dv_shapes = [
        jax.ShapeDtypeStruct((B, H, hp, w_l * D), jnp.float32)
        for hp, (h_l, w_l) in zip(padded_rows, level_shapes)
    ]
    slab_shape = jax.ShapeDtypeStruct(
        (B, H, n_tiles, L, P * tile_q, 1), jnp.float32
    )

    outs = pl.pallas_call(
        functools.partial(
            _kernel_v2_bwd, level_shapes=tuple(level_shapes), n_points=P,
            head_dim=D, tile_q=tile_q, chunks=chunks,
        ),
        grid=(B, H, n_tiles),
        in_specs=[slab_spec] * 5 + level_specs + [
            pl.BlockSpec(
                (1, 1, tile_q, D),
                lambda b, h, t: (b, h, t, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=level_specs + [slab_spec] * 3,
        out_shape=dv_shapes + [slab_shape] * 3,
        interpret=interpret,
    )(*slabs, *level_vals, dout)
    dv_levels = outs[:L]
    daw_s, dlx_s, dly_s = outs[L:]

    # d_value: per-level [B, H, Hp, D*W] -> [B, S, H, D]
    parts = []
    for (h_l, w_l), dv in zip(level_shapes, dv_levels):
        dv = dv[:, :, :h_l, :].reshape(B, H, h_l, D, w_l)
        dv = dv.transpose(0, 1, 2, 4, 3).reshape(B, H, h_l * w_l, D)
        parts.append(dv)
    d_value = jnp.concatenate(parts, axis=2).transpose(0, 2, 1, 3)
    d_value = d_value.astype(value.dtype)

    unstk = functools.partial(
        _unstack_points, B=B, H=H, n_tiles=n_tiles, tile_q=tile_q,
        L=L, P=P, Q=Q,
    )
    d_aw = unstk(daw_s).astype(attention_weights.dtype)
    d_lx = unstk(dlx_s)
    d_ly = unstk(dly_s)
    # xs = loc_x * W_l - 0.5  =>  d loc_x = d_lx * W_l (same for y)
    w_arr = jnp.asarray([w for _, w in level_shapes], jnp.float32)
    h_arr = jnp.asarray([h for h, _ in level_shapes], jnp.float32)
    d_loc = jnp.stack([
        d_lx * w_arr[None, None, None, :, None],
        d_ly * h_arr[None, None, None, :, None],
    ], axis=-1).astype(sampling_locations.dtype)
    return d_value, d_loc, d_aw


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(1, 4, 5, 6)
)
def ms_deform_attn_pallas_v2_trainable(
    value, level_shapes, sampling_locations, attention_weights,
    tile_q: int = 128, vmem_budget: int = 2 * 1024 * 1024,
    interpret: bool = False,
):
    """`ms_deform_attn_pallas_v2` with a Pallas backward — the training-path
    kernel (grads w.r.t. value, sampling_locations, attention_weights)."""
    return ms_deform_attn_pallas_v2(
        value, level_shapes, sampling_locations, attention_weights,
        tile_q=tile_q, vmem_budget=vmem_budget, interpret=interpret,
    )


def _v2_fwd(value, level_shapes, sampling_locations, attention_weights,
            tile_q, vmem_budget, interpret):
    out = ms_deform_attn_pallas_v2(
        value, level_shapes, sampling_locations, attention_weights,
        tile_q=tile_q, vmem_budget=vmem_budget, interpret=interpret,
    )
    return out, (value, sampling_locations, attention_weights)


def _v2_bwd(level_shapes, tile_q, vmem_budget, interpret, res, d_out):
    value, loc, wts = res
    return _ms_deform_attn_pallas_v2_bwd(
        value, level_shapes, loc, wts, d_out,
        tile_q=tile_q, vmem_budget=vmem_budget, interpret=interpret,
    )


ms_deform_attn_pallas_v2_trainable.defvjp(_v2_fwd, _v2_bwd)
