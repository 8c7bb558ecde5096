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

Superseded in production by the dense bilinear-matrix kernel in
`ms_deform_attn_pallas_v4.py` (one matmul per level, differentiable,
1.5-1.7x faster); v1 is kept as the benchmark comparison baseline.
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
