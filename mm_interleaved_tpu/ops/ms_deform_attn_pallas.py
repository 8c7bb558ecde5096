"""Pallas TPU kernel for multi-scale deformable attention.

The XLA formulation (`ops/ms_deform_attn.py`) lowers to per-element gathers —
the worst case for the TPU vector unit and the measured bottleneck of both
the ViT-Adapter and the UNet MMFS blocks.  This kernel reformulates bilinear
sampling as an **on-the-fly one-hot interpolation matrix** built in VMEM and
contracted on the MXU (docs/KERNELS.md option 1; same numerics contract as
the XLA oracle, tested in interpret mode against it):

  per (batch, head, query-tile):
    for each level l (static):
      W[TILE_Q, HW_l] = sum_{point, corner} att_w * bilin_w * onehot(texel)
      acc += W @ value_l[HW_l, D]          # MXU

No gathers, no HBM intermediates; the attention-weight multiply and the sum
over points fold into W.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(loc_ref, w_ref, value_ref, out_ref, *, level_shapes, n_points):
    """Block shapes (leading grid singletons kept by BlockSpec):
    loc_ref:   [1, 1, TILE_Q, L, P, 2] (f32)
    w_ref:     [1, 1, TILE_Q, L, P]    (f32)
    value_ref: [1, 1, S, D]            (value dtype)
    out_ref:   [1, 1, TILE_Q, D]       (f32)

    The one-hot accumulation runs as a `fori_loop` over the 4P
    (point, corner) slots.  Mosaic supports neither dynamic value slices nor
    dynamic lane offsets, so the loop always reads lane slot 0 of a carried
    [TILE_Q, 4P] buffer and `pltpu.roll`s it by one each iteration.
    """
    tile_q = loc_ref.shape[2]
    acc = None
    start = 0
    n_slots = 4 * n_points
    for lid, (h, w) in enumerate(level_shapes):
        hw = h * w
        value_l = value_ref[0, 0, pl.ds(start, hw), :]  # [HW, D]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, hw), 1)

        # vectorised (point x corner) precompute -> [TILE_Q, 4P]
        x = loc_ref[0, 0, :, lid, :, 0] * w - 0.5  # [TILE_Q, P]
        y = loc_ref[0, 0, :, lid, :, 1] * h - 0.5
        aw = w_ref[0, 0, :, lid, :]  # [TILE_Q, P]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        idx_cols, wt_cols = [], []
        for dx, dy, cw in (
            (0, 0, (1.0 - lx) * (1.0 - ly)),
            (1, 0, lx * (1.0 - ly)),
            (0, 1, (1.0 - lx) * ly),
            (1, 1, lx * ly),
        ):
            ix = x0i + dx
            iy = y0i + dy
            valid = (
                (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            ).astype(jnp.float32)
            idx_cols.append(
                jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
            )
            wt_cols.append(aw * cw * valid)
        idx_all = jnp.concatenate(idx_cols, axis=1)  # [TILE_Q, 4P]
        wt_all = jnp.concatenate(wt_cols, axis=1)

        def body(_, carry):
            wmat, idx_roll, wt_roll = carry
            idx_k = idx_roll[:, 0:1]  # static lane slice
            wt_k = wt_roll[:, 0:1]
            wmat = wmat + jnp.where(col == idx_k, wt_k, 0.0)
            return (
                wmat,
                pltpu.roll(idx_roll, idx_roll.shape[1] - 1, 1),
                pltpu.roll(wt_roll, wt_roll.shape[1] - 1, 1),
            )

        wmat, _, _ = jax.lax.fori_loop(
            0, n_slots, body,
            (jnp.zeros((tile_q, hw), jnp.float32), idx_all, wt_all),
        )
        contrib = jnp.dot(
            wmat.astype(value_l.dtype), value_l,
            preferred_element_type=jnp.float32,
        )
        acc = contrib if acc is None else acc + contrib
        start += hw
    out_ref[0, 0, :, :] = acc


@functools.partial(
    jax.jit, static_argnames=("level_shapes", "tile_q", "interpret")
)
def ms_deform_attn_pallas(
    value: jax.Array,  # [B, S, H, D]
    level_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jax.Array,  # [B, Q, H, L, P, 2]
    attention_weights: jax.Array,  # [B, Q, H, L, P]
    tile_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for `ms_deform_attn` (same contract); returns
    [B, Q, H*D] in value's dtype."""
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

    # layouts: fold head into a leading grid-friendly axis
    loc = loc.transpose(0, 2, 1, 3, 4, 5)  # [B, H, Qp, L, P, 2]
    wts = wts.transpose(0, 2, 1, 3, 4)  # [B, H, Qp, L, P]
    val = value.transpose(0, 2, 1, 3)  # [B, H, S, D]

    out = pl.pallas_call(
        functools.partial(
            _kernel, level_shapes=tuple(level_shapes), n_points=P
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
            pl.BlockSpec(
                (1, 1, S, D),
                lambda b, h, t: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
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
        val,
    )
    out = out[:, :, :Q].transpose(0, 2, 1, 3)  # [B, Q, H, D]
    return out.reshape(B, Q, H * D).astype(value.dtype)
