"""Factorized multi-image deformable-attention Pallas kernel (inference).

Fifth-generation formulation, built for the UNet-side MMFS denoise loop
(reference `sd_mmfs.py:99-151` + `sd_unet_forward_monkey_patch.py:318-325`)
where the image mask — and hence the per-image relative-position index — is
per *(batch, image)*, not per query.  Exploits two structural facts the
generic v4 kernel cannot:

1. **The image axis never needs to leave the chip.**  Sampling locations
   and attention weights decompose into a query part and a per-image part
   (see `models/mmfs.py` round-3 linearisation):

       xs[b,q,h,n,l,p] = xs_q[b,q,h,l,p] + dx[b,n,h,l,p]
       aw[b,q,h,n,l,p] = wq[b,q,h,l,p] * wi[b,n,h,l,p]

   The kernel takes the narrow query slab (no ``n_img`` axis) plus a tiny
   per-image delta table and loops over images *inside* the grid cell —
   HBM traffic for the slab drops by the ``n_img`` factor and the wide
   ``[B, Lq, H, n_img, L, P, 2]`` location tensor is never materialised.

2. **The 0/1 x-expansion is block-diagonal.**  v4 lifts the narrow
   x-weights to the wide x-major layout with one ``[TQ, Wp] @ [Wp, H*Wp]``
   matmul per point; but each 128-lane output tile only reads ``128/H``
   x-rows, so the systolic array streams ``Wp`` K-rows where ``~wc`` are
   nonzero.  Chunking the expansion into ``wc*H``-lane column blocks
   (``wc = ~512/H``) cuts the expansion MXU cycles by ``Wp/wc`` (8x at the
   64x64 UNet level) and turns the level contraction into a sequence of
   ``[TQ, wc*H] @ [wc*H, D]`` matmuls — the useful A@V work dominates again.

Forward-only: the denoise loop runs under `jax.lax.scan` with no gradient.
Training and the LLM-branch per-query masks stay on the v4 kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ms_deform_attn_pallas_v4 import _padded_cols

_LANE = 128


def _hat(t):
    return jnp.maximum(1.0 - jnp.abs(t), 0.0)


def _chunk_width(h: int, wp: int) -> int:
    """x-chunk width: ``wc*h`` lanes per expansion block, targeting ~512
    lanes, always a multiple of 128 (`_padded_cols` guarantees ``h*wp``
    is)."""
    wc = min(wp, max(1, 512 // h))
    while wp % wc or (h * wc) % _LANE:
        wc += 1
        if wc >= wp:
            return wp
    return wc


def _e_small(wc: int, h: int, dtype) -> jax.Array:
    """0/1 expansion block: E[x, x*h + y] = 1 (x < wc)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (wc, wc * h), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (wc, wc * h), 1)
    return (cols // h == rows).astype(dtype)


def _accum_level(acc, get_point, vslab_rows, h, wp, tile_q, n_points,
                 vdtype, prec):
    """acc += sum_p hat-bilinear(point_p) @ V for one level, chunked.

    ``get_point(p) -> (xs, ys, aw)`` as [TQ, 1] f32 in texel coordinates;
    ``vslab_rows(lo, hi) -> [hi-lo, D]`` value rows (x-major layout)."""
    wc = _chunk_width(h, wp)
    iox = jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, wp), 1).astype(jnp.float32)
    ioy = jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, h), 1).astype(jnp.float32)
    e_mat = _e_small(wc, h, jnp.bfloat16 if vdtype == jnp.bfloat16
                     else jnp.float32)

    wxs, wyrs = [], []
    for p in range(n_points):
        xs, ys, aw = get_point(p)
        wxs.append(_hat(iox - xs))
        wy = _hat(ioy - ys) * aw
        wyrs.append(pltpu.repeat(wy, wc, 1))  # [TQ, wc*h]

    for g in range(wp // wc):
        A = None
        for p in range(n_points):
            wxe = jnp.dot(
                wxs[p][:, g * wc:(g + 1) * wc].astype(e_mat.dtype), e_mat,
                preferred_element_type=jnp.float32,
            )  # [TQ, wc*h]
            contrib = wxe * wyrs[p]
            A = contrib if A is None else A + contrib
        v = vslab_rows(g * wc * h, (g + 1) * wc * h)
        delta = jnp.dot(
            A.astype(vdtype), v,
            preferred_element_type=jnp.float32, precision=prec,
        )
        acc = delta if acc is None else acc + delta
    return acc


def _kernel_mi(slab_ref, delta_ref, *refs, level_shapes, n_points, n_img,
               tile_q):
    """All images x all levels in one grid cell."""
    L = len(level_shapes)
    value_refs = refs[:L]
    out_ref = refs[-1]
    slab = slab_ref[0, 0, :, :]
    vdtype = value_refs[0].dtype
    prec = (jax.lax.Precision.HIGHEST if vdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    acc = None
    for n in range(n_img):
        for lid, (h, w) in enumerate(level_shapes):
            wp = _padded_cols(h, w)[0]
            hwp = h * wp
            vmat = value_refs[lid]

            def get_point(p, n=n, lid=lid):
                j = (lid * n_points + p) * 3
                xs = slab[:, j:j + 1] + delta_ref[0, 0, n, j]
                ys = slab[:, j + 1:j + 2] + delta_ref[0, 0, n, j + 1]
                aw = slab[:, j + 2:j + 3] * delta_ref[0, 0, n, j + 2]
                return xs, ys, aw

            def vslab_rows(lo, hi, vmat=vmat, n=n, hwp=hwp):
                return vmat[0, 0, n * hwp + lo:n * hwp + hi, :]

            acc = _accum_level(
                acc, get_point, vslab_rows, h, wp, tile_q, n_points,
                vdtype, prec,
            )
    out_ref[0, 0, :, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("level_shapes", "inv_base", "tile_q", "interpret"),
)
def mmfs_deform_factorized(
    value: jax.Array,  # [B, n_img, hw, H, D]
    level_shapes: Tuple[Tuple[int, int], ...],
    ref: jax.Array,  # [B, Lq, 2] f32, (x, y) in [0, 1]
    off_q: jax.Array,  # [B, Lq, H, P, 2] f32 (query offset part, bias incl.)
    off_img: jax.Array,  # [B, n_img, H, P, 2] f32 (relpos offset part)
    wq: jax.Array,  # [B, Lq, H, L, P] f32 = Eq * rZ (query weight factor)
    wi: jax.Array,  # [B, n_img, H, L, P] f32 = Et (masked image factor)
    inv_base: float,  # per-level offset scale (1 / base_spatial_shape)
    tile_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Lq, H*D] in value's dtype: the w-weighted multi-image
    multi-scale deformable readout, equal (within fp rounding) to
    `ms_deform_attn_multi_image` on the expanded tensors."""
    B, n_img, hw, H, D = value.shape
    Lq = off_q.shape[1]
    L = len(level_shapes)
    P = off_q.shape[3]
    assert sum(h * w for h, w in level_shapes) == hw

    q_pad = (-Lq) % tile_q
    Qp = Lq + q_pad

    # --- query slab [B, H, Qp, L*P*3]: per (l, p) lanes (xs_q, ys_q, wq)
    # in texel coordinates of level l
    wl = jnp.asarray([w for (_, w) in level_shapes], jnp.float32)
    hl = jnp.asarray([h for (h, _) in level_shapes], jnp.float32)
    # [B, Lq, H, L, P]
    xs_q = (ref[:, :, None, None, None, 0]
            + off_q[:, :, :, None, :, 0] * inv_base) \
        * wl[None, None, None, :, None] - 0.5
    ys_q = (ref[:, :, None, None, None, 1]
            + off_q[:, :, :, None, :, 1] * inv_base) \
        * hl[None, None, None, :, None] - 0.5
    slab = jnp.stack([xs_q, ys_q, wq.astype(jnp.float32)], axis=-1)
    slab = slab.reshape(B, Lq, H, L * P * 3).transpose(0, 2, 1, 3)
    slab = jnp.pad(slab, ((0, 0), (0, 0), (0, q_pad), (0, 0)))

    # --- per-image delta [B, H, n_img, L*P*3]: (dx, dy, wi) — the additive
    # texel shift and multiplicative weight factor per (image, level, point)
    dx = off_img[:, :, :, None, :, 0] * inv_base \
        * wl[None, None, None, :, None]  # [B, n_img, H, L, P]
    dy = off_img[:, :, :, None, :, 1] * inv_base \
        * hl[None, None, None, :, None]
    delta = jnp.stack([dx, dy, wi.astype(jnp.float32)], axis=-1)
    delta = delta.reshape(B, n_img, H, L * P * 3).transpose(0, 2, 1, 3)

    # --- per-level x-major value slabs [B, H, n_img*HWp_l, D]
    val = value.transpose(0, 3, 1, 2, 4)  # [B, H, n_img, hw, D]
    level_vals, start = [], 0
    for (h_l, w_l) in level_shapes:
        wp, hwp = _padded_cols(h_l, w_l)
        v = jax.lax.slice_in_dim(val, start, start + h_l * w_l, axis=3)
        v = v.reshape(B, H, n_img, h_l, w_l, D).transpose(0, 1, 2, 4, 3, 5)
        if wp > w_l:
            v = jnp.pad(
                v, ((0, 0), (0, 0), (0, 0), (0, wp - w_l), (0, 0), (0, 0))
            )
        level_vals.append(v.reshape(B, H, n_img * hwp, D))
        start += h_l * w_l

    n_tiles = Qp // tile_q
    out = pl.pallas_call(
        functools.partial(
            _kernel_mi, level_shapes=tuple(level_shapes), n_points=P,
            n_img=n_img, tile_q=tile_q,
        ),
        grid=(B, H, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, tile_q, L * P * 3),
                lambda b, hh, t: (b, hh, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n_img, L * P * 3),
                lambda b, hh, t: (b, hh, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ] + [
            pl.BlockSpec(
                (1, 1, v.shape[2], D),
                lambda b, hh, t: (b, hh, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for v in level_vals
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_q, D),
            lambda b, hh, t: (b, hh, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), jnp.float32),
        interpret=interpret,
    )(slab, delta, *level_vals)
    out = out[:, :, :Lq].transpose(0, 2, 1, 3)
    return out.reshape(B, Lq, H * D).astype(value.dtype)
