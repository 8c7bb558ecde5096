"""Factorized multi-image deformable-attention Pallas kernel (inference).

Serves the UNet-side MMFS denoise loop (reference `sd_mmfs.py:99-151` +
`sd_unet_forward_monkey_patch.py:318-325`) where the image mask — and hence
the per-image relative-position index — is per *(batch, image)*, not per
query.  Exploits three structural facts the generic kernels cannot:

1. **The image axis never needs to leave the chip.**  Sampling locations
   and attention weights decompose into a query part and a per-image part
   (see `models/mmfs.py` round-3 linearisation):

       xs[b,q,h,n,l,p] = xs_q[b,q,h,l,p] + dx[b,n,h,l,p]
       aw[b,q,h,n,l,p] = wq[b,q,h,l,p] * wi[b,n,h,l,p]

   The kernel takes one compact per-head query slab (offsets, weights and
   reference points packed on 50 lanes — no ``n_img`` axis, no expanded
   per-level coordinate copies) plus a tiny per-image delta table in SMEM
   and loops over images *inside* the grid cell — the wide
   ``[B, Lq, H, n_img, L, P, 2]`` location tensor is never materialised.
   Per-(level, point) texel coordinates are built in-kernel from the packed
   factors (round-4): the old host-side ``[B, H, Qp, L*P*3]`` slab expanded
   coordinates per level and cost ~400 MB of HBM traffic per 64px UNet
   block in stack + transpose + occupancy reads; the packed slab is ~2x
   smaller and is written by one fused XLA pass.  (Packing everything into
   ONE array matters: narrow per-field arrays get lane-padded to 128 in
   HBM's (8, 128) tiling — a separate ``[B, H, Qp, 8]`` offsets tensor
   reads 16x its payload.)

2. **Bilinear hat weights are 2-sparse per row axis** and the sampling
   rows of one row-major 128-query tile cluster tightly (UNet queries are
   latent-grid points with grid-local reference points).  The value slab
   stays in natural row-major order, split into row chunks; per-image,
   per-level, per-chunk occupancy bits — computed on the host from the
   narrow factors' min/max row intervals — gate each chunk's A-build +
   matmul behind ``pl.when``.  Skipping is exact: an unoccupied chunk's
   bilinear matrix is identically zero (see `ms_deform_attn_pallas_v5.py`).

3. **Masked images cost nothing**: ``wi == 0`` clears every occupancy bit
   of that image, so the inner image loop degenerates to the live images.

The output is accumulated in an f32 VMEM scratch and written directly in
the value dtype (the old f32 output paid double write + transpose-read
traffic per block).

Forward-only: the denoise loop runs under `jax.lax.scan` with no gradient.
Training and the LLM-branch per-query masks use the v5 trainable kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ms_deform_attn_pallas_v5 import (
    _WORD_BITS,
    _hat,
    _metas,
)

_LANE = 128


def _kernel_mi(occ_ref, slab_ref, delta_ref, *refs, metas, n_points, n_img,
               tile_q, inv_base, wls, hls, heads_per_cell):
    """All images x all levels x occupied row chunks in one grid cell.

    Texel coordinates are built in-kernel from the packed query slab
    (TRANSPOSED layout — sublanes: offx[P], offy[P], wq[L*P], refx, refy;
    lanes: queries — so the HBM-resident slab's minor dim is the
    128-aligned padded query count instead of 50 lanes padded to 128):
      xs[q; l, p] = (refx[q] + offx[p, q] * inv_base) * wl[l] - 0.5 + dx
      aw[q; l, p] = wq[l*P + p, q] * wi
    with (dx, dy, wi) per (image, level, point) from the SMEM delta table.
    The bilinear matrix is built transposed (``A_T [chunk, tile_q]``) and
    contracted on dim 0 — same MXU work, no in-kernel transpose.

    ``heads_per_cell`` heads are processed per grid cell, written side by
    side on the output's lane axis: with D=64 pairing two heads makes the
    write 128-lane dense in the final ``[B, Qp, H*D]`` layout — no HBM
    lane padding and no post-kernel transpose.
    """
    L = len(metas)
    P = n_points
    value_refs = refs[:L]
    out_ref = refs[-2]
    acc_ref = refs[-1]
    vdtype = value_refs[0].dtype
    prec = (jax.lax.Precision.HIGHEST if vdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    D = value_refs[0].shape[3]
    acc_ref[...] = jnp.zeros((tile_q, heads_per_cell * D), jnp.float32)

    for hh in range(heads_per_cell):
        slab = slab_ref[0, hh, :, :]  # [2P + L*P + 2, tile_q] f32
        refx = slab[2 * P + L * P:2 * P + L * P + 1, :]  # [1, tile_q]
        refy = slab[2 * P + L * P + 1:2 * P + L * P + 2, :]

        for n in range(n_img):
            bit = 0
            for lid, m in enumerate(metas):
                vref = value_refs[lid]
                wl = wls[lid]
                hl = hls[lid]
                for g in range(m.G):
                    w_i, b_i = divmod(bit, _WORD_BITS)
                    cond = ((occ_ref[0, hh, 0, n, w_i] >> b_i) & 1) == 1

                    @pl.when(cond)
                    def _(hh=hh, n=n, lid=lid, g=g, m=m, vref=vref, wl=wl,
                          hl=hl, slab=slab, refx=refx, refy=refy):
                        f = jax.lax.broadcasted_iota(
                            jnp.int32, (m.chunk, tile_q), 0)
                        iox = (f % m.wp).astype(jnp.float32)
                        ioy = (f // m.wp).astype(jnp.float32) \
                            + float(g * m.hc)
                        A_T = None
                        for p in range(P):
                            j = 3 * (lid * P + p)
                            xs = (refx + slab[p:p + 1, :] * inv_base) * wl \
                                - 0.5 + delta_ref[0, hh, n, j]
                            ys = (refy + slab[P + p:P + p + 1, :]
                                  * inv_base) * hl - 0.5 \
                                + delta_ref[0, hh, n, j + 1]
                            aw = slab[2 * P + lid * P + p:
                                      2 * P + lid * P + p + 1, :] \
                                * delta_ref[0, hh, n, j + 2]
                            contrib = _hat(iox - xs) * (_hat(ioy - ys) * aw)
                            A_T = contrib if A_T is None else A_T + contrib
                        lo = n * m.hwp + g * m.chunk
                        rows = vref[0, hh, lo:lo + m.chunk, :]
                        # contract the chunk axis of both (A_T^T @ rows) —
                        # the MXU takes the transposed lhs via dimension
                        # numbers, no data movement
                        acc_ref[:, hh * D:(hh + 1) * D] += (
                            jax.lax.dot_general(
                                A_T.astype(vdtype), rows,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=prec,
                            )
                        )

                    bit += 1

    out_ref[0, :, :] = acc_ref[...].astype(out_ref.dtype)


def _occupancy_mi(refy, off_qy, wq_any, delta, metas, n_points, tile_q,
                  inv_base):
    """[B, H, T, n_img, n_words] int32 occupancy bits per (level, chunk).

    Conservative-exact, computed from the pre-transpose factors: per point
    the tile's normalised ``ref_y + offy * inv_base`` interval (min/max
    over its live queries) maps affinely to each level's texel rows
    (``hl > 0`` commutes with min/max), is shifted by the image's ``dy``;
    a chunk is marked iff some point's shifted interval meets the open
    hat-support window and the image weight factor is nonzero."""
    B, Lq, H, P = off_qy.shape
    q_pad = (-Lq) % tile_q
    # normalised y per (b, q, h, p), masked to exclude dead queries
    y0 = refy[:, :, None, None] + off_qy * inv_base  # [B, Lq, H, P]
    neg, pos = jnp.float32(-1e9), jnp.float32(1e9)
    lo_m = jnp.where(wq_any[..., None], y0, pos)
    hi_m = jnp.where(wq_any[..., None], y0, neg)
    if q_pad:
        lo_m = jnp.pad(lo_m, ((0, 0), (0, q_pad), (0, 0), (0, 0)),
                       constant_values=pos)
        hi_m = jnp.pad(hi_m, ((0, 0), (0, q_pad), (0, 0), (0, 0)),
                       constant_values=neg)
    T = (Lq + q_pad) // tile_q
    y_lo = lo_m.reshape(B, T, tile_q, H, P).min(axis=2)  # [B, T, H, P]
    y_hi = hi_m.reshape(B, T, tile_q, H, P).max(axis=2)
    y_lo = y_lo.transpose(0, 2, 1, 3)  # [B, H, T, P]
    y_hi = y_hi.transpose(0, 2, 1, 3)

    dy = delta[..., 1::3]  # [B, H, n_img, L*P]
    wi = delta[..., 2::3]
    live = wi != 0  # [B, H, n_img, L*P]

    words, cur, nb = [], 0, 0
    for lid, m in enumerate(metas):
        hl = float(m.h)
        sl = slice(lid * P, (lid + 1) * P)
        # texel-row interval at this level (affine map commutes w/ min-max)
        lo_n = (y_lo * hl - 0.5)[:, :, :, None, :] + dy[:, :, None, :, sl]
        hi_n = (y_hi * hl - 0.5)[:, :, :, None, :] + dy[:, :, None, :, sl]
        live_l = live[:, :, None, :, sl]  # [B, H, 1, n_img, P]
        for g in range(m.G):
            lo, hi = g * m.hc, (g + 1) * m.hc
            occ = (
                (hi_n > lo - 1.0) & (lo_n < float(hi)) & live_l
            ).any(axis=-1)
            cur = cur | (occ.astype(jnp.int32) << nb)
            nb += 1
            if nb == _WORD_BITS:
                words.append(cur)
                cur, nb = 0, 0
    if nb:
        words.append(cur)
    return jnp.stack(words, axis=-1)


def prepare_value_slabs(
    value: jax.Array,  # [B, n_img, hw, H, D]
    level_shapes: Tuple[Tuple[int, int], ...],
) -> Tuple[jax.Array, ...]:
    """Per-level row-major kernel-layout value slabs ``[B, H, n_img*HWp_l,
    D]``.

    Step-invariant: the denoise loop hoists this out of the `lax.scan` —
    the layout transpose alone moves ~180 MB of HBM per 64px UNet block
    and XLA's loop-invariant code motion does NOT lift it out of the scan
    body (round-5 probe: ~19 ms/step of MMFS machinery with all images
    masked)."""
    B, n_img, hw, H, D = value.shape
    assert sum(h * w for h, w in level_shapes) == hw
    metas = _metas(level_shapes)
    val = value.transpose(0, 3, 1, 2, 4)  # [B, H, n_img, hw, D]
    level_vals, start = [], 0
    for m in metas:
        v = jax.lax.slice_in_dim(val, start, start + m.h * m.w, axis=3)
        v = v.reshape(B, H, n_img, m.h, m.w, D)
        if m.wp > m.w:
            v = jnp.pad(
                v, ((0, 0), (0, 0), (0, 0), (0, 0), (0, m.wp - m.w), (0, 0))
            )
        level_vals.append(v.reshape(B, H, n_img * m.hwp, D))
        start += m.h * m.w
    return tuple(level_vals)


def build_delta(
    off_img: jax.Array,  # [B, n_img, H, P, 2] f32 (relpos offset part)
    wi: jax.Array,  # [B, n_img, H, L, P] f32 = Et (masked image factor)
    level_shapes: Tuple[Tuple[int, int], ...],
    inv_base: float,
) -> jax.Array:
    """Per-image delta table [B, H, n_img, L*P*3]: (dx, dy, wi) — the
    additive texel shift and multiplicative weight factor per (image,
    level, point).  Tiny (no query axis)."""
    B, n_img, H, P, _ = off_img.shape
    L = len(level_shapes)
    wl = jnp.asarray([float(w) for (_, w) in level_shapes], jnp.float32)
    hl = jnp.asarray([float(h) for (h, _) in level_shapes], jnp.float32)
    dx = off_img[:, :, :, None, :, 0] * inv_base \
        * wl[None, None, None, :, None]  # [B, n_img, H, L, P]
    dy = off_img[:, :, :, None, :, 1] * inv_base \
        * hl[None, None, None, :, None]
    delta = jnp.stack([dx, dy, wi.astype(jnp.float32)], axis=-1)
    return delta.reshape(B, n_img, H, L * P * 3).transpose(0, 2, 1, 3)


def prepare_image_side(
    value: jax.Array,  # [B, n_img, hw, H, D]
    level_shapes: Tuple[Tuple[int, int], ...],
    off_img: jax.Array,  # [B, n_img, H, P, 2] f32 (relpos offset part)
    wi: jax.Array,  # [B, n_img, H, L, P] f32 = Et (masked image factor)
    inv_base: float,
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Step-invariant kernel inputs: value slabs + delta table."""
    return (
        prepare_value_slabs(value, level_shapes),
        build_delta(off_img, wi, level_shapes, inv_base),
    )


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
    wq: jax.Array,  # [B, Lq, H, L, P] = Eq * rZ (query weight factor)
    wi: jax.Array,  # [B, n_img, H, L, P] f32 = Et (masked image factor)
    inv_base: float,  # per-level offset scale (1 / base_spatial_shape)
    tile_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Returns [B, Lq, H*D] in value's dtype: the w-weighted multi-image
    multi-scale deformable readout, equal (within fp rounding) to
    `ms_deform_attn_multi_image` on the expanded tensors.  ``wq`` may be
    bf16 (production denoise) or f32 (parity tests) — the kernel upcasts
    it into the f32 slab either way."""
    level_vals, delta = prepare_image_side(
        value, level_shapes, off_img, wi, inv_base
    )
    return mmfs_deform_factorized_prepared(
        level_vals, delta, level_shapes, ref, off_q, wq, inv_base,
        tile_q=tile_q, interpret=interpret,
    )


def mmfs_deform_factorized_prepared(
    level_vals: Tuple[jax.Array, ...],  # per-level [Bv, H, n_img*HWp_l, D]
    delta: jax.Array,  # [Bv, H, n_img, L*P*3] f32
    level_shapes: Tuple[Tuple[int, int], ...],
    ref: jax.Array,  # [B, Lq, 2] f32, (x, y) in [0, 1]
    off_q: jax.Array,  # [B, Lq, H, P, 2] f32 (query offset part, bias incl.)
    wq: jax.Array,  # [B, Lq, H, L, P] = Eq * rZ (query weight factor)
    inv_base: float,
    tile_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Per-step half of :func:`mmfs_deform_factorized`: takes the prepared
    image-side inputs so only the query-side slab + occupancy are built per
    denoise step.

    **CFG sharing**: the image side (``level_vals``, ``delta``) may carry a
    smaller batch ``Bv`` with ``B == cfg_dup * Bv`` — query row ``c*Bv + b``
    reads image row ``b``.  The denoise loop's CFG duplication
    (``[uncond rows..., cond rows...]``) has an *identical* image side in
    both halves (values and relpos tables are mask/feature functions only),
    so passing the un-duplicated half lets consecutive grid steps reuse the
    fetched value block and halves the dominant per-step HBM stream."""
    B, Lq, H, P, _ = off_q.shape
    L = len(level_shapes)
    n_img = delta.shape[2]
    D = level_vals[0].shape[3]
    Bv = level_vals[0].shape[0]
    assert B % Bv == 0 and delta.shape[0] == Bv
    cfg_dup = B // Bv
    metas = _metas(level_shapes)

    q_pad = (-Lq) % tile_q
    Qp = Lq + q_pad
    wls = tuple(float(w) for (_, w) in level_shapes)
    hls = tuple(float(h) for (h, _) in level_shapes)

    # --- packed per-head query slab [B, H, 2P + L*P + 2, Qp] f32,
    # TRANSPOSED: sublanes [offx(P), offy(P), wq(L*P), refx, refy], lanes =
    # queries — the minor dim is the 128-aligned query count, so the
    # HBM-resident slab carries no lane padding (the straight layout's 50
    # lanes pad to 128: 2.56x write+read waste).  One fused
    # concat-of-transposes pass, no per-level coordinate expansion.
    refb = jnp.broadcast_to(
        ref.astype(jnp.float32).transpose(0, 2, 1)[:, None], (B, H, 2, Lq)
    )
    slab = jnp.concatenate(
        [
            off_q[..., 0].astype(jnp.float32).transpose(0, 2, 3, 1),
            off_q[..., 1].astype(jnp.float32).transpose(0, 2, 3, 1),
            wq.reshape(B, Lq, H, L * P).astype(jnp.float32)
            .transpose(0, 2, 3, 1),
            refb,
        ],
        axis=2,
    )  # [B, H, 2P + L*P + 2, Lq]
    if q_pad:
        slab = jnp.pad(slab, ((0, 0), (0, 0), (0, 0), (0, q_pad)))

    wq_any = (wq != 0).any(axis=(-2, -1))  # [B, Lq, H] live-query mask
    delta_q = delta
    if cfg_dup > 1:
        delta_q = jnp.concatenate([delta] * cfg_dup, axis=0)
    occ = _occupancy_mi(
        ref[..., 1].astype(jnp.float32),
        off_q[..., 1].astype(jnp.float32), wq_any, delta_q, metas, P,
        tile_q, inv_base,
    )

    n_tiles = Qp // tile_q
    lanes = slab.shape[2]
    # group heads per grid cell so each cell writes a 128-lane-aligned
    # dense slice of the FINAL [B, Qp, H*D] layout (D=64 -> head pairs) —
    # no output lane padding, no post-kernel transpose.  Mosaic requires
    # the lane block to be 128-divisible or the whole lane dim.
    hpc = 1
    if D % 128 != 0:
        hpc = H  # fallback: whole lane dim per cell
        for h in range(1, H):
            if H % h == 0 and (h * D) % 128 == 0:
                hpc = h
                break
    Hc = H // hpc
    out = pl.pallas_call(
        functools.partial(
            _kernel_mi, metas=metas, n_points=P, n_img=n_img, tile_q=tile_q,
            inv_base=inv_base, wls=wls, hls=hls, heads_per_cell=hpc,
        ),
        # c (the CFG half) sits INSIDE h and OUTSIDE t: for a fixed (b, h)
        # the value/delta block index is constant across the (c, t) inner
        # loops, so the pipeline fetches each value block once per (b, h)
        grid=(Bv, Hc, cfg_dup, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, hpc, 1, n_img, occ.shape[-1]),
                lambda b, hh, c, t: (c * Bv + b, hh, t, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, hpc, lanes, tile_q),
                lambda b, hh, c, t: (c * Bv + b, hh, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hpc, n_img, L * P * 3),
                lambda b, hh, c, t: (b, hh, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ] + [
            pl.BlockSpec(
                (1, hpc, v.shape[2], D),
                lambda b, hh, c, t: (b, hh, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for v in level_vals
        ],
        # 3D output [B, Qp, H*D] with a (1, tile_q, hpc*D) block at lane
        # offset hh*hpc*D — each cell writes its head pair's 128-lane slice
        # of the FINAL layout directly (Mosaic needs the last two block
        # dims (8, 128)-divisible, which a [.., Hc, 128] 4D block isn't)
        out_specs=pl.BlockSpec(
            (1, tile_q, hpc * D),
            lambda b, hh, c, t: (c * Bv + b, t, hh),
            memory_space=pltpu.VMEM,
        ),
        # value dtype straight out of the f32 scratch accumulator — an f32
        # output pays double write + double transpose-read traffic
        out_shape=jax.ShapeDtypeStruct(
            (B, Qp, H * D), level_vals[0].dtype
        ),
        scratch_shapes=[pltpu.VMEM((tile_q, hpc * D), jnp.float32)],
        interpret=interpret,
    )(occ, slab, delta, *level_vals)
    return out[:, :Lq]
