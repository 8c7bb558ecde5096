"""Occupancy-gated chunked Pallas kernel for multi-scale deformable attention.

Fifth-generation formulation, superseding the dense v4 kernel
(`ms_deform_attn_pallas_v4.py`) on the training and prefill paths.  Two
observations drive it:

1. **Bilinear hat weights are 2-sparse per axis.**  For every sampling
   point only the two texel rows straddling ``ys`` carry weight, yet v4
   contracts the full ``[TQ, H*Wp]`` bilinear matrix against every value
   row.  In the real workloads the sampling rows of one 128-query tile
   cluster tightly: UNet-side MMFS queries are latent-grid points with
   grid-local reference points (reference `sd_mmfs.py:120-130`), so 128
   consecutive row-major queries span ~2 latent rows; LLM-side MMFS
   queries all share the fixed ``(0.5, 0.5)`` reference
   (reference `mmfs.py:166-171`) plus a few texels of learned offset.

2. **Row-chunk occupancy is decidable on the host for free.**  With the
   value slab kept in natural row-major order (``f = y*Wp + x``) and split
   into row chunks, a chunk can only receive weight from point ``p`` of a
   query tile if ``ys`` lands inside ``(chunk_lo - 1, chunk_hi)`` — a pure
   comparison on the (narrow) sampling slab.  The host packs these tests
   into per-``(batch, head, tile)`` bit words; the kernel reads them from
   SMEM and wraps each chunk's A-build + matmul in ``pl.when``.  Skipping
   is *exact*: an unoccupied chunk's bilinear matrix is identically zero.

Per (batch, head, query-tile) grid cell and pyramid level the kernel
builds, for each *occupied* row chunk, the bilinear sampling matrix

    A[q, y*Wp + x] = sum_p  aw_p[q] * relu(1 - |y - ys_p[q]|)
                                    * relu(1 - |x - xs_p[q]|)

directly on the ``[TQ, hc*Wp]`` chunk array with iota-derived texel
coordinates (~6 VPU ops per point — at 256-lane chunk width this beats
v4's MXU 0/1-expansion scheme, whose K=8 lifting matmuls cost a full
systolic pass each while filling 6% of the array) and contracts it with
the chunk's value rows in one matmul.

The backward keeps v4's split (grad_value kernel; grad_loc/weight kernel
with separable folds) but gates every chunk by the same occupancy words,
so the ~P x 3 matmuls per point shrink to the occupied row range.  This
replaces the reference's six CUDA scatter/reduce backward variants
(`ms_deform_im2col_cuda.cuh:305-925`), whose 4-texel gather cost the
dense formulation could not previously match.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ms_deform_attn_pallas_v4 import _padded_cols

_LANE = 128
# target texels per row chunk: big enough to keep the MXU K-dim efficient,
# small enough that a ~5-row occupied band spans only 1-2 chunks
_CHUNK_TEXELS = 256
# bits used per occupancy word (31 keeps int32 shifts sign-free)
_WORD_BITS = 31


def _hat(t):
    return jnp.maximum(1.0 - jnp.abs(t), 0.0)


def _dot_precision(dtype):
    """f32 matmuls request the 6-pass decomposition (the 0/1 expansion and
    fold contractions are then exact); bf16 uses the single fast pass."""
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


@dataclasses.dataclass(frozen=True)
class _LevelMeta:
    h: int
    w: int
    wp: int  # padded width (h*wp is a lane multiple)
    hc: int  # rows per chunk
    G: int  # number of row chunks (== h // hc)

    @property
    def hwp(self) -> int:
        return self.h * self.wp

    @property
    def chunk(self) -> int:
        return self.hc * self.wp


def _level_meta(h: int, w: int) -> _LevelMeta:
    wp = _padded_cols(h, w)[0]
    best = 1
    for G in range(2, h + 1):
        if h % G:
            continue
        hc = h // G
        if (hc * wp) % _LANE or hc * wp < _CHUNK_TEXELS:
            continue
        best = G
    return _LevelMeta(h, w, wp, h // best, best)


def _metas(level_shapes) -> Tuple[_LevelMeta, ...]:
    return tuple(_level_meta(h, w) for (h, w) in level_shapes)


def _n_words(metas) -> int:
    total = sum(m.G for m in metas)
    return -(-total // _WORD_BITS)


def _host_prep(value, level_shapes, sampling_locations, attention_weights,
               tile_q):
    """Packed slab [B, H, Qp, L*P*3] (lanes p*3+{xs, ys, aw} per level) +
    per-level ROW-MAJOR value slabs [B, H, h*Wp, D] (width zero-padded)."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    P = sampling_locations.shape[4]
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

    val = value.transpose(0, 2, 1, 3)  # [B, H, S, D]
    slab_parts, level_vals, start = [], [], 0
    for lid, (h_l, w_l) in enumerate(level_shapes):
        xs = loc[:, :, :, lid, :, 0] * w_l - 0.5  # [B, H, Qp, P]
        ys = loc[:, :, :, lid, :, 1] * h_l - 0.5
        aw = wts[:, :, :, lid, :]
        slab = jnp.stack([xs, ys, aw], axis=-1)  # [B, H, Qp, P, 3]
        slab_parts.append(slab.reshape(B, H, Qp, P * 3))

        m = _level_meta(h_l, w_l)
        v = jax.lax.slice_in_dim(val, start, start + h_l * w_l, axis=2)
        v = v.reshape(B, H, h_l, w_l, D)
        if m.wp > w_l:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, m.wp - w_l), (0, 0)))
        level_vals.append(v.reshape(B, H, m.hwp, D))
        start += h_l * w_l
    slab_all = jnp.concatenate(slab_parts, axis=-1)  # [B, H, Qp, L*P*3]
    return slab_all, level_vals, Qp


def _occupancy_words(slab_all, metas, n_points, tile_q):
    """[B, H, n_tiles, n_words] int32: bit ``b`` of the packed word stream is
    1 iff row chunk ``b`` (levels concatenated) can receive any weight from
    the tile — i.e. some point with ``aw != 0`` has ``ys`` inside the open
    hat-support window ``(chunk_lo - 1, chunk_hi)``."""
    B, H, Qp, _ = slab_all.shape
    T = Qp // tile_q
    s = slab_all.reshape(B, H, T, tile_q, -1)
    P = n_points
    words, cur, nb = [], jnp.zeros((B, H, T), jnp.int32), 0
    for lid, m in enumerate(metas):
        base = lid * P * 3
        ys = s[..., base + 1 : base + P * 3 : 3]  # [B, H, T, TQ, P]
        aw = s[..., base + 2 : base + P * 3 : 3]
        active = aw != 0.0
        for g in range(m.G):
            lo, hi = g * m.hc, (g + 1) * m.hc
            occ = ((ys > lo - 1.0) & (ys < float(hi)) & active).any(
                axis=(3, 4)
            )
            cur = cur | (occ.astype(jnp.int32) << nb)
            nb += 1
            if nb == _WORD_BITS:
                words.append(cur)
                cur = jnp.zeros((B, H, T), jnp.int32)
                nb = 0
    if nb:
        words.append(cur)
    return jnp.stack(words, axis=-1)


def _fold_x(chunk: int, wp: int, dtype) -> jax.Array:
    """[chunk, Wp] 0/1 fold: sums a row-major chunk over its rows per x
    column (``Tx[f, x] = (f % Wp == x)``)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, wp), 1)
    return (rows % wp == cols).astype(dtype)


def _fold_y(chunk: int, hc: int, wp: int, dtype) -> jax.Array:
    """[chunk, hc] 0/1 fold: sums a row-major chunk over x per local row
    (``Ty[f, y] = (f // Wp == y)``)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, hc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, hc), 1)
    return (rows // wp == cols).astype(dtype)


def _point_slab(slab_all, lid, p, n_points):
    j = (lid * n_points + p) * 3
    return (slab_all[:, j : j + 1], slab_all[:, j + 1 : j + 2],
            slab_all[:, j + 2 : j + 3])


def _chunk_bit(occ_ref, bit):
    """occ_ref holds the full [T, n_words] plane of the current (b, h) in
    SMEM (Mosaic requires whole trailing dims for SMEM blocks); the tile
    index is dynamic."""
    w_i, b_i = divmod(bit, _WORD_BITS)
    t = pl.program_id(2)
    return ((occ_ref[0, 0, t, w_i] >> b_i) & 1) == 1


def _chunk_coords(m, g, tile_q):
    """Wide texel coordinates of row chunk ``g``: x = f % Wp, y = f // Wp
    (+ chunk offset), both [TQ, hc*Wp] f32."""
    f = jax.lax.broadcasted_iota(jnp.int32, (tile_q, m.chunk), 1)
    iox = (f % m.wp).astype(jnp.float32)
    ioy = (f // m.wp).astype(jnp.float32) + float(g * m.hc)
    return iox, ioy


def _build_A_chunk(slab_all, lid, g, m, n_points, tile_q):
    """Bilinear matrix of one occupied row chunk, [TQ, hc*Wp] f32 exact."""
    iox, ioy = _chunk_coords(m, g, tile_q)
    A = None
    for p in range(n_points):
        xs, ys, aw = _point_slab(slab_all, lid, p, n_points)
        contrib = _hat(iox - xs) * (_hat(ioy - ys) * aw)
        A = contrib if A is None else A + contrib
    return A


def _kernel_v5(occ_ref, slab_ref, *refs, metas, n_points, tile_q):
    """Forward: per level, one gated A @ V matmul per occupied row chunk."""
    L = len(metas)
    value_refs = refs[:L]
    out_ref = refs[-1]
    slab_all = slab_ref[0, 0, :, :]
    D = value_refs[0].shape[3]
    out_ref[0, 0, :, :] = jnp.zeros((tile_q, D), jnp.float32)

    bit = 0
    for lid, m in enumerate(metas):
        vref = value_refs[lid]
        cdt = vref.dtype
        prec = _dot_precision(cdt)
        for g in range(m.G):
            @pl.when(_chunk_bit(occ_ref, bit))
            def _(g=g, lid=lid, m=m, vref=vref, prec=prec, cdt=cdt):
                A = _build_A_chunk(slab_all, lid, g, m, n_points, tile_q)
                rows = vref[0, 0, g * m.chunk : (g + 1) * m.chunk, :]
                out_ref[0, 0, :, :] += jnp.dot(
                    A.astype(cdt), rows,
                    preferred_element_type=jnp.float32, precision=prec,
                )

            bit += 1


def _kernel_v5_bwd_dv(occ_ref, slab_ref, doutt_ref, *dvt_refs,
                      metas, n_points, tile_q):
    """grad_value: dV^T[chunk] += dOut^T @ A_chunk for occupied chunks;
    accumulation across query tiles rides the sequential grid (t innermost)
    — the TPU replacement for the reference's atomicAdd scatter."""
    t_id = pl.program_id(2)
    slab_all = slab_ref[0, 0, :, :]
    doutt = doutt_ref[0, 0, :, :]  # [D, TQ], value dtype

    @pl.when(t_id == 0)
    def _init():
        for r in dvt_refs:
            r[0, 0, :, :] = jnp.zeros(r.shape[2:], jnp.float32)

    bit = 0
    for lid, m in enumerate(metas):
        mdt = doutt.dtype
        prec = _dot_precision(mdt)
        for g in range(m.G):
            @pl.when(_chunk_bit(occ_ref, bit))
            def _(g=g, lid=lid, m=m, prec=prec, mdt=mdt):
                A = _build_A_chunk(slab_all, lid, g, m, n_points, tile_q)
                # [D, TQ] @ [TQ, chunk]
                dvt = jax.lax.dot_general(
                    doutt, A.astype(mdt), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dvt_refs[lid][0, 0, :, g * m.chunk : (g + 1) * m.chunk] += dvt

            bit += 1


def _kernel_v5_bwd_dslab(occ_ref, slab_ref, dout_ref, *refs,
                         metas, n_points, tile_q):
    """grad_{sampling_locations, attention_weights}: per occupied chunk
    compute dA = dOut @ V'^T[:, chunk] once, then fold it against the
    separable hat factors.  Per point the x-marginal ``gX = sum_y wy . dA``
    accumulates across chunks in a VMEM scratch (it feeds both daw and dxs);
    the y-derivative needs only a per-chunk scalar per query."""
    L = len(metas)
    P = n_points
    vt_refs = refs[:L]
    dslab_ref = refs[L]  # output precedes scratch in the ref order
    gx_ref, dy_ref = refs[L + 1], refs[L + 2]
    slab_all = slab_ref[0, 0, :, :]
    d_out = dout_ref[0, 0, :, :]  # [TQ, D] f32

    bit = 0
    for lid, m in enumerate(metas):
        vt = vt_refs[lid]
        cdt = vt.dtype
        prec = _dot_precision(cdt)
        tx = _fold_x(m.chunk, m.wp, cdt)
        ty = _fold_y(m.chunk, m.hc, m.wp, cdt)
        gx_ref[:, :] = jnp.zeros(gx_ref.shape, jnp.float32)
        dy_ref[:, :] = jnp.zeros(dy_ref.shape, jnp.float32)
        iox = jax.lax.broadcasted_iota(
            jnp.int32, (tile_q, m.wp), 1).astype(jnp.float32)

        for g in range(m.G):
            @pl.when(_chunk_bit(occ_ref, bit))
            def _(g=g, lid=lid, m=m, tx=tx, ty=ty, prec=prec, cdt=cdt):
                iox_w, ioy_w = _chunk_coords(m, g, tile_q)
                ioy = jax.lax.broadcasted_iota(
                    jnp.int32, (tile_q, m.hc), 1
                ).astype(jnp.float32) + float(g * m.hc)
                # dA = dOut @ V'^T[:, chunk] : [TQ, D] @ [D, chunk]
                dA = jnp.dot(
                    d_out.astype(cdt),
                    vt[0, 0, :, g * m.chunk : (g + 1) * m.chunk],
                    preferred_element_type=jnp.float32, precision=prec,
                )
                for p in range(P):
                    xs, ys, aw = _point_slab(slab_all, lid, p, P)
                    # x-marginal: fold (wy . dA) over rows -> [TQ, Wp]
                    wyw = _hat(ioy_w - ys)  # wide y-hat on the chunk
                    gx_ref[:, p * m.wp : (p + 1) * m.wp] += jnp.dot(
                        (wyw * dA).astype(cdt), tx,
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    # y-derivative: fold (aw wx . dA) over x -> [TQ, hc]
                    awxw = _hat(iox_w - xs) * aw
                    hy = jnp.dot(
                        (awxw * dA).astype(cdt), ty,
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    tys = ioy - ys
                    dwy = jnp.where(jnp.abs(tys) < 1.0, jnp.sign(tys), 0.0)
                    dy_ref[:, p : p + 1] += jnp.sum(
                        dwy * hy, axis=1, keepdims=True
                    )

            bit += 1

        # finish the level from the accumulated marginals (unconditional:
        # zero marginals yield zero gradients for fully-skipped levels)
        for p in range(P):
            xs, ys, aw = _point_slab(slab_all, lid, p, P)
            gX = gx_ref[:, p * m.wp : (p + 1) * m.wp]
            wx = _hat(iox - xs)
            txs = iox - xs
            dwx = jnp.where(jnp.abs(txs) < 1.0, jnp.sign(txs), 0.0)
            base = (lid * P + p) * 3
            dslab_ref[0, 0, :, base + 0 : base + 1] = aw * jnp.sum(
                dwx * gX, axis=1, keepdims=True
            )
            dslab_ref[0, 0, :, base + 1 : base + 2] = dy_ref[:, p : p + 1]
            dslab_ref[0, 0, :, base + 2 : base + 3] = jnp.sum(
                wx * gX, axis=1, keepdims=True
            )


def _occ_spec(n_tiles, n_words):
    return pl.BlockSpec(
        (1, 1, n_tiles, n_words),
        lambda b, hh, t: (b, hh, 0, 0),
        memory_space=pltpu.SMEM,
    )


def _slab_spec(tile_q, lanes):
    return pl.BlockSpec(
        (1, 1, tile_q, lanes),
        lambda b, hh, t: (b, hh, t, 0),
        memory_space=pltpu.VMEM,
    )


def _stationary_spec(s2, s3):
    return pl.BlockSpec(
        (1, 1, s2, s3),
        lambda b, hh, t: (b, hh, 0, 0),
        memory_space=pltpu.VMEM,
    )


@functools.partial(
    jax.jit, static_argnames=("level_shapes", "tile_q", "interpret")
)
def ms_deform_attn_pallas_v5(
    value: jax.Array,  # [B, S, H, D]
    level_shapes: Tuple[Tuple[int, int], ...],
    sampling_locations: jax.Array,  # [B, Q, H, L, P, 2]
    attention_weights: jax.Array,  # [B, Q, H, L, P]
    tile_q: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Same contract as `ops.ms_deform_attn` (XLA oracle); returns
    [B, Q, H*D] in value's dtype."""
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(level_shapes)
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in level_shapes) == S

    metas = _metas(level_shapes)
    slab_all, level_vals, Qp = _host_prep(
        value, level_shapes, sampling_locations, attention_weights, tile_q
    )
    occ = _occupancy_words(slab_all, metas, P, tile_q)
    n_tiles = Qp // tile_q

    out = pl.pallas_call(
        functools.partial(
            _kernel_v5, metas=metas, n_points=P, tile_q=tile_q,
        ),
        grid=(B, H, n_tiles),
        in_specs=[_occ_spec(n_tiles, occ.shape[-1]),
                  _slab_spec(tile_q, L * P * 3)]
        + [_stationary_spec(v.shape[2], D) for v in level_vals],
        out_specs=_slab_spec(tile_q, D),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), jnp.float32),
        interpret=interpret,
    )(occ, slab_all, *level_vals)
    out = out[:, :, :Q].transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D).astype(value.dtype)


@functools.partial(
    jax.jit, static_argnames=("level_shapes", "tile_q", "interpret")
)
def _ms_deform_attn_pallas_v5_bwd(
    value, level_shapes, sampling_locations, attention_weights, d_out,
    tile_q: int = 128, interpret: bool = False,
):
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(level_shapes)
    P = sampling_locations.shape[4]
    metas = _metas(level_shapes)
    slab_all, level_vals, Qp = _host_prep(
        value, level_shapes, sampling_locations, attention_weights, tile_q
    )
    occ = _occupancy_words(slab_all, metas, P, tile_q)
    n_tiles = Qp // tile_q

    dout = d_out.reshape(B, Q, H, D).astype(jnp.float32)
    dout = jnp.pad(dout, ((0, 0), (0, Qp - Q), (0, 0), (0, 0)))
    dout = dout.transpose(0, 2, 1, 3)  # [B, H, Qp, D]
    # pre-transposed [B, H, D, Qp] in the value dtype (bf16 keeps the MXU on
    # its fast single-pass path; accumulation stays f32)
    doutt = dout.transpose(0, 1, 3, 2).astype(value.dtype)

    # ---- grad_value -------------------------------------------------- #
    dvt_list = pl.pallas_call(
        functools.partial(
            _kernel_v5_bwd_dv, metas=metas, n_points=P, tile_q=tile_q,
        ),
        grid=(B, H, n_tiles),
        in_specs=[
            _occ_spec(n_tiles, occ.shape[-1]),
            _slab_spec(tile_q, L * P * 3),
            pl.BlockSpec(
                (1, 1, D, tile_q),
                lambda b, hh, t: (b, hh, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[_stationary_spec(D, v.shape[2]) for v in level_vals],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D, v.shape[2]), jnp.float32)
            for v in level_vals
        ],
        interpret=interpret,
    )(occ, slab_all, doutt)

    # ---- grad_{loc, weights} ----------------------------------------- #
    vts = [v.transpose(0, 1, 3, 2) for v in level_vals]  # [B, H, D, hwp]
    wp_max = max(m.wp for m in metas)
    dslab = pl.pallas_call(
        functools.partial(
            _kernel_v5_bwd_dslab, metas=metas, n_points=P, tile_q=tile_q,
        ),
        grid=(B, H, n_tiles),
        in_specs=[
            _occ_spec(n_tiles, occ.shape[-1]),
            _slab_spec(tile_q, L * P * 3),
            _slab_spec(tile_q, D),
        ] + [_stationary_spec(D, v.shape[2]) for v in level_vals],
        out_specs=_slab_spec(tile_q, L * P * 3),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, L * P * 3), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, P * wp_max), jnp.float32),
            pltpu.VMEM((tile_q, max(P, 8)), jnp.float32),
        ],
        interpret=interpret,
    )(occ, slab_all, dout, *vts)

    # d_value: per-level [D, h*Wp] row-major -> [HW, D]
    dv_parts = []
    for m, dvt in zip(metas, dvt_list):
        dv = dvt.reshape(B, H, D, m.h, m.wp)[:, :, :, :, : m.w]
        dv = dv.transpose(0, 1, 3, 4, 2).reshape(B, H, m.h * m.w, D)
        dv_parts.append(dv)
    d_value = jnp.concatenate(dv_parts, axis=2).transpose(0, 2, 1, 3)
    d_value = d_value.astype(value.dtype)

    ds = dslab.reshape(B, H, Qp, L, P, 3)
    ds = ds[:, :, :Q].transpose(0, 2, 1, 3, 4, 5)  # [B, Q, H, L, P, 3]
    d_aw = ds[..., 2].astype(attention_weights.dtype)
    # xs = loc_x * W - 0.5  =>  d loc_x = d_xs * W (same for y)
    w_arr = jnp.asarray([w for _, w in level_shapes], jnp.float32)
    h_arr = jnp.asarray([h for h, _ in level_shapes], jnp.float32)
    d_loc = jnp.stack([
        ds[..., 0] * w_arr[None, None, None, :, None],
        ds[..., 1] * h_arr[None, None, None, :, None],
    ], axis=-1).astype(sampling_locations.dtype)
    return d_value, d_loc, d_aw


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def ms_deform_attn_pallas_v5_trainable(
    value, level_shapes, sampling_locations, attention_weights,
    tile_q: int = 128, interpret: bool = False,
):
    """Differentiable deformable attention: occupancy-gated v5 Pallas
    forward + Pallas backward (grads w.r.t. value, sampling_locations,
    attention_weights)."""
    return ms_deform_attn_pallas_v5(
        value, level_shapes, sampling_locations, attention_weights,
        tile_q=tile_q, interpret=interpret,
    )


def _v5_fwd(value, level_shapes, sampling_locations, attention_weights,
            tile_q, interpret):
    out = ms_deform_attn_pallas_v5(
        value, level_shapes, sampling_locations, attention_weights,
        tile_q=tile_q, interpret=interpret,
    )
    return out, (value, sampling_locations, attention_weights)


def _v5_bwd(level_shapes, tile_q, interpret, res, d_out):
    value, loc, wts = res
    return _ms_deform_attn_pallas_v5_bwd(
        value, level_shapes, loc, wts, d_out,
        tile_q=tile_q, interpret=interpret,
    )


ms_deform_attn_pallas_v5_trainable.defvjp(_v5_fwd, _v5_bwd)
