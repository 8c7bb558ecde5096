"""Dense bilinear-matrix Pallas kernel for multi-scale deformable attention.

Fourth-generation formulation (replaces the separable one-hot v2/v3
experiments, see git history).  Per (batch, head, query-tile) the kernel
materialises, for each pyramid level, the full bilinear sampling matrix in
VMEM

    A[q, x*H + y] = sum_p  aw_p[q] * relu(1 - |x - xs_p[q]|)
                                   * relu(1 - |y - ys_p[q]|)

and contracts it with the level's value slab in ONE matmul ``A @ V[HW, D]``.
Compared with the per-point row/column matmul scheme (v1), this does P x
fewer MXU FLOPs and builds the weights with pure VPU arithmetic — no
one-hot compares on wide arrays, no `pltpu.roll`, no fold matmuls.  For
bf16 values the x-factor is lifted to the wide layout by one 0/1 MXU
matmul per point and the y-factor by a tile-repeat (x-major texel layout),
so the wide VPU work is ~3 ops per point; f32 values use an exact all-VPU
build.

ALL levels run inside ONE `pallas_call` (one grid cell does every level's
work for its query tile): with per-level calls the per-cell fixed overhead
across the 4-level pyramid dominated (~40% of kernel wall time at UNet
shapes).

`relu(1 - |x - xs|)` IS the bilinear hat function: at the two straddling
texels it evaluates to (1-lx, lx), elsewhere 0; out-of-grid texels get
weight 0 (or hit zero-padded value rows), matching the XLA oracle's
zeros-outside semantics (reference CUDA bilinear helper
ms_deform_im2col_cuda.cuh:36-87).

The backward is two transposed matmuls of the same structure plus the
hat-function derivative (sign on the support), replacing the reference's
six CUDA scatter/reduce variants (ms_deform_im2col_cuda.cuh:305-925):

    dA      = dOut @ V^T
    dV     += A^T @ dOut        (accumulated across query tiles through
                                 the sequential TPU grid — no atomics)
    d_aw_p  = sum_f (wx wy) . dA
    d_xs_p  = aw_p sum_f sign(x - xs_p) [wx>0] wy . dA   (same for y)

It is split into a grad_value kernel and a grad_loc/weight kernel so each
side's VMEM live set fits the 16 MB budget at the (64, 64)-level UNet
shapes; every matmul runs in natural MXU orientation via host-side
pre-transposed operands (in-kernel wide transposes measured 8-10x slower).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 16  # bf16 sublane multiple; also fine (coarser) for f32


def _padded_cols(h: int, w: int) -> Tuple[int, int]:
    """Smallest (W', H*W') with W' >= w and H*W' a lane multiple.

    x-major layout f = x*H + y: the y-expansion tile-repeat needs the
    padded texel count to stay a multiple of H."""
    import math

    step = _LANE // math.gcd(h, _LANE)
    wp = -(-w // step) * step
    return wp, h * wp


def _hat(t):
    return jnp.maximum(1.0 - jnp.abs(t), 0.0)


def _dot_precision(dtype):
    """f32 matmuls on the MXU default to a single bf16 pass (~3e-3 rel
    error); request the 6-pass decomposition for f32 parity.  bf16 inputs
    are exact on the MXU at default precision."""
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _expansion_matrix(h: int, wp: int) -> jax.Array:
    """0/1 matrix lifting x-weights to the x-major wide layout:
    ``E[x, f] = 1  iff  x == f // H`` (so ``wx @ E`` repeats each x-weight
    H times consecutively). bf16 — exact for 0/1."""
    hwp = h * wp
    rows = jax.lax.broadcasted_iota(jnp.int32, (wp, hwp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (wp, hwp), 1)
    return (cols // h == rows).astype(jnp.bfloat16)


def _build_A(slab, iox, ioy, h, wp, n_points):
    """Exact-f32 bilinear matrix [TQ, H*Wp] from the packed slab.

    slab: [TQ, P*3] f32, lanes p*3+{0: xs, 1: ys, 2: aw}
    iox:  [TQ, H*Wp] f32 — texel x coordinate (f // H)
    ioy:  [TQ, H]    f32 — texel y coordinate
    """
    A = None
    for p in range(n_points):
        xs = slab[:, 3 * p + 0 : 3 * p + 1]
        ys = slab[:, 3 * p + 1 : 3 * p + 2]
        aw = slab[:, 3 * p + 2 : 3 * p + 3]
        wy = _hat(ioy - ys) * aw  # [TQ, H]
        wyr = pltpu.repeat(wy, wp, 1)  # [TQ, H*Wp] (x-major tile)
        contrib = _hat(iox - xs) * wyr
        A = contrib if A is None else A + contrib
    return A


def _build_A_mxu(slab, e_mat, ioy, h, wp, n_points):
    """A-build with the x-factor expanded on the MXU instead of computed on
    wide VPU arrays: both hat factors evaluate on narrow [TQ, W]/[TQ, H]
    arrays (exact f32 coordinates), then ``wx @ E`` with the 0/1 expansion
    matrix ``E[x, x*H+y] = 1`` lifts the x-weights to the wide layout.
    ~3 wide VPU ops per point instead of ~6; the wx values round to bf16
    for the expansion matmul (~0.4% on the weights), so this path is used
    only when the value tensor is bf16 anyway."""
    tile_q = slab.shape[0]
    iox_s = jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, wp), 1).astype(jnp.float32)
    A = None
    for p in range(n_points):
        xs = slab[:, 3 * p + 0 : 3 * p + 1]
        ys = slab[:, 3 * p + 1 : 3 * p + 2]
        aw = slab[:, 3 * p + 2 : 3 * p + 3]
        wx = _hat(iox_s - xs)  # [TQ, Wp]
        wy = _hat(ioy - ys) * aw  # [TQ, H]
        wxe = jnp.dot(
            wx.astype(e_mat.dtype), e_mat,
            preferred_element_type=jnp.float32,
        )  # [TQ, H*Wp]
        contrib = wxe * pltpu.repeat(wy, wp, 1)
        A = contrib if A is None else A + contrib
    return A


def _level_A(slab_all, lid, level_shapes, n_points, tile_q, e_refs):
    """Build level `lid`'s A inside a fused kernel body."""
    h, w = level_shapes[lid]
    wp = _padded_cols(h, w)[0]
    P = n_points
    sl = slab_all[:, lid * P * 3 : (lid + 1) * P * 3]
    ioy = jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, h), 1).astype(jnp.float32)
    if e_refs is not None:
        return _build_A_mxu(sl, e_refs[lid][0, 0, :, :], ioy, h, wp, P)
    hwp = h * wp
    iox = (jax.lax.broadcasted_iota(jnp.int32, (tile_q, hwp), 1)
           // h).astype(jnp.float32)
    return _build_A(sl, iox, ioy, h, wp, P)


def _kernel_v4(slab_ref, *refs, level_shapes, n_points, head_dim,
               tile_q, mxu_expand):
    """Fused forward: all levels in one grid cell, one A @ V per level."""
    L = len(level_shapes)
    value_refs = refs[:L]
    e_refs = refs[L : 2 * L] if mxu_expand else None
    out_ref = refs[-1]
    slab_all = slab_ref[0, 0, :, :]

    acc = None
    for lid in range(L):
        value_mat = value_refs[lid][0, 0, :, :]  # [HWp, D]
        A = _level_A(slab_all, lid, level_shapes, n_points, tile_q, e_refs)
        contrib = jnp.dot(
            A.astype(value_mat.dtype), value_mat,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(value_mat.dtype),
        )
        acc = contrib if acc is None else acc + contrib
    out_ref[0, 0, :, :] = acc


def _kernel_v4_bwd_dv(slab_ref, doutt_ref, *refs,
                      level_shapes, n_points, head_dim, tile_q, mxu_expand):
    """grad_value kernel (fused over levels): rebuild each level's A, then
    one matmul per level per query tile.

    dV^T accumulates across query tiles through the sequential grid
    (t innermost) — the TPU replacement for the reference's atomicAdd
    scatter."""
    L = len(level_shapes)
    e_refs = refs[:L] if mxu_expand else None
    dvt_refs = refs[-L:]
    t_id = pl.program_id(2)
    slab_all = slab_ref[0, 0, :, :]
    doutt = doutt_ref[0, 0, :, :]  # [D, TQ]
    cdt = doutt.dtype
    prec = _dot_precision(cdt)

    for lid in range(L):
        A = _level_A(slab_all, lid, level_shapes, n_points, tile_q, e_refs)
        # dV^T += dOut^T @ A : [D, TQ] @ [TQ, HWp]
        dvt = jax.lax.dot_general(
            doutt, A.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        ref = dvt_refs[lid]

        @pl.when(t_id == 0)
        def _init(ref=ref, dvt=dvt):
            ref[0, 0, :, :] = dvt

        @pl.when(t_id > 0)
        def _accum(ref=ref, dvt=dvt):
            ref[0, 0, :, :] += dvt


def _kernel_v4_bwd_dslab(slab_ref, dout_ref, *refs,
                         level_shapes, n_points, head_dim, tile_q):
    """grad_{sampling_locations, attention_weights} kernel (fused over
    levels): per level dA = dOut V'^T once, then per-point hat-derivative
    contractions.

    Every per-point gradient is a separable contraction: both hat factors
    and their sign-derivatives depend on only one texel axis, so
    ``sum_f (a_small(x) expand) . g = row-dot(a_small, g @ E^T)`` — the
    wide reductions become two per-point matmuls onto narrow [TQ, Wp] /
    [TQ, H] arrays and a narrow lane-sum, instead of three full-width
    lane-reductions (the measured dslab bottleneck)."""
    L = len(level_shapes)
    P = n_points
    vt_refs = refs[:L]
    dslab_ref = refs[-1]
    slab_all = slab_ref[0, 0, :, :]
    d_out = dout_ref[0, 0, :, :]  # [TQ, D]

    for lid in range(L):
        h, w = level_shapes[lid]
        wp = _padded_cols(h, w)[0]
        hwp = h * wp
        vt = vt_refs[lid][0, 0, :, :]  # [D, HWp]
        cdt = vt.dtype
        slab = slab_all[:, lid * P * 3 : (lid + 1) * P * 3]

        iox_s = jax.lax.broadcasted_iota(
            jnp.int32, (tile_q, wp), 1).astype(jnp.float32)
        ioy = jax.lax.broadcasted_iota(
            jnp.int32, (tile_q, h), 1).astype(jnp.float32)
        # fold/expansion 0/1 matrices, built once per level via iota:
        #   E [Wp, HWp]: E[x, f] = (x == f // H)   (x-expansion)
        #   E^T [HWp, Wp]                          (fold over y)
        #   Ty [HWp, H]: Ty[f, y] = (y == f % H)   (fold over x)
        e_rows = jax.lax.broadcasted_iota(jnp.int32, (wp, hwp), 0)
        e_cols = jax.lax.broadcasted_iota(jnp.int32, (wp, hwp), 1)
        E = (e_cols // h == e_rows).astype(cdt)
        f_rows = jax.lax.broadcasted_iota(jnp.int32, (hwp, wp), 0)
        x_cols = jax.lax.broadcasted_iota(jnp.int32, (hwp, wp), 1)
        Et = (f_rows // h == x_cols).astype(cdt)
        fy_rows = jax.lax.broadcasted_iota(jnp.int32, (hwp, h), 0)
        y_cols = jax.lax.broadcasted_iota(jnp.int32, (hwp, h), 1)
        Ty = (fy_rows % h == y_cols).astype(cdt)

        # dA = dOut @ V'^T : [TQ, D] @ [D, HWp]
        prec = _dot_precision(cdt)
        dA = jax.lax.dot_general(
            d_out.astype(cdt), vt,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

        for p in range(P):
            xs = slab[:, 3 * p + 0 : 3 * p + 1]
            ys = slab[:, 3 * p + 1 : 3 * p + 2]
            aw = slab[:, 3 * p + 2 : 3 * p + 3]
            txs = iox_s - xs  # [TQ, Wp] narrow
            wx = _hat(txs)
            tys = ioy - ys  # [TQ, H] narrow
            wy = _hat(tys)

            # x-side grads: fold (wy expand).dA over y -> [TQ, Wp]
            g = pltpu.repeat(wy, wp, 1) * dA  # wide mul
            gE = jnp.dot(g.astype(cdt), Et,
                         preferred_element_type=jnp.float32,
                         precision=prec)  # [TQ, Wp]
            daw = jnp.sum(wx * gE, axis=1, keepdims=True)
            dwx = jnp.where(jnp.abs(txs) < 1.0, jnp.sign(txs), 0.0)
            dxs = aw * jnp.sum(dwx * gE, axis=1, keepdims=True)

            # y-side grad: fold (wx expand).dA over x -> [TQ, H]
            wxe = jnp.dot(wx.astype(cdt), E,
                          preferred_element_type=jnp.float32,
                          precision=prec)  # [TQ, HWp]
            hT = jnp.dot((wxe * dA).astype(cdt), Ty,
                         preferred_element_type=jnp.float32,
                         precision=prec)  # [TQ, H]
            dwy = jnp.where(jnp.abs(tys) < 1.0, jnp.sign(tys), 0.0)
            dys = aw * jnp.sum(dwy * hT, axis=1, keepdims=True)

            base = lid * P * 3 + 3 * p
            dslab_ref[0, 0, :, base + 0 : base + 1] = dxs
            dslab_ref[0, 0, :, base + 1 : base + 2] = dys
            dslab_ref[0, 0, :, base + 2 : base + 3] = daw


def _host_prep(value, level_shapes, sampling_locations, attention_weights,
               tile_q):
    """Fused packed slab [B, H, Qp, L*P*3] + per-level x-major value slabs
    [B, H, HWp_l, D]."""
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

        wp, hwp = _padded_cols(h_l, w_l)
        v = jax.lax.slice_in_dim(val, start, start + h_l * w_l, axis=2)
        # row-major [HW] -> x-major [H*Wp]: f = x*H + y
        v = v.reshape(B, H, h_l, w_l, D).transpose(0, 1, 3, 2, 4)
        if wp > w_l:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wp - w_l), (0, 0), (0, 0)))
        level_vals.append(v.reshape(B, H, hwp, D))
        start += h_l * w_l
    slab_all = jnp.concatenate(slab_parts, axis=-1)  # [B, H, Qp, L*P*3]
    return slab_all, level_vals, Qp


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


def _const_spec(s2, s3):
    return pl.BlockSpec(
        (1, 1, s2, s3),
        lambda b, hh, t: (0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )


@functools.partial(
    jax.jit, static_argnames=("level_shapes", "tile_q", "interpret")
)
def ms_deform_attn_pallas_v4(
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

    slab_all, level_vals, Qp = _host_prep(
        value, level_shapes, sampling_locations, attention_weights, tile_q
    )
    n_tiles = Qp // tile_q
    # MXU x-expansion needs bf16 weights anyway; keep the exact-f32 VPU
    # build when the value (and hence the A matmul) is f32
    mxu_expand = value.dtype == jnp.bfloat16

    extra, extra_specs = [], []
    if mxu_expand:
        for (h_l, w_l) in level_shapes:
            wp, hwp = _padded_cols(h_l, w_l)
            extra.append(_expansion_matrix(h_l, wp)[None, None])
            extra_specs.append(_const_spec(wp, hwp))

    out = pl.pallas_call(
        functools.partial(
            _kernel_v4, level_shapes=tuple(level_shapes), n_points=P,
            head_dim=D, tile_q=tile_q, mxu_expand=mxu_expand,
        ),
        grid=(B, H, n_tiles),
        in_specs=[_slab_spec(tile_q, L * P * 3)] + [
            _stationary_spec(v.shape[2], D) for v in level_vals
        ] + extra_specs,
        out_specs=_slab_spec(tile_q, D),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), jnp.float32),
        interpret=interpret,
    )(slab_all, *level_vals, *extra)
    out = out[:, :, :Q].transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D).astype(value.dtype)


@functools.partial(
    jax.jit, static_argnames=("level_shapes", "tile_q", "interpret")
)
def _ms_deform_attn_pallas_v4_bwd(
    value, level_shapes, sampling_locations, attention_weights, d_out,
    tile_q: int = 128, interpret: bool = False,
):
    B, S, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(level_shapes)
    P = sampling_locations.shape[4]
    slab_all, level_vals, Qp = _host_prep(
        value, level_shapes, sampling_locations, attention_weights, tile_q
    )
    n_tiles = Qp // tile_q

    dout = d_out.reshape(B, Q, H, D).astype(jnp.float32)
    dout = jnp.pad(dout, ((0, 0), (0, Qp - Q), (0, 0), (0, 0)))
    dout = dout.transpose(0, 2, 1, 3)  # [B, H, Qp, D]
    # pre-transposed [B, H, D, Qp] in the value dtype (bf16 keeps the MXU on
    # its exact single-pass path; accumulation stays f32)
    doutt = dout.transpose(0, 1, 3, 2).astype(value.dtype)

    mxu_expand = value.dtype == jnp.bfloat16
    extra, extra_specs = [], []
    if mxu_expand:
        for (h_l, w_l) in level_shapes:
            wp, hwp = _padded_cols(h_l, w_l)
            extra.append(_expansion_matrix(h_l, wp)[None, None])
            extra_specs.append(_const_spec(wp, hwp))

    # ---- grad_value -------------------------------------------------- #
    dvt_list = pl.pallas_call(
        functools.partial(
            _kernel_v4_bwd_dv, level_shapes=tuple(level_shapes),
            n_points=P, head_dim=D, tile_q=tile_q, mxu_expand=mxu_expand,
        ),
        grid=(B, H, n_tiles),
        in_specs=[
            _slab_spec(tile_q, L * P * 3),
            pl.BlockSpec(
                (1, 1, D, tile_q),
                lambda b, hh, t: (b, hh, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ] + extra_specs,
        out_specs=[
            _stationary_spec(D, v.shape[2]) for v in level_vals
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D, v.shape[2]), jnp.float32)
            for v in level_vals
        ],
        interpret=interpret,
    )(slab_all, doutt, *extra)

    # ---- grad_{loc, weights} ----------------------------------------- #
    vts = [v.transpose(0, 1, 3, 2) for v in level_vals]  # [B, H, D, HWp]
    # the dslab kernel keeps dA + two wide products + three fold matrices
    # live per level — halve its tile at wide pyramids to stay inside VMEM
    # (Qp is a tile_q multiple, so any divisor of tile_q keeps the grid even)
    hwp_max = max(v.shape[2] for v in level_vals)
    tq2 = tile_q if hwp_max <= 2048 else max(32, tile_q // 2)
    dslab = pl.pallas_call(
        functools.partial(
            _kernel_v4_bwd_dslab, level_shapes=tuple(level_shapes),
            n_points=P, head_dim=D, tile_q=tq2,
        ),
        grid=(B, H, Qp // tq2),
        in_specs=[
            _slab_spec(tq2, L * P * 3),
            _slab_spec(tq2, D),
        ] + [_stationary_spec(D, v.shape[2]) for v in level_vals],
        out_specs=_slab_spec(tq2, L * P * 3),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, L * P * 3), jnp.float32),
        interpret=interpret,
    )(slab_all, dout, *vts)

    # d_value: per-level [D, H*Wp] x-major -> row-major [HW, D]
    dv_parts = []
    for (h_l, w_l), dvt in zip(level_shapes, dvt_list):
        wp = dvt.shape[3] // h_l
        dv = dvt.reshape(B, H, D, wp, h_l)[:, :, :, :w_l]
        dv = dv.transpose(0, 1, 4, 3, 2).reshape(B, H, h_l * w_l, D)
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
def ms_deform_attn_pallas_v4_trainable(
    value, level_shapes, sampling_locations, attention_weights,
    tile_q: int = 128, interpret: bool = False,
):
    """Differentiable deformable attention: v4 Pallas forward + Pallas
    backward (grads w.r.t. value, sampling_locations, attention_weights)."""
    return ms_deform_attn_pallas_v4(
        value, level_shapes, sampling_locations, attention_weights,
        tile_q=tile_q, interpret=interpret,
    )


def _v4_fwd(value, level_shapes, sampling_locations, attention_weights,
            tile_q, interpret):
    out = ms_deform_attn_pallas_v4(
        value, level_shapes, sampling_locations, attention_weights,
        tile_q=tile_q, interpret=interpret,
    )
    return out, (value, sampling_locations, attention_weights)


def _v4_bwd(level_shapes, tile_q, interpret, res, d_out):
    value, loc, wts = res
    return _ms_deform_attn_pallas_v4_bwd(
        value, level_shapes, loc, wts, d_out,
        tile_q=tile_q, interpret=interpret,
    )


ms_deform_attn_pallas_v4_trainable.defvjp(_v4_fwd, _v4_bwd)
