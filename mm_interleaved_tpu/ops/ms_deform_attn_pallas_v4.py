"""Dense bilinear-matrix Pallas kernel for multi-scale deformable attention.

Fourth-generation formulation (replaces the separable one-hot v2/v3
experiments, see git history).  Per (batch, head, query-tile, level) the
kernel materialises the full bilinear sampling matrix in VMEM

    A[q, x*H + y] = sum_p  aw_p[q] * relu(1 - |x - xs_p[q]|)
                                   * relu(1 - |y - ys_p[q]|)

and contracts it with the level's value slab in ONE matmul ``A @ V[HW, D]``.
Compared with the per-point row/column matmul scheme (v1), this does P x
fewer MXU FLOPs and builds the weights with pure VPU arithmetic - no
one-hot compares on wide arrays, no `pltpu.roll`, no expansion/fold
matmuls.  The y-factor is built on the narrow ``[TILE_Q, H]`` array and
expanded for free with a tile-repeat (x-major texel layout), so the wide
work is ~6 VPU ops per point.

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
                                 the sequential TPU grid - no atomics)
    d_aw_p  = sum_f (wx wy) . dA
    d_xs_p  = aw_p sum_f sign(x - xs_p) [wx>0] wy . dA   (same for y)

Both directions are launched once per level; XLA sums the per-level
partial outputs ([B, H, Qp, D] adds - noise).
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


def _build_A(slab, iox, ioy, h, wp, n_points, aw_scale=None):
    """Bilinear matrix [TQ, H*Wp] from the packed slab.

    slab: [TQ, P*3] f32, lanes p*3+{0: xs, 1: ys, 2: aw}
    iox:  [TQ, H*Wp] f32 - texel x coordinate (f // H)
    ioy:  [TQ, H]    f32 - texel y coordinate
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


def _kernel_v4(slab_ref, v_ref, *refs, h, w, n_points, head_dim,
               tile_q, mxu_expand):
    out_ref = refs[-1]
    hwp = v_ref.shape[2]
    wp = hwp // h
    value_mat = v_ref[0, 0, :, :]  # [HWp, D]

    ioy = jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, h), 1).astype(jnp.float32)

    if mxu_expand:
        e_mat = refs[0][0, 0, :, :]  # [Wp, HWp] 0/1 expansion
        A = _build_A_mxu(slab_ref[0, 0, :, :], e_mat, ioy, h, wp, n_points)
    else:
        iox = (jax.lax.broadcasted_iota(jnp.int32, (tile_q, hwp), 1)
               // h).astype(jnp.float32)
        A = _build_A(slab_ref[0, 0, :, :], iox, ioy, h, wp, n_points)
    out_ref[0, 0, :, :] = jnp.dot(
        A.astype(value_mat.dtype), value_mat,
        preferred_element_type=jnp.float32,
        precision=_dot_precision(value_mat.dtype),
    )


def _kernel_v4_bwd_dv(slab_ref, doutt_ref, *refs,
                      h, w, n_points, head_dim, tile_q, mxu_expand):
    """grad_value kernel: rebuild A, then one matmul per query tile.

    All matmuls stay in natural MXU orientation — the host supplies dOut
    pre-transposed ([D, TQ]) and receives dV transposed ([D, HWp]);
    in-kernel transposes of wide arrays cost 8-10x (measured).
    dV^T accumulates across query tiles through the sequential grid
    (t innermost) — the TPU replacement for the reference's atomicAdd
    scatter.  Split from the dslab kernel so each side's VMEM live set
    fits the 16 MB budget at the (64, 64)-level UNet shapes."""
    dvt_ref = refs[-1]
    hwp = dvt_ref.shape[3]
    wp = hwp // h
    t_id = pl.program_id(2)
    slab = slab_ref[0, 0, :, :]

    ioy = jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, h), 1).astype(jnp.float32)

    doutt = doutt_ref[0, 0, :, :]  # [D, TQ]
    cdt = doutt.dtype
    if mxu_expand:
        e_mat = refs[0][0, 0, :, :]
        A = _build_A_mxu(slab, e_mat, ioy, h, wp, n_points)
    else:
        iox = (jax.lax.broadcasted_iota(jnp.int32, (tile_q, hwp), 1)
               // h).astype(jnp.float32)
        A = _build_A(slab, iox, ioy, h, wp, n_points)
    # dV^T += dOut^T @ A : [D, TQ] @ [TQ, HWp]
    dvt = jax.lax.dot_general(
        doutt, A.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(cdt),
    )

    @pl.when(t_id == 0)
    def _init():
        dvt_ref[0, 0, :, :] = dvt

    @pl.when(t_id > 0)
    def _accum():
        dvt_ref[0, 0, :, :] += dvt


def _kernel_v4_bwd_dslab(slab_ref, vt_ref, dout_ref, dslab_ref, *,
                         h, w, n_points, head_dim, tile_q):
    """grad_{sampling_locations, attention_weights} kernel: dA = dOut V'^T
    once, then per-point hat-derivative contractions."""
    hwp = vt_ref.shape[3]
    wp = hwp // h
    vt = vt_ref[0, 0, :, :]  # [D, HWp]
    slab = slab_ref[0, 0, :, :]

    iox = (jax.lax.broadcasted_iota(jnp.int32, (tile_q, hwp), 1)
           // h).astype(jnp.float32)
    ioy = jax.lax.broadcasted_iota(
        jnp.int32, (tile_q, h), 1).astype(jnp.float32)

    cdt = vt.dtype
    d_out = dout_ref[0, 0, :, :]  # [TQ, D]
    # dA = dOut @ V'^T : [TQ, D] @ [D, HWp]
    dA = jax.lax.dot_general(
        d_out.astype(cdt), vt,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(cdt),
    )

    for p in range(n_points):
        xs = slab[:, 3 * p + 0 : 3 * p + 1]
        ys = slab[:, 3 * p + 1 : 3 * p + 2]
        aw = slab[:, 3 * p + 2 : 3 * p + 3]
        tx = iox - xs  # [TQ, HWp]
        wx = _hat(tx)
        wy = _hat(ioy - ys)  # [TQ, H]
        wyr = pltpu.repeat(wy, wp, 1)
        daw = jnp.sum(wx * wyr * dA, axis=1, keepdims=True)
        # d/dxs hat(x - xs) = sign(x - xs) on the open support
        dwx = jnp.where(jnp.abs(tx) < 1.0, jnp.sign(tx), 0.0)
        dxs = aw * jnp.sum(dwx * wyr * dA, axis=1, keepdims=True)
        # y-factor derivative: expand sign term, multiply by wx
        ty = ioy - ys
        dwy = jnp.where(jnp.abs(ty) < 1.0, jnp.sign(ty), 0.0)
        dys = aw * jnp.sum(
            wx * pltpu.repeat(dwy, wp, 1) * dA, axis=1, keepdims=True
        )
        dslab_ref[0, 0, :, 3 * p + 0 : 3 * p + 1] = dxs
        dslab_ref[0, 0, :, 3 * p + 1 : 3 * p + 2] = dys
        dslab_ref[0, 0, :, 3 * p + 2 : 3 * p + 3] = daw


def _expansion_matrix(h: int, wp: int) -> jax.Array:
    """0/1 matrix lifting x-weights to the x-major wide layout:
    ``E[x, f] = 1  iff  x == f // H`` (so ``wx @ E`` repeats each x-weight
    H times consecutively). bf16 — exact for 0/1."""
    hwp = h * wp
    rows = jax.lax.broadcasted_iota(jnp.int32, (wp, hwp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (wp, hwp), 1)
    return (cols // h == rows).astype(jnp.bfloat16)


def _host_prep(value, level_shapes, sampling_locations, attention_weights,
               tile_q):
    """Per-level packed slabs [B, H, Qp, P*3] + value slabs [B, H, HWp, D]."""
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
    slabs, level_vals, start = [], [], 0
    for lid, (h_l, w_l) in enumerate(level_shapes):
        xs = loc[:, :, :, lid, :, 0] * w_l - 0.5  # [B, H, Qp, P]
        ys = loc[:, :, :, lid, :, 1] * h_l - 0.5
        aw = wts[:, :, :, lid, :]
        slab = jnp.stack([xs, ys, aw], axis=-1)  # [B, H, Qp, P, 3]
        slabs.append(slab.reshape(B, H, Qp, P * 3))

        wp, hwp = _padded_cols(h_l, w_l)
        v = jax.lax.slice_in_dim(val, start, start + h_l * w_l, axis=2)
        # row-major [HW] -> x-major [H*Wp]: f = x*H + y
        v = v.reshape(B, H, h_l, w_l, D).transpose(0, 1, 3, 2, 4)
        if wp > w_l:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wp - w_l), (0, 0), (0, 0)))
        level_vals.append(v.reshape(B, H, hwp, D))
        start += h_l * w_l
    return slabs, level_vals, Qp


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
    P = sampling_locations.shape[4]
    assert sum(h * w for h, w in level_shapes) == S

    slabs, level_vals, Qp = _host_prep(
        value, level_shapes, sampling_locations, attention_weights, tile_q
    )
    n_tiles = Qp // tile_q
    # MXU x-expansion needs bf16 weights anyway; keep the exact-f32 VPU
    # build when the value (and hence the A matmul) is f32
    mxu_expand = value.dtype == jnp.bfloat16

    acc = None
    for lid, ((h_l, w_l), slab, v) in enumerate(
        zip(level_shapes, slabs, level_vals)
    ):
        hwp = v.shape[2]
        extra, extra_specs = [], []
        if mxu_expand:
            extra = [_expansion_matrix(h_l, hwp // h_l)[None, None]]
            extra_specs = [pl.BlockSpec(
                (1, 1, hwp // h_l, hwp),
                lambda b, hh, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )]
        out = pl.pallas_call(
            functools.partial(
                _kernel_v4, h=h_l, w=w_l, n_points=P, head_dim=D,
                tile_q=tile_q, mxu_expand=mxu_expand,
            ),
            grid=(B, H, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, tile_q, P * 3),
                    lambda b, hh, t: (b, hh, t, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, hwp, D),
                    lambda b, hh, t: (b, hh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ] + extra_specs,
            out_specs=pl.BlockSpec(
                (1, 1, tile_q, D),
                lambda b, hh, t: (b, hh, t, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), jnp.float32),
            interpret=interpret,
        )(slab, v, *extra)
        acc = out if acc is None else acc + out
    out = acc[:, :, :Q].transpose(0, 2, 1, 3)
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
    P = sampling_locations.shape[4]
    slabs, level_vals, Qp = _host_prep(
        value, level_shapes, sampling_locations, attention_weights, tile_q
    )
    n_tiles = Qp // tile_q

    dout = d_out.reshape(B, Q, H, D).astype(jnp.float32)
    dout = jnp.pad(dout, ((0, 0), (0, Qp - Q), (0, 0), (0, 0)))
    dout = dout.transpose(0, 2, 1, 3)  # [B, H, Qp, D]
    # pre-transposed [B, H, D, Qp] in the value dtype (bf16 keeps the MXU on
    # its exact single-pass path; accumulation stays f32)
    doutt = dout.transpose(0, 1, 3, 2).astype(value.dtype)

    slab_spec = pl.BlockSpec(
        (1, 1, tile_q, P * 3),
        lambda b, hh, t: (b, hh, t, 0),
        memory_space=pltpu.VMEM,
    )

    mxu_expand = value.dtype == jnp.bfloat16

    dv_parts, dslab_parts = [], []
    for lid, ((h_l, w_l), slab, v) in enumerate(
        zip(level_shapes, slabs, level_vals)
    ):
        hwp = v.shape[2]
        wp = hwp // h_l
        vt = v.transpose(0, 1, 3, 2)  # [B, H, D, HWp] (host relayout)
        extra, extra_specs = [], []
        if mxu_expand:
            extra = [_expansion_matrix(h_l, wp)[None, None]]
            extra_specs = [pl.BlockSpec(
                (1, 1, wp, hwp),
                lambda b, hh, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )]

        dvt = pl.pallas_call(
            functools.partial(
                _kernel_v4_bwd_dv, h=h_l, w=w_l, n_points=P, head_dim=D,
                tile_q=tile_q, mxu_expand=mxu_expand,
            ),
            grid=(B, H, n_tiles),
            in_specs=[
                slab_spec,
                pl.BlockSpec(
                    (1, 1, D, tile_q),
                    lambda b, hh, t: (b, hh, 0, t),
                    memory_space=pltpu.VMEM,
                ),
            ] + extra_specs,
            out_specs=pl.BlockSpec(
                (1, 1, D, hwp),
                lambda b, hh, t: (b, hh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, D, hwp), jnp.float32),
            interpret=interpret,
        )(slab, doutt, *extra)

        dslab = pl.pallas_call(
            functools.partial(
                _kernel_v4_bwd_dslab, h=h_l, w=w_l, n_points=P,
                head_dim=D, tile_q=tile_q,
            ),
            grid=(B, H, n_tiles),
            in_specs=[
                slab_spec,
                pl.BlockSpec(
                    (1, 1, D, hwp),
                    lambda b, hh, t: (b, hh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, tile_q, D),
                    lambda b, hh, t: (b, hh, t, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, tile_q, P * 3),
                lambda b, hh, t: (b, hh, t, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, Qp, P * 3), jnp.float32),
            interpret=interpret,
        )(slab, vt, dout)

        # [D, H*Wp] x-major -> row-major [HW, D]
        dv = dvt.reshape(B, H, D, wp, h_l)[:, :, :, :w_l]
        dv = dv.transpose(0, 1, 4, 3, 2).reshape(B, H, h_l * w_l, D)
        dv_parts.append(dv)
        dslab_parts.append(dslab.reshape(B, H, Qp, P, 3))

    d_value = jnp.concatenate(dv_parts, axis=2).transpose(0, 2, 1, 3)
    d_value = d_value.astype(value.dtype)

    ds = jnp.stack(dslab_parts, axis=3)  # [B, H, Qp, L, P, 3]
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
