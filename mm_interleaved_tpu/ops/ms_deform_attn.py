"""Multi-scale deformable attention, TPU-native.

The reference implements this as a hand-written CUDA kernel
(`/root/reference/mm_interleaved/models/utils/ops/src/cuda/ms_deform_im2col_cuda.cuh:241-303`)
with a pure-PyTorch `grid_sample` fallback
(`.../functions/ms_deform_attn_func.py:47-67`).  On TPU we express the op as a
batched gather + bilinear blend: XLA lowers the `take_along_axis` calls onto the
vector units and fuses the surrounding elementwise math, and JAX autodiff gives
us the backward pass for free (the CUDA backward's scatter-add becomes an XLA
scatter).  Accumulation is always fp32 regardless of input dtype, matching the
reference's `opmath_t` fp32 accumulation for fp16 inputs.

Semantics (matching the reference op):
  * sampling locations are normalised to [0, 1] over each level's grid,
    sampled with `align_corners=False` convention: pixel centre of texel
    ``(i, j)`` sits at ``((j + 0.5)/W, (i + 0.5)/H)``.
  * out-of-bounds samples contribute zero (``padding_mode="zeros"``).

Spatial shapes must be static (python ints) — they determine gather layout and
keeping them static lets XLA tile everything; the reference carries them in an
int64 tensor only because CUDA kernels take runtime args.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange


def _bilinear_gather_one_level(
    value_l: jax.Array,  # [B, HW, H_heads, D] (any float dtype)
    loc: jax.Array,  # [B, Lq, H_heads, P, 2] in [0,1] (x, y) (fp32)
    h: int,
    w: int,
) -> jax.Array:
    """Bilinear sample one pyramid level at the given normalised locations.

    Returns [B, Lq, H_heads, P, D] fp32 with zeros outside the grid.
    The (small) gathered values upcast to fp32 — never the whole table.
    """
    B, Lq, n_heads, P, _ = loc.shape
    value_l = rearrange(value_l, "b s h d -> b h s d")

    # align_corners=False mapping from normalised [0,1] to texel coordinates.
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0  # fractional offsets
    ly = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Corner weights (zeros padding -> mask out-of-bounds corners).
    def corner(ix, iy, wgt):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        flat = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        return flat, jnp.where(valid, wgt, 0.0)

    corners = [
        corner(x0i, y0i, (1.0 - lx) * (1.0 - ly)),
        corner(x0i + 1, y0i, lx * (1.0 - ly)),
        corner(x0i, y0i + 1, (1.0 - lx) * ly),
        corner(x0i + 1, y0i + 1, lx * ly),
    ]

    # One fused gather for all 4 corners: indices [B, H_heads, Lq*P*4]
    idx = jnp.stack([c[0] for c in corners], axis=-1)  # [B, Lq, Hh, P, 4]
    wgt = jnp.stack([c[1] for c in corners], axis=-1)  # [B, Lq, Hh, P, 4]

    idx = rearrange(idx, "b q h p c -> b h (q p c)")
    gathered = jnp.take_along_axis(value_l, idx[..., None], axis=2)
    gathered = rearrange(
        gathered, "b h (q p c) d -> b q h p c d", q=Lq, p=P, c=4
    ).astype(jnp.float32)
    out = (gathered * wgt[..., None]).sum(axis=-2)  # [B, Lq, Hh, P, D]
    return out


def _onehot_level(
    value_l: jax.Array,  # [B, HW, H, D] (any float dtype)
    loc: jax.Array,  # [B, Lq, H, P, 2] fp32
    w: jax.Array,  # [B, Lq, H, P] fp32
    h: int,
    w_: int,
) -> jax.Array:
    """Gather-free bilinear sampling for small Lq: build the dense one-hot
    interpolation matrix and contract on the MXU.  Equals
    `_bilinear_gather_one_level` weighted by ``w`` and summed over P.
    Returns [B, Lq, H, D]."""
    B, Lq, n_heads, P, _ = loc.shape
    hw = h * w_
    x = loc[..., 0] * w_ - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    idxs, wts = [], []
    for dx, dy, cw in (
        (0, 0, (1.0 - lx) * (1.0 - ly)),
        (1, 0, lx * (1.0 - ly)),
        (0, 1, (1.0 - lx) * ly),
        (1, 1, lx * ly),
    ):
        ix = x0i + dx
        iy = y0i + dy
        valid = ((ix >= 0) & (ix < w_) & (iy >= 0) & (iy < h))
        idxs.append(jnp.clip(iy, 0, h - 1) * w_ + jnp.clip(ix, 0, w_ - 1))
        wts.append(jnp.where(valid, cw * w, 0.0))
    idx = jnp.stack(idxs, axis=-1)  # [B, Lq, H, P, 4]
    wt = jnp.stack(wts, axis=-1)

    cols = jnp.arange(hw, dtype=jnp.int32)
    onehot = (idx[..., None] == cols).astype(jnp.float32)  # [..., 4, HW]
    W = jnp.einsum("bqhpc,bqhpcs->bqhs", wt, onehot)  # [B, Lq, H, HW]
    return jnp.einsum(
        "bqhs,bshd->bqhd", W, value_l.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


# below this many queries the dense one-hot path beats XLA's gather
# (measured on v5e: decode-shape gather 2.7ms vs <0.3ms dense)
SMALL_Q_THRESHOLD = 16

# Pallas dispatch flags live in thread-local storage so parallel traces
# (e.g. a background compile thread) never observe another thread's mode.
import threading

_DISPATCH = threading.local()


class pallas_deform_inference:
    """Context manager enabling the Pallas deformable kernel for large-Q
    inference calls traced inside it (dense bilinear-matrix v4 kernel,
    measured 2.5-4x over the XLA gather on v5e at UNet/prefill shapes)."""

    _flag = "inference"

    def __enter__(self):
        self._prev = getattr(_DISPATCH, self._flag, False)
        setattr(_DISPATCH, self._flag, True)

    def __exit__(self, *exc):
        setattr(_DISPATCH, self._flag, self._prev)


class pallas_deform_training(pallas_deform_inference):
    """Context manager routing large-Q deformable calls to the
    differentiable Pallas kernel (`ms_deform_attn_pallas_v5_trainable`) —
    forward + transposed-matmul backward, grads verified against the XLA
    autodiff path in tests/test_pallas_kernel.py."""

    _flag = "training"


def factorized_deform_eligible(Lq: int) -> bool:
    """The factorized multi-image kernel (forward-only, image-level masks)
    serves inference traces on TPU at UNet query counts."""
    import os

    if not getattr(_DISPATCH, "inference", False):
        return False
    if os.environ.get("MMI_DISABLE_PALLAS_DEFORM"):
        return False
    return jax.default_backend() in ("tpu", "axon") and Lq >= 64


def _pallas_eligible(Lq: int) -> bool:
    import os

    if not (getattr(_DISPATCH, "inference", False)
            or getattr(_DISPATCH, "training", False)):
        return False
    if os.environ.get("MMI_DISABLE_PALLAS_DEFORM"):
        return False
    # >= 64: the v4 kernel beats the XLA dense one-hot ~2x even at the
    # smallest UNet MMFS blocks (Q=64, half-tile padding included); only
    # the decode regime (Lq <= SMALL_Q_THRESHOLD) stays on the dense path
    return (
        jax.default_backend() in ("tpu", "axon") and Lq >= 64
    )


def ms_deform_attn(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Multi-scale deformable attention core.

    Args:
      value: ``[B, S, n_heads, D]`` flattened multi-level features where
        ``S == sum(H_l * W_l)`` over the (possibly per-image repeated) levels.
      spatial_shapes: static ``[(H_0, W_0), ...]`` — one entry per level,
        in the order levels are concatenated along ``S``.
      sampling_locations: ``[B, Lq, n_heads, L, P, 2]`` in [0, 1], ``(x, y)``.
      attention_weights: ``[B, Lq, n_heads, L, P]`` (already softmaxed across
        the flattened ``L*P`` axis by the caller, possibly including extra
        slots such as MMFS's ignore token).

    Returns:
      ``[B, Lq, n_heads * D]`` in the dtype of ``value``.
    """
    B, S, n_heads, D = value.shape
    L = len(spatial_shapes)
    assert sampling_locations.shape[3] == L, (
        f"sampling_locations has {sampling_locations.shape[3]} levels, "
        f"spatial_shapes has {L}"
    )
    sizes = [h * w for (h, w) in spatial_shapes]
    assert sum(sizes) == S, f"spatial shapes {spatial_shapes} != S={S}"

    Lq = sampling_locations.shape[1]
    if _pallas_eligible(Lq):
        # both modes use the differentiable occupancy-gated chunked kernel
        # (custom_vjp; the forward is identical either way) — measured
        # 1.5x fwd / 2.1x fwd+bwd over the dense v4 kernel at the
        # clustered sampling distributions the model actually produces,
        # ~20x over XLA autodiff (scripts/bench_v5_kernel.py)
        from .ms_deform_attn_pallas_v5 import (
            ms_deform_attn_pallas_v5_trainable,
        )

        return ms_deform_attn_pallas_v5_trainable(
            value, tuple(spatial_shapes), sampling_locations,
            attention_weights,
        )

    out_dtype = value.dtype
    loc32 = sampling_locations.astype(jnp.float32)
    w32 = attention_weights.astype(jnp.float32)

    small_q = Lq <= SMALL_Q_THRESHOLD

    def core(value, loc32, w32):
        acc = None
        start = 0
        for lid, (h, w) in enumerate(spatial_shapes):
            value_l = jax.lax.slice_in_dim(
                value, start, start + h * w, axis=1
            )
            if small_q:
                contrib = _onehot_level(
                    value_l, loc32[:, :, :, lid], w32[:, :, :, lid], h, w
                )
            else:
                sampled = _bilinear_gather_one_level(
                    value_l, loc32[:, :, :, lid], h, w
                )  # [B, Lq, Hh, P, D]
                contrib = (sampled * w32[:, :, :, lid, :, None]).sum(axis=3)
            acc = contrib if acc is None else acc + contrib
            start += h * w
        return acc

    if not small_q:
        # autodiff through the gather stashes [B, Lq, H, P, D] per level
        # per call site — at UNet scale that dominates the train step's
        # peak memory on the XLA path (the Pallas kernel's custom_vjp
        # already recomputes); remat trades it for a second gather pass
        core = jax.checkpoint(core)
    acc = core(value, loc32, w32)

    return rearrange(acc, "b q h d -> b q (h d)").astype(out_dtype)


def ms_deform_attn_multi_image(
    value: jax.Array,
    level_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    """Multi-image variant used by MMFS (reference `mmfs.py:120-276`).

    The reference flattens the image axis into the level axis, giving
    ``n_images * n_levels`` runtime levels.  Because every image shares the
    same per-level shapes, we instead fold the image axis into the batch axis
    — one gather per *unique* level — and sum image contributions afterwards
    (valid because the output is linear in the attention weights, which
    already carry the per-image masking).

    Args:
      value: ``[B, n_img, hw, n_heads, D]`` with ``hw == sum(H_l*W_l)``.
      level_shapes: static per-level ``(H_l, W_l)``, length ``n_levels``.
      sampling_locations: ``[B, Lq, n_heads, n_img, n_levels, P, 2]``.
      attention_weights: ``[B, Lq, n_heads, n_img, n_levels, P]``.

    Returns:
      ``[B, Lq, n_heads * D]``.
    """
    B, n_img, hw, n_heads, D = value.shape
    Lq = sampling_locations.shape[1]

    value_f = rearrange(value, "b n s h d -> (b n) s h d")
    loc_f = rearrange(sampling_locations, "b q h n l p t -> (b n) q h l p t")
    w_f = rearrange(attention_weights, "b q h n l p -> (b n) q h l p")

    out = ms_deform_attn(value_f, level_shapes, loc_f, w_f)  # [(b n), q, h*d]
    out = rearrange(out, "(b n) q c -> b n q c", b=B)
    return out.sum(axis=1)
