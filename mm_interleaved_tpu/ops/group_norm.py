"""Channel-last GroupNorm for TPU.

`flax.linen.GroupNorm` computes statistics by reshaping ``[..., C]`` to
``[..., G, C // G]`` and reducing the trailing pair — on TPU that puts a
C//G-wide axis (10 for SD's GN32 over 320 channels) in the minormost lane
dimension, which Mosaic pads to 128 lanes: every GroupNorm in the SD
UNet/VAE round-trips a ~12x-padded layout through VMEM.  This module keeps
every large tensor in its natural ``[..., C]`` layout:

  1. one read pass produces per-channel fp32 sums ``s1 = sum(x)`` and
     ``s2 = sum(x^2)`` over all non-batch, non-channel dims -> ``[B, C]``;
  2. the tiny ``[B, C]`` tensors are folded to per-group moments;
  3. one fused multiply-add pass applies ``x * w[c] + b[c]`` where
     ``w = gamma * rsqrt(var_g + eps)`` and ``b = beta - mean_g * w``.

Same moment math as flax (E[x^2] - E[x]^2 in fp32), so it is numerically
interchangeable; parameter names ("scale"/"bias") and shapes match
`nn.GroupNorm`, so checkpoints and the SD weight converters are unaffected.
Used by the SD UNet and VAE (reference counterparts: diffusers GroupNorm
inside the patched UNet forward, `monkey_patch/sd_unet_forward_monkey_patch
.py:17-373`, and `decoders/sd.py`'s fp32 VAE).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
    dtype=None,
) -> jax.Array:
    """GroupNorm over ``[B, ..., C]`` reducing (spatial..., C//G) per group.

    All full-size tensor work stays channel-last; only ``[B, C]`` moment
    tensors are reshaped to groups.
    """
    C = x.shape[-1]
    assert C % num_groups == 0, (C, num_groups)
    cpg = C // num_groups
    out_dtype = dtype or x.dtype

    xf = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(xf, axis=red)  # [B, C]
    s2 = jnp.sum(xf * xf, axis=red)  # [B, C]
    B = s1.shape[0]
    n = float(np.prod([x.shape[a] for a in red]) * cpg)
    g1 = s1.reshape(B, num_groups, cpg).sum(-1)
    g2 = s2.reshape(B, num_groups, cpg).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # [B, G]

    # per-channel affine folded with the group stats: one FMA pass over x
    inv_c = jnp.repeat(inv, cpg, axis=-1)  # [B, C]
    mean_c = jnp.repeat(mean, cpg, axis=-1)
    w = scale.astype(jnp.float32)[None, :] * inv_c
    b = bias.astype(jnp.float32)[None, :] - mean_c * w
    bshape = (B,) + (1,) * (x.ndim - 2) + (C,)
    y = xf * w.reshape(bshape) + b.reshape(bshape)
    return y.astype(out_dtype)


def _apply_silu_kernel(x_ref, w_ref, b_ref, o_ref):
    t = x_ref[...].astype(jnp.float32)
    t = t * w_ref[...] + b_ref[...]
    o_ref[...] = (t * jax.nn.sigmoid(t)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_apply_silu(x, w, b, out_dtype):
    from jax.experimental import pallas as pl

    B, H, W, C = x.shape
    rb = 8
    while H % rb:
        rb //= 2
    grid = (B, H // rb)
    return pl.pallas_call(
        _apply_silu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, W, C), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, C), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, C), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rb, W, C), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, out_dtype),
    )(x, w[:, None, None, :], b[:, None, None, :])


def _pallas_apply_silu_fwd(x, w, b, out_dtype):
    return _pallas_apply_silu(x, w, b, out_dtype), (x, w, b)


def _pallas_apply_silu_bwd(out_dtype, res, dy):
    # recompute-based exact backward in plain XLA: silu'(t) = s*(1+t*(1-s))
    x, w, b = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    t = xf * w[:, None, None, :] + b[:, None, None, :]
    s = jax.nn.sigmoid(t)
    dt = dyf * (s * (1.0 + t * (1.0 - s)))
    dx = (dt * w[:, None, None, :]).astype(x.dtype)
    dw = jnp.sum(dt * xf, axis=(1, 2))
    db = jnp.sum(dt, axis=(1, 2))
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


_pallas_apply_silu.defvjp(_pallas_apply_silu_fwd, _pallas_apply_silu_bwd)


def group_norm_silu(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int,
    eps: float = 1e-5,
    dtype=None,
) -> jax.Array:
    """``silu(group_norm(x))`` with the normalize+silu pass as one Pallas
    sweep on TPU.

    Why a kernel for an elementwise op: when the conv that consumes the
    normalized map sits downstream of a reduction *of the same tensor*
    (exactly the GN -> silu -> conv3x3 pattern of every SD/VAE ResnetBlock),
    XLA stops fusing and the group runs at 5.1 ms vs the 1.3 ms the same
    silu+conv costs with an independent multiplier (512px/c128 v5e,
    scripts/probe_gn_internals.py).  Computing the stats as a plain XLA
    reduction (~0.2 ms, bandwidth-bound) and the fp32 apply+silu as one
    explicit bf16-in/bf16-out sweep caps the pattern near its bandwidth
    floor.  Numerics match ``nn.silu(group_norm(...))`` with the silu taken
    in fp32 before the output cast.
    """
    C = x.shape[-1]
    cpg = C // num_groups
    out_dtype = dtype or x.dtype

    use_pallas = (
        x.ndim == 4
        and jax.default_backend() in ("tpu", "axon")
        and C % 128 == 0
    )
    if not use_pallas:
        return nn.silu(group_norm(x, scale, bias, num_groups, eps, dtype))

    xf = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(xf, axis=red)
    s2 = jnp.sum(xf * xf, axis=red)
    B = s1.shape[0]
    n = float(np.prod([x.shape[a] for a in red]) * cpg)
    g1 = s1.reshape(B, num_groups, cpg).sum(-1)
    g2 = s2.reshape(B, num_groups, cpg).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, cpg, axis=-1)
    mean_c = jnp.repeat(mean, cpg, axis=-1)
    w = scale.astype(jnp.float32)[None, :] * inv_c
    b = bias.astype(jnp.float32)[None, :] - mean_c * w
    return _pallas_apply_silu(x, w, b, jnp.dtype(out_dtype))


class GroupNorm(nn.Module):
    """Drop-in for `nn.GroupNorm(num_groups, epsilon, dtype)` (channel-last
    stats path above); params named scale/bias with identical shapes."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, dtype=None):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm(
            x, scale, bias, self.num_groups, self.epsilon,
            dtype=dtype or self.dtype,
        )


class GroupNormSiLU(nn.Module):
    """``silu(GroupNorm(x))`` via :func:`group_norm_silu` — param names and
    shapes identical to :class:`GroupNorm`, so converters/checkpoints treat
    it as a plain GroupNorm whose call site applied silu."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, dtype=None):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        return group_norm_silu(
            x, scale, bias, self.num_groups, self.epsilon,
            dtype=dtype or self.dtype,
        )
