"""Fused GEGLU MLP Pallas kernel for the SD UNet transformer blocks.

The reference runs the GEGLU feed-forward as two separate matmuls with the
``[B, T, 8C]`` intermediate in memory (diffusers `attention.py` FeedForward;
reference wraps it via `sd_unet_forward_monkey_patch.py`).  On TPU that
intermediate is the single largest HBM stream of the denoise loop's UNet
half: at 64px latent (T=4096, C=320, CFG batch 4) it moves ~500 MB per
block per step, ~6 ms/step across the five 64px blocks (round-5 ablation,
PERF.md) against a ~1.5 ms FLOP roofline.

This kernel tiles the token axis and keeps the ``[tile, 4C]`` GEGLU halves
in VMEM: HBM traffic collapses to x + out + one pass over the weights.
Weights for C<=640 fit VMEM whole (w1a+w1b+w2 at C=640: ~10 MB of the ~16
MB/core budget); C=1280 blocks stay on the XLA path where the intermediate
is small anyway (T<=256).

Forward-only (denoise inference); training keeps the XLA path via the
`pallas_deform_inference` dispatch context, mirroring ops/ms_deform_attn.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def geglu_fused_eligible(C: int, T: int) -> bool:
    """Fused path: TPU inference traces, widths whose weights fit VMEM,
    token counts divisible by the tile."""
    import os

    from .ms_deform_attn import _DISPATCH

    if not getattr(_DISPATCH, "inference", False):
        return False
    if os.environ.get("MMI_DISABLE_PALLAS_GEGLU"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return C <= 640 and T % _tile_for(C) == 0 and T >= _tile_for(C)


def _tile_for(C: int) -> int:
    # intermediate f32 pair [tile, 4C] x2 must fit VMEM next to the weights
    return 512 if C <= 320 else 256


def _erf(x):
    """Abramowitz–Stegun 7.1.26 rational erf (~1.5e-7 abs error — far
    below the bf16 activation resolution downstream).  Mosaic TC has no
    native `erf`; `exp` it has."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, w1a_ref, w1b_ref, b1a_ref, b1b_ref, w2_ref, b2_ref,
            out_ref):
    x = x_ref[0]
    a = jnp.dot(
        x, w1a_ref[...], preferred_element_type=jnp.float32
    ) + b1a_ref[...]
    b = jnp.dot(
        x, w1b_ref[...], preferred_element_type=jnp.float32
    ) + b1b_ref[...]
    # exact-form (erf) GELU — matches nn.gelu(approximate=False)
    g = a * (0.5 * b * (1.0 + _erf(b * _INV_SQRT2)))
    o = jnp.dot(
        g.astype(x.dtype), w2_ref[...], preferred_element_type=jnp.float32
    ) + b2_ref[...]
    out_ref[0] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def geglu_mlp(
    x: jax.Array,  # [B, T, C]
    w1: jax.Array,  # [C, 8C] (GEGLU halves concatenated, diffusers order)
    b1: jax.Array,  # [8C]
    w2: jax.Array,  # [4C, C]
    b2: jax.Array,  # [C]
    interpret: bool = False,
) -> jax.Array:
    """``(a * gelu(b)) @ w2 + b2`` with ``a, b = split(x @ w1 + b1, 2)`` —
    the TransformerBlock feed-forward, fused so the ``[T, 4C]`` halves
    never leave VMEM."""
    B, T, C = x.shape
    F = w2.shape[0]
    assert w1.shape == (C, 2 * F) and b1.shape == (2 * F,)
    tile = _tile_for(C)
    assert T % tile == 0, (T, tile)

    w1a, w1b = w1[:, :F], w1[:, F:]
    b1a, b1b = b1[None, :F], b1[None, F:]

    return pl.pallas_call(
        _kernel,
        grid=(B, T // tile),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        interpret=interpret,
    )(x, w1a, w1b, b1a, b1b, w2, b2[None])
