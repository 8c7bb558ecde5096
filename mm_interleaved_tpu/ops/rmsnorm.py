"""RMSNorm with fp32 accumulation.

The reference uses `LlamaRMSNorm` with an optional apex `FusedRMSNorm` swap
(`models/decoders/modeling_llama_mmfs.py:53-84`).  On TPU a hand-fused kernel
buys nothing — XLA fuses the reduction+scale into neighbouring ops — so this is
a plain jnp implementation with the same numerics (variance in fp32, weight
multiply in input dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return (x32.astype(dtype)) * weight
