"""Rotary position embeddings (LLaMA-style, half-rotation layout).

Matches the reference `FixedLlamaRotaryEmbedding` + `apply_rotary_pos_emb`
(`models/decoders/modeling_llama_mmfs.py:119-180`): cos/sin tables computed in
fp32 from inv_freq = base**(-2i/d), applied as
``q * cos + rotate_half(q) * sin`` where rotate_half splits the head dim in
two contiguous halves.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0, 1), static_argnames=("base",))
def rotary_cos_sin(head_dim: int, max_len: int, base: float = 10000.0):
    """Return (cos, sin) tables of shape [max_len, head_dim] (fp32)."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, head_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_embedding(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    positions: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Apply RoPE.

    Args:
      q, k: ``[B, T, n_heads, head_dim]``.
      cos, sin: ``[max_len, head_dim]`` tables.
      positions: ``[B, T]`` int32 absolute positions.
    """
    c = cos[positions][:, :, None, :].astype(q.dtype)  # [B, T, 1, hd]
    s = sin[positions][:, :, None, :].astype(q.dtype)
    q_out = q * c + _rotate_half(q) * s
    k_out = k * c + _rotate_half(k) * s
    return q_out, k_out
