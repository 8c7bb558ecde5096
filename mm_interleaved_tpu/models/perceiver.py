"""Perceiver resampler — a query-only BLIP-2 Q-Former.

The reference wraps HF's `Blip2QFormerModel` with learned queries and an
optional per-head q/k LayerNorm patch (`models/decoders/perceiver.py:7-30`,
`monkey_patch/blip2_qknorm_monkey_patch.py:8-157`).  This is a native
implementation of the subset actually exercised: a stack of post-LN BERT-style
blocks over N learned query tokens — self-attention, cross-attention to the
encoder states every ``cross_attention_frequency`` layers (starting at 0), and
a GELU FFN — with optional qk-norm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    num_queries: int = 64
    hidden_size: int = 768
    encoder_hidden_size: int = 1024
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    cross_attention_frequency: int = 2
    intermediate_size: Optional[int] = None  # default 4x hidden
    qk_normalization: bool = False
    layer_norm_eps: float = 1e-12
    dropout: float = 0.0
    initializer_range: float = 0.02
    dtype: str = "float32"

    @property
    def ffn_size(self) -> int:
        return self.intermediate_size or 4 * self.hidden_size

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class _MHA(nn.Module):
    cfg: PerceiverConfig
    kv_dim: int

    @nn.compact
    def __call__(self, x, kv, kv_mask=None, deterministic=True):
        c = self.cfg
        dtype = c.compute_dtype
        B, T, _ = x.shape
        S = kv.shape[1]
        nh = c.num_attention_heads
        hd = c.hidden_size // nh

        q = nn.Dense(c.hidden_size, dtype=dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=dtype, name="key")(kv)
        v = nn.Dense(c.hidden_size, dtype=dtype, name="value")(kv)
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, S, nh, hd)
        v = v.reshape(B, S, nh, hd)
        if c.qk_normalization:
            q = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                             name="q_norm")(q)
            k = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                             name="k_norm")(k)
        mask = None
        if kv_mask is not None:
            mask = kv_mask[:, None, None, :].astype(bool)
        out = dot_product_attention(q, k, v, mask=mask).reshape(
            B, T, c.hidden_size
        )
        out = nn.Dense(c.hidden_size, dtype=dtype, name="output")(out)
        return nn.Dropout(c.dropout)(out, deterministic=deterministic)


class PerceiverLayer(nn.Module):
    cfg: PerceiverConfig
    has_cross: bool

    @nn.compact
    def __call__(self, x, enc, enc_mask=None, deterministic=True):
        c = self.cfg
        dtype = c.compute_dtype
        h = _MHA(c, c.hidden_size, name="attention")(
            x, x, deterministic=deterministic
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                         name="attention_norm")(x + h)
        if self.has_cross:
            h = _MHA(c, c.encoder_hidden_size, name="crossattention")(
                x, enc, enc_mask, deterministic=deterministic
            )
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                             name="crossattention_norm")(x + h)
        h = nn.Dense(c.ffn_size, dtype=dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=dtype, name="ffn_output")(h)
        h = nn.Dropout(c.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                            name="output_norm")(x + h)


class PerceiverResampler(nn.Module):
    cfg: PerceiverConfig

    @nn.compact
    def __call__(
        self,
        encoder_hidden_states: jax.Array,  # [B, S, encoder_hidden_size]
        encoder_attention_mask: Optional[jax.Array] = None,  # [B, S]
        query_embeds: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        B = encoder_hidden_states.shape[0]
        queries = self.param(
            "queries",
            nn.initializers.normal(stddev=c.initializer_range),
            (1, c.num_queries, c.hidden_size),
            jnp.float32,
        )
        if query_embeds is None:
            x = jnp.broadcast_to(
                queries, (B, c.num_queries, c.hidden_size)
            ).astype(c.compute_dtype)
        else:
            x = query_embeds.astype(c.compute_dtype)

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.compute_dtype,
                         name="input_norm")(x)
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        for i in range(c.num_hidden_layers):
            x = PerceiverLayer(
                c,
                has_cross=(i % c.cross_attention_frequency == 0),
                name=f"layers_{i}",
            )(x, encoder_hidden_states, encoder_attention_mask,
              deterministic=deterministic)
        return x
