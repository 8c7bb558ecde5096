"""CLIP text encoder — for CLIP text-image rerank of generated images
(reference `utils/clip_sim_score.py:84-120`) and for initialising the SD
negative prompt embeddings from the empty prompt
(reference `decoders/sd.py:113-141`).

Standard CLIP text transformer: token + learned positional embeddings,
pre-LN blocks with causal masking, final LN, eot-token pooling, linear
projection into the shared image-text space.  Weights load from HF
`CLIPTextModel(+WithProjection)` via `convert_clip_text`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..ops.attention import dot_product_attention
from .vit import _act


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    projection_dim: int = 512
    eos_token_id: int = 49407
    dtype: str = "float32"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class CLIPTextLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dtype = c.compute_dtype
        B, T, C = x.shape
        nh = c.num_attention_heads
        hd = C // nh

        residual = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                         name="layer_norm1")(x)
        q = nn.Dense(C, dtype=dtype, name="q_proj")(h).reshape(B, T, nh, hd)
        k = nn.Dense(C, dtype=dtype, name="k_proj")(h).reshape(B, T, nh, hd)
        v = nn.Dense(C, dtype=dtype, name="v_proj")(h).reshape(B, T, nh, hd)
        attn = dot_product_attention(q, k, v, causal=True).reshape(B, T, C)
        x = residual + nn.Dense(C, dtype=dtype, name="out_proj")(attn)

        residual = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=dtype, name="fc1")(h)
        h = _act(c.hidden_act)(h)
        return residual + nn.Dense(C, dtype=dtype, name="fc2")(h)


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        """input_ids [B, T] -> (last_hidden_state [B, T, C],
        text_features [B, projection_dim])."""
        c = self.cfg
        B, T = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.02),
            (c.max_position_embeddings, c.hidden_size),
            jnp.float32,
        )
        x = tok + pos[None, :T].astype(tok.dtype)
        for i in range(c.num_hidden_layers):
            x = CLIPTextLayer(c, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)

        # eot pooling: the first eos token per row (HF convention)
        is_eos = (input_ids == c.eos_token_id).astype(jnp.int32)
        first_eos = jnp.argmax(is_eos, axis=-1)
        # rows with no explicit eos fall back to the last position
        first_eos = jnp.where(is_eos.sum(-1) > 0, first_eos, T - 1)
        pooled = x[jnp.arange(B), first_eos]
        feats = nn.Dense(c.projection_dim, use_bias=False,
                         name="text_projection")(pooled)
        return x, feats


def convert_clip_text(sd: Dict[str, np.ndarray], num_layers: int,
                      prefix: str = "text_model.") -> Dict:
    """HF CLIPTextModel(WithProjection) state dict -> our params."""

    def _t(w):
        return np.asarray(w).T

    p: Dict = {
        "token_embedding": {
            "embedding": np.asarray(
                sd[f"{prefix}embeddings.token_embedding.weight"]
            )
        },
        "position_embedding": np.asarray(
            sd[f"{prefix}embeddings.position_embedding.weight"]
        ),
        "final_layer_norm": {
            "scale": np.asarray(sd[f"{prefix}final_layer_norm.weight"]),
            "bias": np.asarray(sd[f"{prefix}final_layer_norm.bias"]),
        },
    }
    if "text_projection.weight" in sd:
        p["text_projection"] = {"kernel": _t(sd["text_projection.weight"])}
    for i in range(num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layer: Dict = {}
        for ours, theirs in (
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("out_proj", "self_attn.out_proj"),
            ("fc1", "mlp.fc1"),
            ("fc2", "mlp.fc2"),
        ):
            layer[ours] = {
                "kernel": _t(sd[f"{lp}{theirs}.weight"]),
                "bias": np.asarray(sd[f"{lp}{theirs}.bias"]),
            }
        for ln in ("layer_norm1", "layer_norm2"):
            layer[ln] = {
                "scale": np.asarray(sd[f"{lp}{ln}.weight"]),
                "bias": np.asarray(sd[f"{lp}{ln}.bias"]),
            }
        p[f"layers_{i}"] = layer
    return p
