"""CLIP vision transformer (the frozen ViT-L/14 core of the visual tokenizer).

Re-design of the reference `models/encoders/vit_adapter/clip_vit_hf.py`
(CLIPVisionEmbeddings :35-97, CLIPVisionTransformer :99-254) and the xformers
attention swap (`xattn.py:21-141`) as plain flax modules — attention goes
through :mod:`mm_interleaved_tpu.ops.attention` (fp32 softmax; Pallas flash
kernel on TPU).  Layout is NHWC throughout (TPU-native), and the learned
position embedding interpolates bicubically when the input grid differs from
the pretraining grid (reference clip_vit_hf.py:60-87).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import dot_product_attention
from ..ops.pos_embed import resize_abs_pos_embed


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # CLIP's activation
    dtype: str = "float32"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return nn.gelu
    raise ValueError(name)


class ViTEmbeddings(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: [B, H, W, 3] -> [B, 1 + H/p * W/p, C]."""
        cfg = self.config
        B, H, W, _ = pixel_values.shape
        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.compute_dtype,
            name="patch_embedding",
        )(pixel_values)
        gh, gw = patches.shape[1], patches.shape[2]
        patches = patches.reshape(B, gh * gw, cfg.hidden_size)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.hidden_size,),
            jnp.float32,
        )
        cls = jnp.broadcast_to(
            cls.astype(patches.dtype), (B, 1, cfg.hidden_size)
        )

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.grid_size * cfg.grid_size + 1, cfg.hidden_size),
            jnp.float32,
        )
        cls_pos, grid_pos = pos[:1], pos[1:]
        grid_pos = resize_abs_pos_embed(grid_pos, cfg.grid_size, gh)
        pos = jnp.concatenate([cls_pos, grid_pos], axis=0)

        x = jnp.concatenate([cls, patches], axis=1)
        return x + pos[None].astype(x.dtype)


class ViTLayer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = cfg.compute_dtype
        B, T, C = x.shape
        nh = cfg.num_attention_heads
        hd = C // nh

        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="layer_norm1")(x)
        q = nn.Dense(C, dtype=dtype, name="q_proj")(h).reshape(B, T, nh, hd)
        k = nn.Dense(C, dtype=dtype, name="k_proj")(h).reshape(B, T, nh, hd)
        v = nn.Dense(C, dtype=dtype, name="v_proj")(h).reshape(B, T, nh, hd)
        attn = dot_product_attention(q, k, v).reshape(B, T, C)
        h = nn.Dense(C, dtype=dtype, name="out_proj")(attn)
        x = residual + h

        residual = x
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(C, dtype=dtype, name="fc2")(h)
        return residual + h
