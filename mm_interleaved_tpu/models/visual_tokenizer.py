"""Visual tokenizer: CLIP ViT-Adapter + perceiver resampler.

Re-design of the reference `models/encoders/visual_tokenizer.py:11-101`:
CLIP-normalise pixels, run the adapter to get the last hidden state and the
4-level pyramid, add (interpolated) 2D sin-cos positional embeddings to every
pyramid level and to the resampler input, then resample to ``num_queries``
image tokens projected to the LLM width.

Returns:
  vis_embed: ``[B, num_queries, llm_hidden_size]`` — scattered into the token
    stream by the top model;
  image_embeds: ``[B, HW, C]`` (cls removed);
  multiscale_features: tuple of ``[B, H_l, W_l, C]`` NHWC maps
    (strides 4/8/16/32).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pos_embed import get_2d_sincos_pos_embed, resize_abs_pos_embed
from .perceiver import PerceiverConfig, PerceiverResampler
from .vit_adapter import CLIPViTAdapter, ViTAdapterConfig

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class VisualTokenizerConfig:
    encoder: ViTAdapterConfig = dataclasses.field(
        default_factory=ViTAdapterConfig
    )
    perceiver: PerceiverConfig = dataclasses.field(
        default_factory=PerceiverConfig
    )
    llm_hidden_size: int = 5120
    clip_normalize: bool = True
    grid_size: int = 16  # grid of the (fixed) sincos table


class VisualTokenizer(nn.Module):
    cfg: VisualTokenizerConfig

    @nn.compact
    def __call__(self, image: jax.Array, deterministic: bool = True):
        """image: [B, H, W, 3] in [0, 1]."""
        c = self.cfg
        enc_dim = c.encoder.dim

        if c.clip_normalize:
            mean = jnp.asarray(CLIP_MEAN, image.dtype)
            std = jnp.asarray(CLIP_STD, image.dtype)
            image = (image - mean) / std

        last_hidden, pyramid = CLIPViTAdapter(c.encoder, name="encoder")(image)
        B = last_hidden.shape[0]

        table = jnp.asarray(
            get_2d_sincos_pos_embed(enc_dim, c.grid_size, cls_token=True)
        )

        # per-level pos embed added to the pyramid (visual_tokenizer.py:74-82)
        pyramid_out = []
        for feat in pyramid:
            h = feat.shape[1]
            pe = resize_abs_pos_embed(table[1:], c.grid_size, h)
            pyramid_out.append(
                feat + pe.reshape(h, h, enc_dim)[None].astype(feat.dtype)
            )

        # resampler input: pos_ln(pos_proj(x)) + pos_embed
        grid_tokens = last_hidden.shape[1] - 1
        side = int(round(grid_tokens ** 0.5))
        grid_pe = resize_abs_pos_embed(table[1:], c.grid_size, side)
        pe = jnp.concatenate([table[:1], grid_pe], axis=0)[None]

        q_in = nn.Dense(enc_dim, name="pos_proj")(last_hidden)
        q_in = nn.LayerNorm(epsilon=1e-6, name="pos_ln")(q_in)
        q_in = q_in + pe.astype(q_in.dtype)
        image_embeds = last_hidden + pe.astype(last_hidden.dtype)

        q_in = nn.LayerNorm(epsilon=1e-6, name="post_ln")(q_in)
        vis = PerceiverResampler(c.perceiver, name="perceiver_resampler")(
            encoder_hidden_states=q_in, deterministic=deterministic
        )
        vis_embed = nn.Dense(
            c.llm_hidden_size,
            kernel_init=nn.initializers.normal(stddev=1e-3),
            bias_init=nn.initializers.zeros,
            name="proj",
        )(vis)

        return dict(
            vis_embed=vis_embed,
            image_embeds=image_embeds[:, 1:],
            multiscale_features=tuple(pyramid_out),
        )
