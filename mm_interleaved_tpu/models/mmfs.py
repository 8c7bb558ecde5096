"""MMFS — Multi-image Multi-scale Feature Synchronizer.

TPU-native re-design of the reference module
(`/root/reference/mm_interleaved/models/utils/ops/modules/mmfs.py:26-276`):
masked multi-image deformable cross-attention from a query stream onto the
multi-scale ViT feature pyramids of the images in the sequence.

Differences from the reference (behaviour-preserving, shape-friendly for XLA):
  * the image axis is folded into the batch axis for the gather instead of
    being flattened into the level axis (one gather per *unique* level);
  * per-level spatial shapes are static python ints;
  * the softmax over ``n_img*n_levels*(n_points+1)`` slots — including the
    learned "ignore" slot pinned at logit ``-log(n_img*n_levels)``
    (reference mmfs.py:225) and the ``-10000`` masking of invalid images
    (mmfs.py:203-223) — is reproduced exactly.

Note the reference's conditional write of 1.0 into the ignore logit for
all-masked queries (mmfs.py:212,223) is dead code: line 225 unconditionally
overwrites the ignore slot afterwards.  We implement the effective semantics.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..ops.ms_deform_attn import ms_deform_attn_multi_image


def _offset_bias_init(magnitude: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-magnitude, maxval=magnitude
        )

    return init


class MMFS(nn.Module):
    """Masked multi-image multi-scale deformable attention.

    Attributes mirror the reference constructor (mmfs.py:27-42).
    ``level_shapes`` are the static per-image level resolutions, e.g.
    ``((32, 32), (16, 16), (8, 8))`` for the LLM branch.
    """

    d_model: int = 256
    d_query: int = -1
    d_value: int = 256
    d_out: int = -1
    n_heads: int = 8
    n_points: int = 8
    ratio: float = 1.0
    offset_init_magnitude: float = 3.0
    level_shapes: Sequence[Tuple[int, int]] = ((16, 16),)
    base_spatial_shape: int = 16
    max_num_image_per_seq: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [B, Lq, d_query]
        input_flatten: Optional[jax.Array],  # [B, n_img, hw, d_value]
        attention_mask: jax.Array,  # [B, Lq, n_img] or [B, n_img]; 1=valid
        reference_points: Optional[jax.Array] = None,  # [B, Lq, 2] in [0,1]
        projected_value: Optional[jax.Array] = None,  # [B, n_img, hw, d_vp]
    ) -> jax.Array:
        """``projected_value`` lets decode steps reuse the value projection of
        the (step-invariant) vision pyramid: the prefill pass sows it under
        'intermediates'/'projected_value' and the generation runtime feeds it
        back, skipping a full `value_proj` matmul per step per layer."""
        d_query = self.d_query if self.d_query > 0 else self.d_model
        d_out = self.d_out if self.d_out > 0 else self.d_model
        d_val_proj = int(self.d_model * self.ratio)
        n_levels = len(self.level_shapes)
        B, Lq, _ = query.shape
        n_img = (input_flatten if projected_value is None
                 else projected_value).shape[1]
        nlevels = n_img * n_levels
        P = self.n_points

        if attention_mask.ndim == 2:
            mask3 = jnp.broadcast_to(
                attention_mask[:, None, :], (B, Lq, n_img)
            )
        else:
            mask3 = attention_mask
        mask3 = mask3.astype(jnp.int32)

        # --- per-(query, image) relative position index (mmfs.py:154-163):
        # the most recent valid image (w.r.t. the query) gets index total,
        # counting down; invalid images get 0.
        image_num_tot = mask3.sum(axis=-1, keepdims=True)
        image_num_prev = jnp.cumsum(mask3, axis=-1)
        image_relpos = (image_num_tot + 1 - image_num_prev) * mask3
        image_relpos = jnp.clip(image_relpos, 0, self.max_num_image_per_seq - 1)

        # --- value projection (skipped when the prefill already computed it)
        if projected_value is None:
            value = nn.Dense(
                d_val_proj,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name="value_proj",
            )(input_flatten)
            self.sow("intermediates", "projected_value", value)
        else:
            value = projected_value
        value = value.reshape(
            B, n_img, -1, self.n_heads, d_val_proj // self.n_heads
        )

        # --- per-image query conditioning
        q = nn.Dense(d_query, dtype=self.dtype, name="dynamic_offset_mask")(
            query
        )  # [B, Lq, d_query]
        relpos_table = nn.Embed(
            self.max_num_image_per_seq,
            d_query,
            embedding_init=nn.initializers.truncated_normal(stddev=0.02),
            dtype=self.dtype,
            name="query_relpos",
        )
        q_img = q[:, None, :, :] + rearrange(
            relpos_table(image_relpos), "b q n d -> b n q d"
        )  # [B, n_img, Lq, d_query]

        # --- sampling offsets: zero weight, uniform bias (mmfs.py:102-110)
        offsets = nn.Dense(
            self.n_heads * P * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(self.offset_init_magnitude),
            name="sampling_offsets",
        )(q_img)
        offsets = offsets.reshape(B, n_img, Lq, self.n_heads, 1, P, 2)
        offsets = rearrange(offsets, "b n q h l p t -> b q h n l p t")

        # broadcast the single offset set across levels, scaled per level by
        # (level_size / base_spatial_shape) then normalised by (W_l, H_l)
        # (mmfs.py:193-198, 243-250).
        scale = jnp.asarray(
            [
                [w / self.base_spatial_shape, h / self.base_spatial_shape]
                for (h, w) in self.level_shapes
            ],
            dtype=jnp.float32,
        )  # [L, 2] in (x, y) order
        normalizer = jnp.asarray(
            [[w, h] for (h, w) in self.level_shapes], dtype=jnp.float32
        )  # [L, 2]
        per_level = scale / normalizer  # [L, 2]
        offsets = offsets.astype(jnp.float32) * per_level[
            None, None, None, None, :, None, :
        ]  # [B, Lq, H, n_img, L, P, 2]

        if reference_points is None:
            ref = jnp.full((B, Lq, 2), 0.5, dtype=jnp.float32)
        else:
            ref = reference_points.astype(jnp.float32)
        sampling_locations = (
            ref[:, :, None, None, None, None, :] + offsets
        )  # [B, Lq, H, n_img, L, P, 2]

        # --- attention logits over (n_img, L, P+1) incl. ignore slot
        attn_logits = nn.Dense(
            self.n_heads * n_levels * (P + 1),
            dtype=self.dtype,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(q_img)
        attn_logits = attn_logits.reshape(
            B, n_img, Lq, self.n_heads, n_levels, P + 1
        )
        attn_logits = rearrange(
            attn_logits, "b n q h l p -> b q h n l p"
        ).astype(jnp.float32)

        img_bias = (1.0 - mask3.astype(jnp.float32)) * -10000.0
        attn_logits = attn_logits + img_bias[:, :, None, :, None, None]
        # ignore slot pinned at -log(nlevels) for every (image, level)
        attn_logits = attn_logits.at[..., -1].set(-math.log(nlevels))

        flat = attn_logits.reshape(B, Lq, self.n_heads, nlevels * (P + 1))
        probs = jax.nn.softmax(flat, axis=-1).reshape(
            B, Lq, self.n_heads, n_img, n_levels, P + 1
        )
        w_points = probs[..., :P]
        w_ignore = probs[..., P]  # [B, Lq, H, n_img, L]

        # --- ignore-token contribution (zeros at init; kept for parity with
        # loaded weights, mmfs.py:87-89, 233-241)
        ignore_token = self.param(
            "ignore_token",
            nn.initializers.zeros,
            (d_val_proj,),
            jnp.float32,
        )
        ignore_heads = ignore_token.reshape(
            self.n_heads, d_val_proj // self.n_heads
        )
        ignore_contrib = jnp.einsum(
            "bqhnl,hd->bqhd", w_ignore, ignore_heads.astype(jnp.float32)
        )
        ignore_contrib = rearrange(ignore_contrib, "b q h d -> b q (h d)")

        out = ms_deform_attn_multi_image(
            value,
            self.level_shapes,
            sampling_locations.astype(value.dtype),
            # ms_deform_attn_multi_image wants [B, Lq, H, n_img, L, P]
            w_points.astype(value.dtype),
        )
        out = out + ignore_contrib.astype(out.dtype)

        out = nn.Dense(
            d_out,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="output_proj",
        )(out)
        return out
