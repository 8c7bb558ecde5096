"""Single-image multi-scale deformable attention (Deformable-DETR style).

Used by the ViT-Adapter's Injector/Extractor blocks.  Re-design of the
reference `models/encoders/vit_adapter/ops/modules/ms_deform_attn.py:28-131`
on top of the shared XLA gather core, with the same radial offset-bias init.
Level shapes are static; `level_start_index` disappears (implied by shapes).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.ms_deform_attn import ms_deform_attn


def grid_reference_points(
    level_shapes: Sequence[Tuple[int, int]]
) -> np.ndarray:
    """Pixel-centre reference points for each location of each level,
    normalised to [0, 1]: ``[sum(H*W), 2]`` in (x, y) order.
    (reference adapter_modules.py:15-27)"""
    pts = []
    for h, w in level_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return np.concatenate(pts, axis=0)


def _radial_offset_bias(n_heads: int, n_levels: int, n_points: int):
    """Deformable-DETR offset bias: head h points in direction 2*pi*h/H,
    point p at radius p+1 (reference ms_deform_attn.py:64-76)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # [H, 2]
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for p in range(n_points):
        grid[:, :, p, :] *= p + 1
    flat = grid.reshape(-1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttn(nn.Module):
    """Deformable attention over a single image's level pyramid."""

    d_model: int = 256
    n_heads: int = 8
    n_points: int = 4
    ratio: float = 1.0
    level_shapes: Sequence[Tuple[int, int]] = ((16, 16),)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [B, Lq, C]
        reference_points: jax.Array,  # [B or 1, Lq, 2] in [0, 1]
        feat: jax.Array,  # [B, sum(H*W), C]
    ) -> jax.Array:
        L = len(self.level_shapes)
        P = self.n_points
        B, Lq, _ = query.shape
        d_val = int(self.d_model * self.ratio)

        value = nn.Dense(
            d_val,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="value_proj",
        )(feat)
        value = value.reshape(B, -1, self.n_heads, d_val // self.n_heads)

        offsets = nn.Dense(
            self.n_heads * L * P * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_radial_offset_bias(self.n_heads, L, P),
            name="sampling_offsets",
        )(query).reshape(B, Lq, self.n_heads, L, P, 2)

        logits = nn.Dense(
            self.n_heads * L * P,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Lq, self.n_heads, L * P)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        weights = weights.reshape(B, Lq, self.n_heads, L, P)

        normalizer = jnp.asarray(
            [[w, h] for (h, w) in self.level_shapes], dtype=jnp.float32
        )  # [L, 2] in (x, y)
        ref = reference_points.astype(jnp.float32)
        if ref.shape[0] == 1 and B > 1:
            ref = jnp.broadcast_to(ref, (B, Lq, 2))
        locations = (
            ref[:, :, None, None, None, :]
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn(
            value,
            self.level_shapes,
            locations.astype(value.dtype),
            weights.astype(value.dtype),
        )
        return nn.Dense(
            self.d_model,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="output_proj",
        )(out)
