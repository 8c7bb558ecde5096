"""Sin-cos positional embeddings and checkpoint pos-embed resizing.

Functional parity with the reference's `models/utils/pos_embed.py`
(`get_2d_sincos_pos_embed` :48, `get_1d_sincos_pos_embed_from_grid` :77,
`get_abs_pos` bicubic resize :16-45), implemented on jnp so the tables can be
built inside jit when needed (they are static given static shapes, so XLA
constant-folds them).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _sincos_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] sin-cos table (fp32 numpy)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega  # [D/2]
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1).astype(np.float32)


def get_1d_sincos_pos_embed(embed_dim: int, length: int) -> np.ndarray:
    """[length, embed_dim] fixed sin-cos table."""
    return _sincos_from_grid(embed_dim, np.arange(length, dtype=np.float32))


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    """[grid_size**2 (+1), embed_dim] — half the dim encodes H, half W."""
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (matches reference)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    # first half of the dim encodes H (grid[1]), second half W (grid[0]) —
    # reference utils/pos_embed.py:65-74; the order matters for weight parity
    emb_h = _sincos_from_grid(embed_dim // 2, grid[1])
    emb_w = _sincos_from_grid(embed_dim // 2, grid[0])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate(
            [np.zeros([1, embed_dim], dtype=np.float32), pos_embed], axis=0
        )
    return pos_embed


def resize_abs_pos_embed(
    pos_embed: jax.Array, src_size: int, tgt_size: int
) -> jax.Array:
    """Bicubic-resize a [src_size**2, C] grid pos-embed to [tgt_size**2, C].

    TPU analogue of the reference's `get_abs_pos` (pos_embed.py:16-45), used
    when running the ViT at a different resolution than pretraining.
    """
    if src_size == tgt_size:
        return pos_embed
    c = pos_embed.shape[-1]
    x = pos_embed.reshape(src_size, src_size, c).astype(jnp.float32)
    x = jax.image.resize(x, (tgt_size, tgt_size, c), method="cubic")
    return x.reshape(tgt_size * tgt_size, c).astype(pos_embed.dtype)
