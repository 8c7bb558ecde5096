"""Pallas flash attention for TPU.

The training/prefill hot path (the reference's flash-attn CUDA monkey patch,
`llama_flash_attn_train_monkey_patch.py:78-80`, and xformers swaps).  Wraps
the Pallas TPU flash-attention kernel shipped with JAX (BlockSizes tuned for
v5e VMEM) behind our [B, T, H, D] layout; `ops.attention.dot_product_attention`
dispatches here when shapes are TPU-friendly and falls back to the fused XLA
path otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flash_attention(
    q: jax.Array,  # [B, Tq, H, D]
    k: jax.Array,  # [B, Tk, H, D]
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    q_segment_ids: Optional[jax.Array] = None,  # [B, Tq]
    kv_segment_ids: Optional[jax.Array] = None,  # [B, Tk]
) -> jax.Array:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention as pallas_flash,
    )

    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale

    # The Pallas kernel wants lane-aligned head_dim.  ViT-L and the SD UNet
    # use head_dim 64 (the reference runs them through xformers,
    # `vit_adapter/xattn.py:70-72`, `decoders/sd.py:64-65`); zero-padding
    # D -> 128 is exact — padded Q/K columns contribute nothing to QK^T
    # (scale is already fixed from the true d above) and the padded output
    # columns are sliced off.  The MXU contracts 128 lanes per pass either
    # way, so the padding is ~free compared to the XLA fallback's
    # materialized [T, T] logits.
    d_pad = (-d) % 128
    if d_pad:
        pad = [(0, 0)] * (q.ndim - 1) + [(0, d_pad)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    segment_ids = None
    if q_segment_ids is not None:
        segment_ids = SegmentIds(
            q=q_segment_ids.astype(jnp.int32),
            kv=kv_segment_ids.astype(jnp.int32),
        )

    qt = q.swapaxes(1, 2)  # [B, H, T, D]
    kt = k.swapaxes(1, 2)
    vt = v.swapaxes(1, 2)

    tq, tk = qt.shape[2], kt.shape[2]
    blk = BlockSizes(
        block_q=min(512, tq),
        block_k_major=min(512, tk),
        block_k=min(512, tk),
        block_b=1,
        block_q_major_dkv=min(512, tq),
        block_k_major_dkv=min(512, tk),
        block_k_dkv=min(512, tk),
        block_q_dkv=min(512, tq),
        block_k_major_dq=min(512, tk),
        block_k_dq=min(512, tk),
        block_q_dq=min(512, tq),
    )
    out = pallas_flash(
        qt, kt, vt,
        segment_ids=segment_ids,
        causal=causal,
        sm_scale=scale,
        block_sizes=blk,
    )
    out = out.swapaxes(1, 2)
    if d_pad:
        out = out[..., :d]
    return out
