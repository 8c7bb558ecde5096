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

    # head_dim handling: the kernel takes D=64 (ViT-L / SD UNet; the
    # reference runs those through xformers, `vit_adapter/xattn.py:70-72`,
    # `decoders/sd.py:64-65`) directly — Mosaic reads 64-wide tiles without
    # an HBM pad copy, measured faster than explicit zero-pad to 128
    # (1.25 vs 1.43 ms at T=4096; /tmp round-4 attention sweep, PERF.md).
    # Other sub-128 widths still zero-pad (exact: padded Q/K columns
    # contribute nothing to QK^T; padded output columns sliced off).
    d_pad = 0 if d == 64 else (-d) % 128
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

    def fit(cap, t):
        # largest power-of-two block <= cap that divides t
        b = cap
        while b > 128 and t % b:
            b //= 2
        return min(b, t)

    # forward blocks: bq=1024/bk=2048 won the v5e sweep at T=4096 d=64
    # (deeper k-loop amortizes the per-block softmax state); backward
    # blocks stay 512 (dkv/dq hold more live tiles in VMEM)
    blk = BlockSizes(
        block_q=fit(1024, tq),
        block_k_major=fit(2048, tk),
        block_k=fit(2048, tk),
        block_b=1,
        block_q_major_dkv=fit(512, tq),
        block_k_major_dkv=fit(512, tk),
        block_k_dkv=fit(512, tk),
        block_q_dkv=fit(512, tq),
        block_k_major_dq=fit(512, tk),
        block_k_dq=fit(512, tk),
        block_q_dq=fit(512, tq),
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
