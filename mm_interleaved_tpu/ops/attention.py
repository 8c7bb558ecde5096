"""Scaled dot-product attention with fp32 softmax.

Replaces the reference's three attention backends — flash-attn CUDA kernels
for LLaMA training (`monkey_patch/llama_flash_attn_train_monkey_patch.py`),
xformers `memory_efficient_attention` for the CLIP ViT (`vit_adapter/xattn.py`)
and the SD UNet (`decoders/sd.py:64-65`) — with one entry point.  On TPU the
hot path dispatches to a Pallas flash-attention kernel
(`ops/flash_attention.py`); everywhere else (CPU tests, odd shapes) it uses a
fused-by-XLA jnp implementation with identical semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _use_pallas(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # Pallas kernel needs lane-aligned tiles: head_dim 128-aligned (64 is
    # zero-padded to 128 inside ops/flash_attention.py — exact) and both
    # sequence lengths divisible by the block size (ViT's T=257 stays on
    # the XLA path).
    *_, tq, h, d = q.shape
    tk = k.shape[-3]
    if not (d % 128 == 0 or d == 64):
        return False
    return tq >= 256 and tq % 128 == 0 and tk % 128 == 0


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    allow_pallas: bool = True,
) -> jax.Array:
    """Multi-head attention.

    Args:
      q: ``[B, Tq, H, D]``.
      k, v: ``[B, Tk, H, D]`` (H may be 1 for MQA-style broadcast).
      bias: optional additive bias broadcastable to ``[B, H, Tq, Tk]``.
      mask: optional boolean mask broadcastable to ``[B, H, Tq, Tk]``;
        True = attend.
      causal: apply causal masking (query i attends keys <= i, aligned to the
        *end* of the key sequence so it composes with prefix KV caches).
      scale: overrides the default ``1/sqrt(D)``.
      q_segment_ids / kv_segment_ids: ``[B, Tq]`` / ``[B, Tk]`` int segments;
        attention only within equal segments.  Prefer these over a dense
        ``mask`` for padding — they keep the Pallas flash path eligible.
    """
    if (allow_pallas and _use_pallas(q, k) and bias is None and mask is None):
        try:
            from .flash_attention import flash_attention

            return flash_attention(
                q, k, v, causal=causal, scale=scale,
                q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            )
        except Exception:
            pass  # fall through to the XLA path

    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale

    # big [B, H, Tq, Tk] fp32 logits (UNet 64px: >5 GB at CFG batch) get
    # query-chunked: same math, peak memory / n_chunks.  Keeps the XLA
    # fallback's memory model aligned with the Pallas flash path — the
    # flagship AOT fit check (tests/test_flagship_aot.py) lowers on the CPU
    # backend where this fallback IS the compiled program.
    chunk = _query_chunk(q, k, bias, mask)
    if chunk:
        n = q.shape[1] // chunk
        qs = jnp.moveaxis(
            q.reshape(q.shape[0], n, chunk, *q.shape[2:]), 1, 0
        )
        segs = (
            jnp.moveaxis(
                q_segment_ids.reshape(q.shape[0], n, chunk), 1, 0
            )
            if q_segment_ids is not None else None
        )

        def body(i):
            # helper end-aligns causally using the CHUNK length; shift so
            # global row i*chunk+r compares as r + offset + (Tk - chunk)
            # == i*chunk + r + (Tk - Tq_full)
            return _xla_attention(
                qs[i], k, v, None, None, causal, scale,
                segs[i] if segs is not None else None, kv_segment_ids,
                q_offset=(i + 1) * chunk - q.shape[1],
            )

        out = jax.lax.map(body, jnp.arange(n))
        return jnp.moveaxis(out, 0, 1).reshape(q.shape)

    return _xla_attention(
        q, k, v, bias, mask, causal, scale, q_segment_ids, kv_segment_ids
    )


def _query_chunk(q, k, bias, mask, budget_bytes=1 << 28):
    """Power-of-two query chunk keeping fp32 logits under ``budget_bytes``;
    0 = no chunking (small logits, dense bias/mask present, or Tq not
    chunkable)."""
    if bias is not None or mask is not None:
        return 0
    b, tq, h, _ = q.shape
    tk = k.shape[1]
    if b * h * tq * tk * 4 <= budget_bytes:
        return 0
    chunk = tq
    while chunk > 128 and (
        b * h * chunk * tk * 4 > budget_bytes or tq % chunk
    ):
        chunk //= 2
    if tq % chunk or chunk == tq:
        return 0
    return chunk


def _xla_attention(q, k, v, bias, mask, causal, scale,
                   q_segment_ids, kv_segment_ids, q_offset: int = 0):
    dtype = q.dtype
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)

    neg = jnp.finfo(jnp.float32).min
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        # global query index: chunk offset + end-aligned causal shift
        qi = jnp.arange(tq)[:, None] + q_offset + (tk - tq)
        ki = jnp.arange(tk)[None, :]
        logits = jnp.where(ki <= qi, logits, neg)
    if q_segment_ids is not None:
        seg = (
            q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        )[:, None]
        logits = jnp.where(seg, logits, neg)
    if mask is not None:
        logits = jnp.where(mask, logits, neg)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)
