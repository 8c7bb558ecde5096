"""Static-shape token-stream ops for interleaved image-text sequences.

The reference builds these structures with data-dependent Python loops over
`nonzero()` results (`mm_interleaved.py:144-406`) — fine on GPU eager, but a
recompile/trace hazard under XLA.  Here every helper is a fixed-shape masked
computation over the padded ``[B, max_img]`` image axis:

  * images arrive padded per sequence (``image_tensors[B, max_img, ...]`` +
    ``num_image_per_seq``) instead of flattened-and-ragged;
  * positions of special tokens become scatter/cummax computations;
  * "nearest <bos>"/"previous image" relations become comparisons of those
    position tensors.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def token_positions(text_ids: jax.Array, token_id: int, max_count: int) -> jax.Array:
    """Positions of the k-th occurrence of ``token_id`` per row.

    Returns ``[B, max_count]`` int32; rows with fewer occurrences get the
    sentinel ``L`` (one past the end).  Occurrences beyond ``max_count`` are
    dropped.
    """
    B, L = text_ids.shape
    hit = text_ids == token_id
    k = jnp.cumsum(hit, axis=-1) - 1  # occurrence index at each position
    k = jnp.where(hit & (k < max_count), k, max_count)  # overflow column
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
    out = jnp.full((B, max_count + 1), L, dtype=jnp.int32)
    out = out.at[jnp.arange(B)[:, None], k].set(pos, mode="drop")
    return out[:, :max_count]


def nearest_bos_positions(text_ids: jax.Array, bos_token_id: int) -> jax.Array:
    """For each position, the index of the nearest preceding (or equal) <bos>;
    -1 where no <bos> yet (reference mm_interleaved.py:208-212)."""
    B, L = text_ids.shape
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))
    marked = jnp.where(text_ids == bos_token_id, pos, -1)
    return jax.lax.cummax(marked, axis=1)


def scatter_image_embeds(
    text_embeds: jax.Array,  # [B, L, C]
    text_ids: jax.Array,  # [B, L]
    vis_embed: jax.Array,  # [B, max_img, num_img_token, C]
    image_token_id: int,
) -> jax.Array:
    """Replace every ``<|image|>`` token embedding with the corresponding
    visual query embedding (reference mm_interleaved.py:144-159).

    The j-th image placeholder of a row maps to image ``j // num_img_token``,
    slot ``j % num_img_token``.
    """
    B, L, C = text_embeds.shape
    _, max_img, n_tok, _ = vis_embed.shape
    is_img = text_ids == image_token_id
    j = jnp.cumsum(is_img, axis=-1) - 1  # flat image-token index
    j = jnp.maximum(j, 0)
    img_idx = jnp.clip(j // n_tok, 0, max_img - 1)
    slot_idx = j % n_tok
    gathered = vis_embed[
        jnp.arange(B)[:, None], img_idx, slot_idx
    ]  # [B, L, C]
    return jnp.where(is_img[..., None], gathered.astype(text_embeds.dtype),
                     text_embeds)


def add_soi_embeds(
    mm_embeds: jax.Array, text_ids: jax.Array, soi_embed: jax.Array,
    soi_token_id: int,
) -> jax.Array:
    """Add the learnable <soi> embedding at every <soi> position
    (reference mm_interleaved.py:161-169)."""
    is_soi = (text_ids == soi_token_id)[..., None]
    return mm_embeds + is_soi.astype(mm_embeds.dtype) * soi_embed[None, None, :]


def mm_cross_attention_mask(
    text_ids: jax.Array,
    num_image_per_seq: jax.Array,
    soi_token_id: int,
    bos_token_id: int,
    max_img: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-token x per-image causal cross-attention mask for the LLM's MMFS
    layers (reference mm_interleaved.py:185-221).

    Token t attends to image k iff the image's first token (soi+1) lies in
    ``(nearest_bos(t), t]`` and k is a real image of the row.

    Returns (mask ``[B, L, max_img]`` int32, soi_pos ``[B, max_img]``).
    """
    B, L = text_ids.shape
    soi_pos = token_positions(text_ids, soi_token_id, max_img)
    img_pos = soi_pos + 1  # [B, max_img]; sentinel -> L+1 (never visible)
    near_bos = nearest_bos_positions(text_ids, bos_token_id)  # [B, L]
    t = jnp.arange(L, dtype=jnp.int32)[None, :, None]
    ip = img_pos[:, None, :]
    k_valid = (
        jnp.arange(max_img, dtype=jnp.int32)[None, None, :]
        < num_image_per_seq[:, None, None]
    )
    mask = (ip > near_bos[:, :, None]) & (ip <= t) & k_valid
    return mask.astype(jnp.int32), soi_pos


def context_windows(
    hidden: jax.Array,  # [B, L, C]
    soi_pos: jax.Array,  # [B, max_img]
    near_bos: jax.Array,  # [B, L]
    num_image_per_seq: jax.Array,  # [B]
    max_ctx: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-image reversed context window (reference mm_interleaved.py:254-293).

    Window j of image k is ``hidden[soi_pos_k - j]`` for
    ``j in [0, soi_pos_k - bos_k]`` (index 0 = the <soi> token itself, i.e.
    the reference's ``flip``), zero elsewhere.

    Returns (ctx ``[B, max_img, max_ctx, C]``, mask ``[B, max_img, max_ctx]``).
    """
    B, L, C = hidden.shape
    max_img = soi_pos.shape[1]
    safe_soi = jnp.clip(soi_pos, 0, L - 1)
    bos_at_soi = jnp.take_along_axis(near_bos, safe_soi, axis=1)  # [B, max_img]
    bos_at_soi = jnp.maximum(bos_at_soi, 0)
    ctx_len = safe_soi - bos_at_soi + 1  # [B, max_img]

    j = jnp.arange(max_ctx, dtype=jnp.int32)
    idx = safe_soi[:, :, None] - j[None, None, :]  # [B, max_img, max_ctx]
    valid = (
        (j[None, None, :] < ctx_len[:, :, None])
        & (soi_pos[:, :, None] < L)
        & (
            jnp.arange(max_img, dtype=jnp.int32)[None, :, None]
            < num_image_per_seq[:, None, None]
        )
    )
    idx = jnp.clip(idx, 0, L - 1)
    ctx = jnp.take_along_axis(
        jnp.broadcast_to(hidden[:, None], (B, max_img, L, C)),
        idx[..., None],
        axis=2,
    )
    ctx = jnp.where(valid[..., None], ctx, 0.0)
    return ctx, valid.astype(jnp.int32)


def previous_image_mask(
    soi_pos: jax.Array,  # [B, max_img]
    near_bos: jax.Array,  # [B, L]
    num_image_per_seq: jax.Array,  # [B]
    L: int,
) -> jax.Array:
    """Which target images have a usable *immediately preceding* image.

    The reference's tril/triu dance (`mm_interleaved.py:326-328`) reduces to:
    target image k sees image k-1 iff k-1 exists and image k-1's <soi> is at
    or after the nearest <bos> of image k's <soi> (same packed document).

    Returns ``[B, max_img]`` int32 (1 = the k-1 pyramid is in context for k).
    """
    B, max_img = soi_pos.shape
    safe_soi = jnp.clip(soi_pos, 0, L - 1)
    bos_at_soi = jnp.maximum(
        jnp.take_along_axis(near_bos, safe_soi, axis=1), 0
    )
    prev_soi = jnp.roll(soi_pos, 1, axis=1)  # [B, max_img]; col 0 invalid
    k = jnp.arange(max_img, dtype=jnp.int32)[None, :]
    has_prev = (k >= 1) & (k < num_image_per_seq[:, None])
    in_doc = prev_soi >= bos_at_soi
    cur_valid = soi_pos < L
    return (has_prev & in_doc & cur_valid & (prev_soi < L)).astype(jnp.int32)


def prepare_gt_text_ids(
    text_ids: jax.Array,
    attention_mask: jax.Array,
    special: dict,
    ignore_prompt_token_offset: jax.Array | int = 0,
    ignore_noimage_cond_loss: bool = False,
) -> jax.Array:
    """Next-token labels with the reference's masking rules
    (`mm_interleaved.py:342-406`): -100 on prompt offsets, pads, image
    placeholders, <bos>, bos->soi transitions, and (optionally) tokens with no
    preceding image in their document.

    Returns ``[B, L-1]`` labels aligned with logits[:, :-1].
    """
    B, L = text_ids.shape
    gt = text_ids
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    offset = jnp.asarray(ignore_prompt_token_offset, jnp.int32)
    if offset.ndim == 0:
        offset = jnp.full((B,), offset, jnp.int32)
    gt = jnp.where(pos < offset[:, None], -100, gt)

    if ignore_noimage_cond_loss:
        near_bos = jnp.maximum(
            nearest_bos_positions(text_ids, special["bos_token_id"]), 0
        )
        marked = jnp.where(
            text_ids == special["soi_token_id"], pos, -1
        )
        near_soi = jax.lax.cummax(marked, axis=1)
        noimage_cond = (near_soi < near_bos) | (near_soi == -1)
        gt = jnp.where(noimage_cond, -100, gt)

    gt = gt[:, 1:]
    nxt = text_ids[:, 1:]
    gt = jnp.where(nxt == special["pad_token_id"], -100, gt)
    gt = jnp.where(nxt == special["image_token_id"], -100, gt)
    gt = jnp.where(attention_mask[:, 1:] == 0, -100, gt)
    is_bos2soi = (text_ids[:, :-1] == special["bos_token_id"]) & (
        nxt == special["soi_token_id"]
    )
    gt = jnp.where(is_bos2soi, -100, gt)
    gt = jnp.where(nxt == special["bos_token_id"], -100, gt)
    return gt


def cross_entropy_ignore(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Mean CE over non-ignored positions, fp32 (reference uses
    ``F.cross_entropy(..., reduction='mean')`` with -100 ignore)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe = jnp.maximum(labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
