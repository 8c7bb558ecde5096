"""Beam search over the cascaded LLM + TextDecoder, KV-cache native.

Re-design of the reference's patched HF beam search
(`monkey_patch/beam_search_monkey_patch.py:17-354`) + cascade wrapper: a
t5x-style fixed-shape beam search —

  * ``max(2, 1 + n_eos) * K`` candidates per step (the patch widens HF's 2K
    so K non-eos tokens always remain, beam_search_monkey_patch.py:263-268);
    finished hypotheses collected separately with HF length penalty
    ``cum_logprob / len ** alpha`` where ``len`` *excludes* the stopping eos
    (BeamHypotheses.add receives the pre-eos input_ids);
  * eos candidates enter the finished pool only when ranked < K among the
    step candidates (BeamSearchScorer.process's ``beam_token_rank`` gate);
  * finalize merges live beams (scored at full length) into the pool;
  * deviation from HF: the output keeps the *actual* stopping token (<eos>
    or <soi>) where HF finalize writes ``eos_token_id[0]``; downstream
    decode strips all eos ids so scores are unaffected, and the greedy path
    (the one the interleaved inference loop uses, mm_inference.yaml:52)
    needs the true <soi> to trigger image generation;
  * multi-eos (<eos> or <soi>, mm_interleaved.py:649-654);
  * beam reorder = gather on the preallocated cache
    (the `_reorder_cache` analogue, modeling_llama_mmfs.py:912-917);
  * returns only the newly generated tokens.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.llama import KVCache
from .text import TextGenerationConfig

NEG_INF = -1.0e7


def _tile_beams(x, K):
    """[B, ...] -> [B*K, ...] (repeat each row K times)."""
    return jnp.repeat(x, K, axis=0)


def _length_penalty(length, alpha: float):
    return jnp.power(length.astype(jnp.float32), alpha)


def beam_search(
    model,
    variables,
    mm_embeds: jax.Array,  # [B, L, C]
    attention_mask: jax.Array,  # [B, L]
    mmfs_values: Optional[jax.Array],
    cross_attention_mask: Optional[jax.Array],
    cfg: TextGenerationConfig,
) -> jax.Array:
    """Returns the best hypothesis' new tokens: [B, max_new_tokens]."""
    B, L, _ = mm_embeds.shape
    K = cfg.num_beams
    T = cfg.max_new_tokens
    vocab = model.cfg.llm.vocab_size
    eos = jnp.asarray(cfg.eos_token_ids)
    alpha = cfg.length_penalty
    # candidates per step: enough to guarantee K non-eos survivors
    # (beam_search_monkey_patch.py:263-268)
    C = max(2, 1 + len(cfg.eos_token_ids)) * K

    # ---- prefill on B rows, then tile the cache to B*K
    from .text import extract_vision_values

    from ..ops.ms_deform_attn import pallas_deform_inference

    cache = KVCache.create(model.cfg.llm, B, L + T)
    with pallas_deform_inference():
        (logits, _, cache), inters = model.apply(
            variables, mm_embeds, attention_mask, mmfs_values,
            cross_attention_mask, cache, method=model.lm_prefill,
            mutable=["intermediates"],
        )
    first_logp = jax.nn.log_softmax(
        logits[:, -1].astype(jnp.float32), axis=-1
    )  # [B, V]

    cache = KVCache(
        k=_tile_beams(cache.k.swapaxes(0, 1), K).swapaxes(0, 1),
        v=_tile_beams(cache.v.swapaxes(0, 1), K).swapaxes(0, 1),
        valid=_tile_beams(cache.valid, K),
        length=cache.length,
    )
    vvc = (extract_vision_values(model, inters)
           if mmfs_values is not None else None)
    if vvc is not None:
        # [n_cross, B, ...] -> tile beams along batch
        vvc = jnp.repeat(vvc, K, axis=1)
        mmfs_b = None
    else:
        mmfs_b = (_tile_beams(mmfs_values, K)
                  if mmfs_values is not None else None)
    xmask_b = (
        _tile_beams(cross_attention_mask[:, -1:, :], K)
        if cross_attention_mask is not None else None
    )

    def mask_eos(logp, step):
        if cfg.min_new_tokens <= 0:
            return logp
        eos_mask = jnp.zeros((vocab,), bool).at[eos].set(True)
        return jnp.where(
            (step < cfg.min_new_tokens) & eos_mask[None, :], NEG_INF, logp
        )

    # ---- step 0: top-C tokens of the first distribution; eos candidates
    # ranked < K enter the finished pool (HF BeamSearchScorer.process gate
    # `beam_token_rank >= group_size -> skip`), live beams = top-K non-eos.
    # An eos at step 0 yields a 0-length hypothesis: HF divides by 0**alpha
    # (== -inf for alpha > 0, score/1 for alpha == 0) — reproduced exactly.
    lp0 = mask_eos(first_logp, 0)
    scores0, tok0 = jax.lax.top_k(lp0, C)  # [B, C]
    is_eos0 = jnp.isin(tok0, eos)
    rank_ok0 = jnp.arange(C)[None, :] < K
    cand_ids0 = jnp.full((B, C, T), cfg.pad_token_id, jnp.int32)
    cand_ids0 = cand_ids0.at[:, :, 0].set(tok0)
    eos_len_off = 1 if cfg.lp_includes_eos else 0
    all_fin_scores0 = jnp.where(
        is_eos0 & rank_ok0,
        scores0 / _length_penalty(jnp.asarray(eos_len_off), alpha),
        NEG_INF,
    )
    fin_scores, fin_sel0 = jax.lax.top_k(all_fin_scores0, K)
    fin_ids = jnp.take_along_axis(cand_ids0, fin_sel0[:, :, None], axis=1)
    live_scores, live_sel0 = jax.lax.top_k(
        jnp.where(is_eos0, NEG_INF, scores0), K
    )
    live_ids = jnp.take_along_axis(cand_ids0, live_sel0[:, :, None], axis=1)

    def body(carry, step):
        live_ids, live_scores, fin_ids, fin_scores, cache = carry
        last = jax.lax.dynamic_index_in_dim(
            live_ids, step - 1, axis=2, keepdims=False
        )  # [B, K]
        step_logits, new_cache = model.apply(
            variables,
            last.reshape(B * K, 1),
            jnp.ones((B * K, 1), jnp.int32),
            mmfs_b,
            xmask_b,
            cache,
            vvc,
            method=model.lm_decode_step,
        )
        logp = jax.nn.log_softmax(
            step_logits[:, 0].astype(jnp.float32), axis=-1
        ).reshape(B, K, vocab)
        logp = mask_eos(logp.reshape(B * K, vocab), step).reshape(B, K, vocab)

        cand = live_scores[:, :, None] + logp  # [B, K, V]
        cand_flat = cand.reshape(B, K * vocab)
        top_scores, top_idx = jax.lax.top_k(cand_flat, C)  # [B, C]
        parent = top_idx // vocab
        token = top_idx % vocab
        is_eos = jnp.isin(token, eos)

        # gather parent prefixes
        def gather_rows(ids, parent):
            return jnp.take_along_axis(
                ids, parent[:, :, None], axis=1
            )

        cand_ids = gather_rows(live_ids, parent)  # [B, 2K, T]
        cand_ids = cand_ids.at[:, :, step].set(token)

        # --- finished pool update (eos candidates only from ranks < K,
        # matching BeamSearchScorer.process; the length-penalty divisor is
        # the hypothesis length *excluding* the eos == `step`)
        rank_ok = jnp.arange(C)[None, :] < K
        new_fin_scores = jnp.where(
            is_eos & rank_ok,
            top_scores / _length_penalty(step + eos_len_off, alpha),
            NEG_INF,
        )
        all_fin_scores = jnp.concatenate([fin_scores, new_fin_scores], axis=1)
        all_fin_ids = jnp.concatenate([fin_ids, cand_ids], axis=1)
        fin_scores2, fin_sel = jax.lax.top_k(all_fin_scores, K)
        fin_ids2 = jnp.take_along_axis(
            all_fin_ids, fin_sel[:, :, None], axis=1
        )

        # --- live beams: best K non-eos candidates
        live_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        live_scores2, live_sel = jax.lax.top_k(live_cand_scores, K)
        live_ids2 = jnp.take_along_axis(
            cand_ids, live_sel[:, :, None], axis=1
        )
        live_parent = jnp.take_along_axis(parent, live_sel, axis=1)  # [B, K]

        # --- cache reorder to follow the selected parents
        flat_parent = (
            jnp.arange(B)[:, None] * K + live_parent
        ).reshape(-1)
        cache2 = new_cache.reorder(flat_parent)

        return (live_ids2, live_scores2, fin_ids2, fin_scores2, cache2), None

    carry = (live_ids, live_scores, fin_ids, fin_scores, cache)
    (live_ids, live_scores, fin_ids, fin_scores, _), _ = jax.lax.scan(
        body, carry, jnp.arange(1, T)
    )

    # finalize (BeamSearchScorer.finalize): live beams join the pool scored
    # at full length T, best of (finished ∪ live) wins
    live_final = live_scores / _length_penalty(jnp.asarray(T), alpha)
    pool_scores = jnp.concatenate([fin_scores, live_final], axis=1)
    pool_ids = jnp.concatenate([fin_ids, live_ids], axis=1)
    out = jnp.take_along_axis(
        pool_ids, jnp.argmax(pool_scores, axis=1)[:, None, None], axis=1
    )[:, 0]

    # pad everything after the first eos (keep the eos itself)
    hit = jnp.isin(out, eos)
    after = jnp.cumsum(hit, axis=1) - hit.astype(jnp.int32) > 0
    return jnp.where(after, cfg.pad_token_id, out)
