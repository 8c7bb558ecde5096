"""Text generation runtime: jitted prefill + fixed-length scan decode.

Replaces HF `.generate()` + the reference's beam-search monkey patch
(`monkey_patch/beam_search_monkey_patch.py:17-354`) and the cascade wrapper
(`models/utils/causal_lm_cascade.py:58-211`):

  * preallocated KV cache (no per-step concat / recompile);
  * decode steps use the *last prompt row* of the per-token image-visibility
    mask, matching MMFS's decode-path slicing (reference mmfs.py:162,214-215);
  * multi-eos stopping (<eos> or <soi>, reference mm_interleaved.py:649-654);
  * returns only the newly generated tokens (the patched-beam-search
    semantics);
  * greedy, temperature/nucleus sampling, repetition penalty, min-length;
    beam search in :mod:`beam`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.llama import KVCache


@dataclasses.dataclass(frozen=True)
class TextGenerationConfig:
    max_new_tokens: int = 30
    min_new_tokens: int = 0
    do_sample: bool = False
    top_p: float = 0.9
    temperature: float = 1.0
    repetition_penalty: float = 1.0
    num_beams: int = 1
    length_penalty: float = 1.0
    # transformers 4.31 (the reference's pinned version) divides a finished
    # hypothesis' score by its length *excluding* the stopping eos
    # (BeamHypotheses.add receives the pre-eos input_ids); transformers
    # >= 4.49's vectorized beam search divides by the length *including* it
    # (`cur_len + 1 - decoder_prompt_len`).  Default reproduces the
    # reference; flip for modern-HF semantics (oracle-tested in
    # tests/test_beam_hf.py).
    lp_includes_eos: bool = False
    eos_token_ids: Tuple[int, ...] = (2,)
    pad_token_id: int = 0


def _apply_repetition_penalty(logits, presence, penalty: float):
    """HF semantics: logits>0 divided by penalty, logits<0 multiplied, for
    tokens already present in the sequence."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def _mask_eos_before_min(logits, new_len, cfg: TextGenerationConfig):
    if cfg.min_new_tokens <= 0:
        return logits
    neg = jnp.finfo(logits.dtype).min
    block = new_len < cfg.min_new_tokens
    eos = jnp.asarray(cfg.eos_token_ids)
    mask = jnp.zeros(logits.shape[-1], bool).at[eos].set(True)
    return jnp.where(block & mask[None, :], neg, logits)


def _sample_token(logits, rng, cfg: TextGenerationConfig):
    """logits: [B, V] fp32 -> [B] int32."""
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_mask = cum - probs > cfg.top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1,
            keepdims=True,
        )
        logits = jnp.where(
            logits < cutoff_logit, jnp.finfo(logits.dtype).min, logits
        )
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def extract_vision_values(model, inters) -> Optional[jax.Array]:
    """Stack the prefill-sown per-cross-layer MMFS value projections
    ([n_cross, B, n_img, hw, d]) for reuse across decode steps."""
    cfg = model.cfg.llm
    md = inters.get("intermediates", {}).get("mm_decoder")
    if md is None:
        return None
    if cfg.scan_layers:
        # nn.scan stacks the sown value over blocks: already the
        # [n_cross(=n_blocks), B, n_img, hw, d] cache layout
        try:
            return md["block"]["layer_0"]["llama_cross_attn"]["attn"][
                "projected_value"][0]
        except KeyError:
            return None
    vals = []
    for i in range(cfg.num_hidden_layers):
        if cfg.has_cross_attn(i):
            try:
                vals.append(
                    md[f"layers_{i}"]["llama_cross_attn"]["attn"]
                    ["projected_value"][0]
                )
            except KeyError:
                return None
    return jnp.stack(vals) if vals else None


def generate_tokens(
    model,
    variables,
    mm_embeds: jax.Array,  # [B, L, C] prompt embeddings (images scattered)
    attention_mask: jax.Array,  # [B, L]
    mmfs_values: Optional[jax.Array],
    cross_attention_mask: Optional[jax.Array],  # [B, L, n_img]
    cfg: TextGenerationConfig,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Greedy/nucleus decoding. Returns new tokens ``[B, max_new_tokens]``
    (padded with ``pad_token_id`` after stop)."""
    B, L, _ = mm_embeds.shape
    vocab = model.cfg.llm.vocab_size
    max_len = L + cfg.max_new_tokens
    if rng is None:
        rng = jax.random.PRNGKey(0)

    from ..ops.ms_deform_attn import pallas_deform_inference

    cache = KVCache.create(model.cfg.llm, B, max_len)
    with pallas_deform_inference():
        (logits, _, cache), inters = model.apply(
            variables, mm_embeds, attention_mask, mmfs_values,
            cross_attention_mask, cache, method=model.lm_prefill,
            mutable=["intermediates"],
        )
    vision_value_cache = (
        extract_vision_values(model, inters)
        if mmfs_values is not None else None
    )
    if vision_value_cache is not None:
        # [n_cross, B, n_img, hw, d]: batch over data axes, projected value
        # channels over `tensor` (matching the value_proj column split)
        from ..parallel.inference import constrain

        vision_value_cache = constrain(
            vision_value_cache, None, ("data", "fsdp"), None, None, "tensor"
        )
    last_logits = logits[:, -1].astype(jnp.float32)

    # decode steps reuse the image-visibility of the last prompt position
    decode_cross_mask = (
        cross_attention_mask[:, -1:, :]
        if cross_attention_mask is not None else None
    )

    presence0 = jnp.zeros((B, vocab), bool)
    # repetition penalty sees only *generated* tokens: the reference calls
    # HF generate with input_ids=None + inputs_embeds (mm_interleaved.py:
    # 640-641), and transformers seeds input_ids as an empty [B, 0] tensor
    # in that case (_maybe_initialize_input_ids_for_generation), so the
    # RepetitionPenaltyLogitsProcessor never sees prompt tokens.

    eos = jnp.asarray(cfg.eos_token_ids)

    def pick(logits_f, presence, new_len, r):
        logits_f = _apply_repetition_penalty(
            logits_f, presence, cfg.repetition_penalty
        )
        logits_f = _mask_eos_before_min(logits_f, new_len, cfg)
        return _sample_token(logits_f, r, cfg)

    rng, r0 = jax.random.split(rng)
    tok0 = pick(last_logits, presence0, jnp.int32(0), r0)
    finished0 = jnp.isin(tok0, eos)
    presence0 = presence0.at[jnp.arange(B), tok0].set(True)

    def body(carry, step_rng):
        tokens, cache, finished, presence, new_len = carry
        step_logits, cache = model.apply(
            variables,
            tokens[:, None],
            jnp.ones((B, 1), jnp.int32),
            None if vision_value_cache is not None else mmfs_values,
            decode_cross_mask,
            cache,
            vision_value_cache,
            method=model.lm_decode_step,
        )
        nxt = pick(
            step_logits[:, 0].astype(jnp.float32), presence, new_len, step_rng
        )
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        now_finished = finished | jnp.isin(nxt, eos)
        presence = presence.at[jnp.arange(B), nxt].set(True)
        return (nxt, cache, now_finished, presence, new_len + 1), nxt

    step_rngs = jax.random.split(rng, cfg.max_new_tokens - 1)
    carry = (tok0, cache, finished0, presence0, jnp.int32(1))
    _, rest = jax.lax.scan(body, carry, step_rngs)

    out = jnp.concatenate([tok0[:, None], rest.T], axis=1)
    # replace everything after the first eos with pad (but keep the eos)
    hit = jnp.isin(out, eos)
    after = jnp.cumsum(hit, axis=1) - hit.astype(jnp.int32) > 0
    return jnp.where(after, cfg.pad_token_id, out)


def generate_texts(
    model,
    variables,
    text_ids: jax.Array,
    image_tensors: jax.Array,
    num_image_per_seq: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    cfg: TextGenerationConfig = TextGenerationConfig(),
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """End-to-end `generate_texts` (reference mm_interleaved.py:598-664):
    encode images, scatter into the prompt, decode new tokens."""
    from ..ops.ms_deform_attn import pallas_deform_inference

    if attention_mask is None:
        attention_mask = (
            text_ids != model.cfg.special.pad_token_id
        ).astype(jnp.int32)
    with pallas_deform_inference():
        prep = model.apply(
            variables, text_ids, image_tensors, num_image_per_seq,
            method=model.prepare_mm_embeds,
        )
    if cfg.num_beams > 1:
        from .beam import beam_search

        return beam_search(
            model, variables, prep["mm_embeds"], attention_mask,
            prep["mmfs_values"], prep["cross_attention_mask"], cfg,
        )
    return generate_tokens(
        model, variables, prep["mm_embeds"], attention_mask,
        prep["mmfs_values"], prep["cross_attention_mask"], cfg, rng,
    )
