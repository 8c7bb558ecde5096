"""Beam-search semantics diff vs HuggingFace transformers on a tiny model.

The reference generates through HF `generate(input_ids=None, inputs_embeds=…)`
with the patched beam search (beam_search_monkey_patch.py:17-354).  These
tests run the *actual* HF generate on a tiny torch Llama and our
`beam_search` / `generate_tokens` on the converted weights, and require
token-identical output across length penalties, min-length masking,
multi-eos early stop, and repetition penalty.

One documented deviation (see beam.py docstring): HF finalize writes
`eos_token_id[0]` where the hypothesis actually stopped on a different eos;
we keep the true stopping token.  The comparison therefore canonicalises
every eos id to eos[0] first.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import flax.linen as nn

from mm_interleaved_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    LlamaModel,
    TextDecoder,
)
from mm_interleaved_tpu.generation.beam import beam_search
from mm_interleaved_tpu.generation.text import (
    TextGenerationConfig,
    generate_tokens,
)
from mm_interleaved_tpu.utils.convert_hf import (
    convert_llama,
    convert_text_decoder,
    merge_params,
)

VOCAB = 64
PAD = 0


class _Cfg:
    def __init__(self, llm):
        self.llm = llm


class CascadeLM(nn.Module):
    """Minimal lm_prefill/lm_decode_step cascade (LLM + TextDecoder) with the
    same interface `beam_search`/`generate_tokens` drive on MMInterleaved."""

    llm: LlamaConfig

    @property
    def cfg(self):
        return _Cfg(self.llm)

    def setup(self):
        self.mm_decoder = LlamaModel(self.llm)
        self.text_decoder = TextDecoder(self.llm, orig_vocab_size=VOCAB)

    def embed(self, ids):
        return self.mm_decoder.embed(ids)

    def lm_prefill(self, mm_embeds, attention_mask, mmfs_values,
                   cross_attention_mask, cache: KVCache):
        hidden, cache = self.mm_decoder(
            mm_embeds, attention_mask=attention_mask, cache=cache
        )
        return self.text_decoder(hidden), hidden, cache

    def lm_decode_step(self, token_ids, attention_mask, mmfs_values,
                       cross_attention_mask, cache: KVCache,
                       vision_value_cache=None):
        embeds = self.mm_decoder.embed(token_ids)
        hidden, cache = self.mm_decoder(
            embeds, attention_mask=attention_mask, cache=cache
        )
        return self.text_decoder(hidden), cache


@pytest.fixture(scope="module")
def models():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        attn_implementation="eager",
    )
    torch.manual_seed(7)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64,
        cross_attention_frequency=100,  # no cross-attn layers
        image_embed_dim=8, spatial_shapes=(2,),
    )
    model = CascadeLM(cfg)

    ids = np.array([[1, 5, 9, 23, 41, 2],
                    [1, 30, 17, 60, 11, 4]], dtype=np.int32)
    p0 = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        method=lambda m, i: m.lm_prefill(
            m.embed(i), jnp.ones_like(i),
            None, None, KVCache.create(m.llm, i.shape[0], i.shape[1] + 4),
        ),
    )
    converted = {
        "mm_decoder": convert_llama(
            {k: v.detach().numpy() for k, v in hf.state_dict().items()},
            num_layers=2,
        ),
        "text_decoder": convert_text_decoder(
            hf.state_dict()["lm_head.weight"].numpy(), VOCAB, VOCAB
        ),
    }
    params = {"params": merge_params(p0["params"], converted)}
    return hf, model, params, ids


def _hf_beam(hf, ids, gen_cfg: TextGenerationConfig, **extra):
    with torch.no_grad():
        embeds = hf.get_input_embeddings()(torch.tensor(ids, dtype=torch.long))
        out = hf.generate(
            input_ids=None,
            inputs_embeds=embeds,
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
            do_sample=False,
            num_beams=gen_cfg.num_beams,
            max_new_tokens=gen_cfg.max_new_tokens,
            min_new_tokens=gen_cfg.min_new_tokens,
            length_penalty=gen_cfg.length_penalty,
            eos_token_id=list(gen_cfg.eos_token_ids),
            pad_token_id=gen_cfg.pad_token_id,
            early_stopping=False,
            repetition_penalty=gen_cfg.repetition_penalty,
            **extra,
        )
    return out.numpy()


def _ours_beam(model, params, ids, gen_cfg: TextGenerationConfig):
    embeds = model.apply(params, jnp.asarray(ids),
                         method=lambda m, i: m.embed(i))
    mask = jnp.ones(ids.shape, jnp.int32)
    if gen_cfg.num_beams > 1:
        out = beam_search(model, params, embeds, mask, None, None, gen_cfg)
    else:
        out = generate_tokens(model, params, embeds, mask, None, None,
                              gen_cfg)
    return np.asarray(out)


def _canon(tokens, gen_cfg: TextGenerationConfig):
    """Pad to max_new_tokens; map any eos id -> eos[0]; pad after first eos."""
    T = gen_cfg.max_new_tokens
    out = np.full((tokens.shape[0], T), gen_cfg.pad_token_id, np.int64)
    out[:, : tokens.shape[1]] = tokens[:, :T]
    eos = np.asarray(gen_cfg.eos_token_ids)
    hit = np.isin(out, eos)
    out[hit] = gen_cfg.eos_token_ids[0]
    after = np.cumsum(hit, axis=1) - hit.astype(np.int64) > 0
    out[after] = gen_cfg.pad_token_id
    return out


def _check(models, gen_cfg):
    hf, model, params, ids = models
    hf_out = _hf_beam(hf, ids, gen_cfg)
    ours = _ours_beam(model, params, ids, gen_cfg)
    np.testing.assert_array_equal(
        _canon(hf_out, gen_cfg), _canon(ours, gen_cfg)
    )


def test_beam_no_eos_lp1(models):
    _check(models, TextGenerationConfig(
        max_new_tokens=7, num_beams=3, eos_token_ids=(63,),
        pad_token_id=PAD, length_penalty=1.0,
    ))


def test_beam_length_penalties(models):
    for lp in (0.0, 2.0):
        _check(models, TextGenerationConfig(
            max_new_tokens=6, num_beams=3, eos_token_ids=(63,),
            pad_token_id=PAD, length_penalty=lp,
        ))


def test_beam_multi_eos_early_stop(models):
    """Pick eos ids from the unconstrained run so stopping actually fires."""
    hf, model, params, ids = models
    free = TextGenerationConfig(
        max_new_tokens=7, num_beams=3, eos_token_ids=(63,), pad_token_id=PAD,
    )
    tokens = _hf_beam(hf, ids, free)
    # tokens generated at step >= 2 become eos candidates
    cand = [int(t) for t in tokens[:, 2:].reshape(-1) if t not in (PAD, 63)]
    assert cand, "unconstrained run produced only pad?"
    eos_ids = tuple(dict.fromkeys(cand))[:2]
    # the in-image transformers (>= 4.49) includes the stopping eos in the
    # length-penalty divisor; the reference's 4.31 excludes it (the default)
    _check(models, TextGenerationConfig(
        max_new_tokens=7, num_beams=3, eos_token_ids=eos_ids,
        pad_token_id=PAD, min_new_tokens=2, length_penalty=1.0,
        lp_includes_eos=True,
    ))


def test_greedy_repetition_penalty_matches_hf(models):
    """Greedy path: repetition penalty sees only generated tokens (HF seeds
    input_ids as an empty [B, 0] tensor when inputs_embeds is used)."""
    _check(models, TextGenerationConfig(
        max_new_tokens=10, num_beams=1, eos_token_ids=(63,),
        pad_token_id=PAD, repetition_penalty=1.3,
    ))


def test_greedy_min_new_tokens_matches_hf(models):
    hf, model, params, ids = models
    free = TextGenerationConfig(
        max_new_tokens=8, num_beams=1, eos_token_ids=(63,), pad_token_id=PAD,
    )
    tokens = _hf_beam(hf, ids, free)
    eos_ids = (int(tokens[0, 1]),)  # stops row 0 at step 1 unless masked
    _check(models, TextGenerationConfig(
        max_new_tokens=8, num_beams=1, eos_token_ids=eos_ids,
        pad_token_id=PAD, min_new_tokens=4,
    ))
