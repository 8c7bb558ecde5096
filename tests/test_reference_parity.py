"""End-to-end cross-framework parity: the PyTorch *reference itself* run on
CPU (with its pure-torch deformable fallback) vs our flax modules, through
the converter pipeline used for real checkpoints.

This is the numerical contract for loading released MM-Interleaved weights:
the reference `LlamaModel` with MMFS cross-attention every N layers
(modeling_llama_mmfs.py:567-755) must produce the same hidden states as our
`LlamaModel` after `convert_llama` (which now covers `llama_cross_attn.*`),
and the reference dual-head `TextDecoder` (decoder_text.py:28-163) the same
logits as ours after `convert_text_decoder`.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from mm_interleaved_tpu.models.llama import (
    LlamaConfig,
    LlamaModel,
    TextDecoder,
)
from mm_interleaved_tpu.utils.convert_hf import (
    convert_llama,
    convert_text_decoder,
    merge_params,
)

from _reference import load_reference_llama, load_reference_text_decoder


def _tiny_ref_config():
    from transformers import LlamaConfig as HFLlamaConfig

    cfg = HFLlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
    )
    cfg.image_embed_dim = 16
    cfg.cross_attention_frequency = 2
    cfg.spatial_shapes = [8, 4]
    return cfg


def _our_config():
    return LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        max_position_embeddings=64,
        cross_attention_frequency=2,
        image_embed_dim=16,
        spatial_shapes=(8, 4),
        mmfs_heads=16,  # reference hard-codes n_heads=16 (:327)
        mmfs_points=8,
    )


@pytest.mark.slow
def test_llama_mmfs_hidden_states_match_reference():
    ref_mod = load_reference_llama()
    hf_cfg = _tiny_ref_config()
    torch.manual_seed(0)
    ref = ref_mod.LlamaModel(hf_cfg).eval()
    # make gates + offsets non-trivial so the MMFS path actually contributes
    with torch.no_grad():
        for layer in ref.layers:
            if layer.llama_cross_attn is not None:
                layer.llama_cross_attn.gate.fill_(0.7)
                layer.llama_cross_attn.attn.ignore_token.normal_(std=0.5)
                layer.llama_cross_attn.attn.attention_weights.bias.normal_(
                    std=0.3
                )

    B, L, n_img = 2, 12, 2
    S = 8 * 8 + 4 * 4
    g = torch.Generator().manual_seed(1)
    ids = torch.randint(3, 60, (B, L), generator=g)
    vis = torch.randn(B, n_img, S, 16, generator=g)
    cross_mask = torch.zeros(B, L, n_img)
    cross_mask[:, 4:, 0] = 1
    cross_mask[0, 9:, 1] = 1

    with torch.no_grad():
        ref_out = ref(
            input_ids=ids,
            attention_mask=torch.ones(B, L, dtype=torch.long),
            vision_hidden_states=vis,
            cross_attention_mask=cross_mask,
        ).last_hidden_state.numpy()

    cfg = _our_config()
    model = LlamaModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, L, cfg.hidden_size), jnp.float32),
        vision_hidden_states=jnp.zeros((B, n_img, S, 16), jnp.float32),
        cross_attention_mask=jnp.zeros((B, L, n_img), jnp.int32),
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_llama(sd, num_layers=4, prefix="")
    params = merge_params(variables["params"], converted)

    def fwd(params, ids, vis, cmask):
        embeds = model.apply({"params": params}, ids, method=LlamaModel.embed)
        h, _ = model.apply(
            {"params": params},
            embeds,
            attention_mask=jnp.ones((B, L), jnp.int32),
            vision_hidden_states=vis,
            cross_attention_mask=cmask,
        )
        return h

    ours = np.asarray(
        jax.jit(fwd)(
            params,
            jnp.asarray(ids.numpy()),
            jnp.asarray(vis.numpy()),
            jnp.asarray(cross_mask.numpy().astype(np.int32)),
        )
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_text_decoder_logits_match_reference():
    td_mod = load_reference_text_decoder()
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=66,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=4,
        max_position_embeddings=32,
    )
    torch.manual_seed(0)
    llm = LlamaForCausalLM(hf_cfg).eval()
    ref_td = td_mod.TextDecoder(
        config=hf_cfg,
        txt_vocab_size=66,
        orig_txt_vocab_size=64,
        is_freeze=True,
        gradient_checkpointing=False,
    )
    ref_td.init_from_llm(llm, orig_txt_vocab_size=64)
    ref_td = ref_td.eval()

    g = torch.Generator().manual_seed(2)
    h = torch.randn(2, 5, 32, generator=g)
    with torch.no_grad():
        ref_logits = ref_td(h, return_dict=True).logits.numpy()

    cfg = _our_config()
    cfg = LlamaConfig(**{**cfg.__dict__, "vocab_size": 66})
    td = TextDecoder(cfg, orig_vocab_size=64)
    variables = td.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 32)))
    converted = convert_text_decoder(
        llm.lm_head.weight.detach().numpy(), vocab_size=66, orig_vocab_size=64
    )
    params = merge_params(variables["params"], converted)
    ours = np.asarray(td.apply({"params": params}, jnp.asarray(h.numpy())))
    np.testing.assert_allclose(ours, ref_logits, atol=1e-5, rtol=1e-5)
