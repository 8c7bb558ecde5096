"""Weight-converter parity: tiny HF torch models vs our flax modules.

This is the numerical contract behind loading real Vicuna/CLIP checkpoints
(replacing reference `utils/misc.py:13-63`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from mm_interleaved_tpu.models.llama import LlamaConfig, LlamaModel
from mm_interleaved_tpu.models.vit import ViTConfig, ViTEmbeddings, ViTLayer
from mm_interleaved_tpu.utils.convert_hf import (
    convert_clip_vit,
    convert_llama,
    convert_text_decoder,
    merge_params,
)


@pytest.mark.slow
def test_llama_logits_match_hf():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=32,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=32,
        cross_attention_frequency=100,  # no cross-attn layers
        image_embed_dim=8, spatial_shapes=(2,),
    )
    model = LlamaModel(cfg)

    ids = np.array([[1, 5, 9, 23, 41, 2]], dtype=np.int32)
    embeds0 = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, ids.shape[1], 32), jnp.float32),
    )
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    converted = convert_llama(sd, num_layers=2)
    params = {"params": merge_params(embeds0["params"], converted)}

    with torch.no_grad():
        hf_out = hf.model(
            input_ids=torch.tensor(ids, dtype=torch.long)
        ).last_hidden_state.numpy()

    embeds = model.apply(
        params, jnp.asarray(ids), method=lambda m, i: m.embed(i)
    )
    ours, _ = model.apply(params, embeds)
    np.testing.assert_allclose(np.asarray(ours), hf_out, rtol=2e-4, atol=2e-5)

    # TextDecoder head built from lm_head must reproduce hf logits on the
    # original vocab
    from mm_interleaved_tpu.models.llama import TextDecoder

    td_cfg = LlamaConfig(
        vocab_size=66, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
    )
    td = TextDecoder(td_cfg, orig_vocab_size=64)
    td0 = td.init(jax.random.PRNGKey(0), jnp.asarray(ours))
    td_params = {"params": merge_params(
        td0["params"],
        convert_text_decoder(sd["lm_head.weight"], 66, 64),
    )}
    logits = td.apply(td_params, jnp.asarray(ours))
    with torch.no_grad():
        hf_logits = hf.lm_head(torch.tensor(hf_out)).numpy()
    np.testing.assert_allclose(
        np.asarray(logits[..., :64]), hf_logits, rtol=2e-4, atol=2e-5
    )
    # new-vocab slots are suppressed at init (-100 + 95 = -5)
    assert np.asarray(logits[..., 64:]).max() < -4.0


@pytest.mark.slow
def test_clip_vit_matches_hf():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = ViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, patch_size=14, image_size=28,
    )

    import flax.linen as nn

    class Core(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = ViTEmbeddings(cfg, name="embeddings")(x)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                             name="pre_layrnorm")(h)
            for i in range(cfg.num_hidden_layers):
                h = ViTLayer(cfg, name=f"layers_{i}")(h)
            return h

    model = Core()
    x = np.random.RandomState(0).rand(2, 28, 28, 3).astype(np.float32)
    p0 = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    converted = convert_clip_vit(sd, num_layers=2)
    params = {"params": merge_params(p0["params"], converted)}

    ours = model.apply(params, jnp.asarray(x))
    with torch.no_grad():
        theirs = hf(
            pixel_values=torch.tensor(x).permute(0, 3, 1, 2),
            output_hidden_states=True,
        ).hidden_states[-1].numpy()
    np.testing.assert_allclose(
        np.asarray(ours), theirs, rtol=2e-4, atol=2e-5
    )


@pytest.mark.slow
def test_clip_text_matches_hf():
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFTextConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        projection_dim=24,
        eos_token_id=98,
        bos_token_id=97,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    from mm_interleaved_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextModel,
        convert_clip_text,
    )

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, projection_dim=24, eos_token_id=98,
    )
    model = CLIPTextModel(cfg)
    ids = np.array([[97, 5, 9, 23, 98, 0, 0, 0]], dtype=np.int32)
    p0 = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = {"params": merge_params(
        p0["params"], convert_clip_text(sd, num_layers=2)
    )}
    hidden, feats = model.apply(params, jnp.asarray(ids))
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids, dtype=torch.long))
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(feats), out.text_embeds.numpy(), rtol=2e-4, atol=2e-5
    )
