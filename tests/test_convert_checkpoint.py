"""End-to-end checkpoint assembly: HF tower checkpoints on disk -> orbax ->
`load_variables` -> runnable model.

Exercises `scripts/convert_checkpoint.py` in tower mode with tiny HF
LLaMA + CLIPVisionModel checkpoints (the vicuna/CLIP path of the reference's
`from_pretrained` assembly, models/mm_interleaved.py:60-88), including the
vocab-resize padding (:73) and `load_variables` restore.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "scripts")
)


@pytest.mark.slow
def test_tower_assembly_roundtrip(tmp_path):
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModel,
        LlamaConfig as HFLlamaConfig,
        LlamaForCausalLM,
    )

    torch.manual_seed(0)
    llm_dir = tmp_path / "llm"
    hf_llm = LlamaForCausalLM(
        HFLlamaConfig(
            vocab_size=120,  # our tiny preset pads to 128 (resize semantics)
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=128,
        )
    )
    hf_llm.save_pretrained(llm_dir, safe_serialization=True)

    clip_dir = tmp_path / "clip"
    hf_clip = CLIPVisionModel(
        CLIPVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            image_size=56,
            patch_size=14,
        )
    )
    hf_clip.save_pretrained(clip_dir, safe_serialization=True)

    out = tmp_path / "ckpt"
    import convert_checkpoint

    convert_checkpoint.main([
        "--preset", "tiny",
        "--llm", str(llm_dir),
        "--clip", str(clip_dir),
        "--out", str(out),
    ])
    assert out.exists()

    from mm_interleaved_tpu.configs import tiny_config
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
    from mm_interleaved_tpu.utils.checkpoint import load_variables

    cfg = tiny_config(with_image_decoder=True)
    model = MMInterleaved(cfg)
    variables = load_variables(model, cfg, checkpoint=str(out))

    # loaded weights actually landed: embed rows must match HF (pad = mean)
    emb = np.asarray(
        variables["params"]["mm_decoder"]["embed_tokens"]["embedding"]
    )
    hf_emb = hf_llm.model.embed_tokens.weight.detach().numpy()
    np.testing.assert_allclose(emb[:120], hf_emb, atol=1e-6)
    np.testing.assert_allclose(
        emb[120:], np.repeat(hf_emb.mean(0, keepdims=True), 8, 0), atol=1e-6
    )

    # and the restored model runs a forward pass
    S = cfg.special
    ids = np.full((1, 24), 5, np.int32)
    ids[0, 0] = S.bos_token_id
    ids[0, 1] = S.soi_token_id
    ids[0, 2 : 2 + cfg.num_img_token] = S.image_token_id
    out_fwd = model.apply(
        variables,
        text_ids=jnp.asarray(ids),
        image_tensors=jnp.zeros((1, cfg.max_num_images, 56, 56, 3)),
        num_image_per_seq=jnp.ones((1,), jnp.int32),
        attention_mask=jnp.ones((1, 24), jnp.int32),
        image_tensors_dec=jnp.zeros(
            (1, cfg.max_num_images, cfg.image_decoder.image_size,
             cfg.image_decoder.image_size, 3)
        ),
        rngs={"noise": jax.random.PRNGKey(0)},
        deterministic=True,
    )
    assert np.isfinite(float(out_fwd["loss"]))
