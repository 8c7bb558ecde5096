"""Pin flagship_config against the reference's release config
(mm_pretrain.yaml:56-85) — a wrong dim here silently breaks real-checkpoint
conversion, so every shape-bearing field is asserted, with the perceiver
blocks read from the reference yaml itself."""

import re

import yaml

from mm_interleaved_tpu.configs import flagship_config

REF_YAML = "/root/reference/mm_interleaved/configs/release/mm_pretrain.yaml"


def _load_ref_model_cfg():
    with open(REF_YAML) as f:
        text = f.read()
    # the reference yaml uses mmcv syntax with anchors; plain yaml handles it
    return yaml.safe_load(text)["model"]


def test_flagship_matches_reference_yaml():
    ref = _load_ref_model_cfg()
    cfg = flagship_config()

    assert cfg.num_img_token == ref["num_img_token"] == 64
    assert cfg.llm.cross_attention_frequency == \
        ref["cross_attention_frequency"] == 4

    p = ref["visual_tokenizer_config"]["perceiver_config"]
    ours_p = cfg.visual.perceiver
    assert ours_p.num_queries == p["num_queries"]
    assert ours_p.hidden_size == p["hidden_size"]
    assert ours_p.encoder_hidden_size == p["encoder_hidden_size"]
    assert ours_p.cross_attention_frequency == p["cross_attention_frequency"]
    assert ours_p.num_hidden_layers == p["num_hidden_layers"]
    assert ours_p.num_attention_heads == p["num_attention_heads"]
    assert ours_p.qk_normalization == p["qk_normalization"]

    q = ref["image_decoder_config"]["perceiver_config"]
    ours_q = cfg.image_decoder.perceiver
    assert ours_q.num_queries == q["num_queries"]
    assert ours_q.hidden_size == q["hidden_size"]
    assert ours_q.encoder_hidden_size == q["encoder_hidden_size"]
    assert ours_q.cross_attention_frequency == q["cross_attention_frequency"]
    assert ours_q.num_hidden_layers == q["num_hidden_layers"]
    assert ours_q.num_attention_heads == q["num_attention_heads"]


def test_flagship_tower_shapes():
    """Tower dims pinned to the released checkpoints' architectures:
    vicuna-13b-v1.3 (LlamaConfig of lmsys/vicuna-13b-v1.3), CLIP ViT-L/14
    (openai/clip-vit-large-patch14 vision config), SD-2.1-base UNet/VAE
    (stabilityai/stable-diffusion-2-1-base)."""
    cfg = flagship_config()

    # vicuna-13b + 2 new special tokens (mm_interleaved.py:73 resize)
    assert cfg.llm.hidden_size == 5120
    assert cfg.llm.intermediate_size == 13824
    assert cfg.llm.num_hidden_layers == 40
    assert cfg.llm.num_attention_heads == 40
    assert cfg.llm.vocab_size == 32002
    assert cfg.orig_vocab_size == 32000
    # MMFS over the ViT-Adapter pyramid levels [32, 16, 8]
    # (mm_interleaved.py:46 spatial_shapes)
    assert tuple(cfg.llm.spatial_shapes) == (32, 16, 8)
    assert cfg.llm.image_embed_dim == 1024

    # CLIP ViT-L/14 @ 224
    vit = cfg.visual.encoder.vit
    assert (vit.hidden_size, vit.num_hidden_layers,
            vit.num_attention_heads) == (1024, 24, 16)
    assert (vit.patch_size, vit.image_size) == (14, 224)
    assert vit.hidden_act == "quick_gelu"

    # SD-2.1-base: 512px, 4 levels, UNet cross-attn dim 1024
    dec = cfg.image_decoder
    assert dec.image_size == 512
    assert tuple(dec.spatial_shapes) == (64, 32, 16, 8)
    assert dec.unet.cross_attention_dim == 1024
    assert tuple(dec.unet.block_out_channels) == (320, 640, 1280, 1280)
    assert dec.vae.latent_channels == 4
    # MMFSNet heads/points match the LLM-side MMFS (sd_mmfs.py:44-58)
    assert dec.unet.mmfs.n_heads == 16
    assert dec.unet.mmfs.n_points == 8
    assert dec.unet.mmfs.max_num_image_per_seq == 10

    # sequence envelope (mm_interleaved.py:31, mm_pretrain.yaml:111)
    assert cfg.seq_len == 2048
    assert cfg.llm.max_num_image_per_seq == 50
