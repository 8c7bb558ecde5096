#!/usr/bin/env python
"""Synthesize release-FORMAT tower checkpoints at real flagship scale.

The real released weights (lmsys/vicuna-13b-v1.3, openai/clip-vit-large-
patch14, stabilityai/stable-diffusion-2-1-base — the towers the reference
assembles in models/mm_interleaved.py:60-88 and fetches via
scripts/download_hf_models.py:8-33) cannot be fetched from this box (zero
egress).  This script writes checkpoints with the SAME key set, shapes,
dtypes, shard layout and file format as the releases, but random data:

  * vicuna-13b: key set from `LlamaForCausalLM(13B config)` on the meta
    device (no RAM), written as ~8 GB fp16 .safetensors shards with a
    standard model.safetensors.index.json — 26 GB on disk, like the release.
  * clip-vit-large-patch14: a real `CLIPVisionModel` at ViT-L/14 scale,
    fp16 safetensors.
  * stable-diffusion-2-1-base: diffusers-layout unet/ + vae/ safetensors
    from the torch oracle modules (tests/_reference_sd.py) at SD-2.1 scale
    — the exact key convention `convert_sd_{unet,vae}` is parity-pinned
    against (tests/test_sd_oracle.py).

Together with scripts/convert_checkpoint.py this drills the real-weights
runbook end-to-end at 13B scale without the real files:

  python scripts/synth_release_assets.py --out assets_synth
  python scripts/convert_checkpoint.py --preset flagship \
      --llm assets_synth/vicuna-13b-v1.3 \
      --clip assets_synth/clip-vit-large-patch14 \
      --sd assets_synth/stable-diffusion-2-1-base \
      --dtype bfloat16 --out OUTPUT/drill_ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

SHARD_BYTES = 8 * 1024**3


def _rand(shape, rng, scale=0.02):
    n = int(np.prod(shape)) if shape else 1
    return (rng.standard_normal(n, dtype=np.float32) * scale) \
        .astype(np.float16).reshape(shape)


def write_llama_13b(out_dir, seed=0):
    """Sharded fp16 safetensors with the exact vicuna-13b key set/shapes
    (meta-device HF LLaMA: zero host RAM for the 13B skeleton)."""
    import torch
    from safetensors.numpy import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=5120, intermediate_size=13824,
        num_hidden_layers=40, num_attention_heads=40,
        max_position_embeddings=2048, rms_norm_eps=1e-6,
    )
    with torch.device("meta"):
        skeleton = LlamaForCausalLM(cfg)
    entries = [(k, tuple(v.shape)) for k, v in skeleton.state_dict().items()]
    del skeleton

    os.makedirs(out_dir, exist_ok=True)
    cfg.save_pretrained(out_dir)
    rng = np.random.default_rng(seed)
    shards, cur, cur_bytes = [], {}, 0
    for k, shape in entries:
        cur[k] = _rand(shape, rng)
        cur_bytes += cur[k].nbytes
        if cur_bytes >= SHARD_BYTES:
            shards.append(cur)
            cur, cur_bytes = {}, 0
    if cur:
        shards.append(cur)
    n = len(shards)
    weight_map, total = {}, 0
    for i, shard in enumerate(shards):
        name = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(out_dir, name))
        for k, v in shard.items():
            weight_map[k] = name
            total += v.nbytes
        shard.clear()
    with open(os.path.join(out_dir, "model.safetensors.index.json"),
              "w") as f:
        json.dump({"metadata": {"total_size": total},
                   "weight_map": weight_map}, f, indent=2)
    print(f"[llama] {len(weight_map)} tensors, {total / 2**30:.1f} GB, "
          f"{n} shards -> {out_dir}", flush=True)


def write_clip_vit_l(out_dir, seed=1):
    import torch
    from safetensors.numpy import save_file
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(seed)
    model = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14,
    ))
    sd = {k: v.detach().numpy().astype(np.float16)
          for k, v in model.state_dict().items()}
    os.makedirs(out_dir, exist_ok=True)
    model.config.save_pretrained(out_dir)
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    print(f"[clip] {len(sd)} tensors, "
          f"{sum(v.nbytes for v in sd.values()) / 2**30:.2f} GB -> {out_dir}",
          flush=True)


def write_sd21(out_dir, seed=2):
    import torch
    from safetensors.numpy import save_file
    from _reference_sd import TorchMiniUNet, TorchMiniVAE

    torch.manual_seed(seed)
    unet = TorchMiniUNet(
        in_ch=4, out_ch=4, block_out=(320, 640, 1280, 1280),
        layers_per_block=2, ctx_dim=1024, head_dim=64, groups=32,
    )
    os.makedirs(os.path.join(out_dir, "unet"), exist_ok=True)
    sd = {k: v.detach().numpy().astype(np.float16)
          for k, v in unet.state_dict().items()}
    save_file(
        sd,
        os.path.join(out_dir, "unet",
                     "diffusion_pytorch_model.safetensors"),
    )
    n_unet = sum(v.size for v in sd.values())
    del unet, sd

    torch.manual_seed(seed + 1)
    vae = TorchMiniVAE(
        in_ch=3, out_ch=3, latent_ch=4, block_out=(128, 256, 512, 512),
        layers_per_block=2, groups=32,
    )
    os.makedirs(os.path.join(out_dir, "vae"), exist_ok=True)
    sd = {k: v.detach().numpy().astype(np.float16)
          for k, v in vae.state_dict().items()}
    save_file(
        sd,
        os.path.join(out_dir, "vae", "diffusion_pytorch_model.safetensors"),
    )
    print(f"[sd21] unet {n_unet / 1e6:.0f}M + vae "
          f"{sum(v.size for v in sd.values()) / 1e6:.0f}M params -> "
          f"{out_dir}", flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--towers", default="llm,clip,sd")
    args = ap.parse_args(argv)
    towers = set(args.towers.split(","))
    if "llm" in towers:
        write_llama_13b(os.path.join(args.out, "vicuna-13b-v1.3"))
    if "clip" in towers:
        write_clip_vit_l(os.path.join(args.out, "clip-vit-large-patch14"))
    if "sd" in towers:
        write_sd21(os.path.join(args.out, "stable-diffusion-2-1-base"))


if __name__ == "__main__":
    main()
