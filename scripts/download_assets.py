#!/usr/bin/env python
"""Fetch the pretrained tower weights MM-Interleaved builds on.

Analogue of the reference's `mm_interleaved/scripts/download_hf_models.py`
(which instantiates each tower in torch and re-saves it); TPU-natively we
only need the *files* on disk — `scripts/convert_checkpoint.py` reads the
safetensors/bin shards directly into our flax trees, so this script is a
plain `snapshot_download` of each repo (weights + tokenizer + configs, no
torch load, no GPU).

Default layout matches the reference's `assets/` convention:

    python scripts/download_assets.py --root assets
    # assets/lmsys/vicuna-13b-v1.3
    # assets/openai/clip-vit-large-patch14
    # assets/stabilityai/stable-diffusion-2-base
    # assets/OpenGVLab/MM-Interleaved  (released pretrain checkpoint)

Then assemble an orbax checkpoint (see README "Real-weights runbook"):

    python scripts/convert_checkpoint.py --preset flagship \
        --ref-checkpoint assets/OpenGVLab/MM-Interleaved/mm_interleaved_pretrain \
        --out OUTPUT/mm_interleaved_pretrain
"""

from __future__ import annotations

import argparse
import os

TOWERS = {
    "llm": ("lmsys/vicuna-13b-v1.3", None),
    "clip": ("openai/clip-vit-large-patch14", None),
    "sd": ("stabilityai/stable-diffusion-2-base", None),
    # released MM-Interleaved pretrain weights (no SFT), Llama license
    "mmi": ("OpenGVLab/MM-Interleaved", "mm_interleaved_pretrain/*"),
}

# weights + tokenizer + configs; skip .ckpt/.msgpack duplicates
_PATTERNS = [
    "*.safetensors", "*.bin", "*.json", "*.txt", "*.model",
    "*/*.safetensors", "*/*.bin", "*/*.json", "*/*.txt", "*/*.model",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="assets")
    ap.add_argument(
        "--towers", default="llm,clip,sd,mmi",
        help="comma list from: " + ",".join(TOWERS),
    )
    args = ap.parse_args()

    from huggingface_hub import snapshot_download

    for name in args.towers.split(","):
        repo, subset = TOWERS[name.strip()]
        dest = os.path.join(args.root, repo)
        os.makedirs(dest, exist_ok=True)
        print(f"[{name}] {repo} -> {dest}")
        snapshot_download(
            repo_id=repo,
            local_dir=dest,
            allow_patterns=[subset] if subset else _PATTERNS,
        )
    print("done; next: scripts/convert_checkpoint.py (see README)")


if __name__ == "__main__":
    main()
