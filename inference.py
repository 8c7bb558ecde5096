"""Interleaved multi-turn inference entry point.

Mirrors the reference `inference.py:282-302`: load annt.json, run the
alternating text/image generation loop, dump results.

Usage:
    python inference.py --config configs/inference.yaml \
        --annt_path annt.json [--image_root DIR] [--output_dir OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--annt_path", required=True)
    ap.add_argument("--image_root", default="")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output_dir", default="OUTPUT/inference")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from mm_interleaved_tpu.data.tokenizer import load_tokenizer
    from mm_interleaved_tpu.inference_loop import (
        InferenceConfig,
        InterleavedInferencePipeline,
    )
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
    from mm_interleaved_tpu.utils.checkpoint import load_variables
    from mm_interleaved_tpu.utils.config import build_model_config, load_config

    cfg = load_config(args.config)
    model_cfg = build_model_config(cfg["model"])
    model = MMInterleaved(model_cfg)
    tokenizer = load_tokenizer(
        cfg.get("data", {}).get("tokenizer_path"),
        vocab_size=model_cfg.llm.vocab_size,
    )
    variables = load_variables(model, model_cfg, args.checkpoint)

    inf = cfg.get("inference", {})
    # mesh-aware runtime (same `mesh:` stanza as train.py/evaluate.py):
    # runs the multi-turn loop model-sharded for flagship-scale checkpoints
    from mm_interleaved_tpu.parallel.inference import (
        build_generation_runtime,
    )

    runtime = build_generation_runtime(
        model, variables, cfg.get("mesh"), quantize=inf.get("quantize"),
    )
    pipe = InterleavedInferencePipeline(
        model, variables, tokenizer,
        runtime=runtime,
        cfg=InferenceConfig(
            num_iter=inf.get("num_iter", 2),
            start_mode=inf.get("start_mode", "generate_texts"),
            max_new_tokens=inf.get("max_new_tokens", 64),
            num_inference_steps=inf.get("num_inference_steps", 30),
            guidance_scale=inf.get("guidance_scale", 3.5),
            force_image_every_turn=inf.get("force_image_every_turn", False),
        ),
    )

    os.makedirs(args.output_dir, exist_ok=True)
    samples = pipe.load_annt_data(args.annt_path, args.image_root)
    results = []
    for si, sample in enumerate(samples):
        out = pipe.run(sample)
        for ii, img in enumerate(out["images"]):
            path = os.path.join(args.output_dir, f"sample{si}_img{ii}.png")
            Image.fromarray((np.asarray(img) * 255).astype(np.uint8)).save(
                path
            )
        results.append({
            "sample": si,
            "texts": out["texts"],
            "num_images": len(out["images"]),
        })
        print(f"[{si}] texts={out['texts']} images={len(out['images'])}")

    ts = time.strftime("%Y%m%d%H%M%S")
    with open(
        os.path.join(args.output_dir, f"eval_results_{ts}.json"), "w"
    ) as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
