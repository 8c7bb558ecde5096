"""Performance probe on the real chip: per-phase timings.

Measures the three BASELINE.json metrics separately:
  * caption decode tokens/sec (KV-cache decode, MMFS cross-attn active),
  * SD denoise steps/sec (CFG batch),
  * prefill+encode latency,
  * train step/sec (small preset; base doesn't fit fp32 Adam on one chip).

Run: python scripts/perf_probe.py [--preset base|small] [--train]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode_tokens", type=int, default=64)
    ap.add_argument("--denoise_steps", type=int, default=50)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--phases", default="encode,decode,image")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mm_interleaved_tpu.configs import base_config, small_config
    from mm_interleaved_tpu.generation.diffusion import generate_images
    from mm_interleaved_tpu.generation.text import (
        TextGenerationConfig,
        generate_texts,
    )
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

    B = args.batch
    cfg = (base_config(seq_len=512, max_num_images=2, remat=False)
           if args.preset == "base"
           else small_config(seq_len=512, max_num_images=2))
    model = MMInterleaved(cfg)
    S = cfg.special
    ntok = cfg.num_img_token
    rng = np.random.RandomState(0)
    L = 256
    row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * ntok
    row += list(rng.randint(10, 30000, size=L - len(row)))
    ids = np.tile(np.asarray(row[:L], np.int32), (B, 1))
    enc_res = cfg.visual.encoder.vit.image_size
    batch = dict(
        text_ids=jnp.asarray(ids),
        image_tensors=jnp.asarray(
            rng.rand(B, cfg.max_num_images, enc_res, enc_res, 3)
            .astype(np.float32)
        ),
        num_image_per_seq=jnp.ones((B,), jnp.int32),
        attention_mask=jnp.ones_like(jnp.asarray(ids)),
    )
    extra = {}
    if cfg.image_decoder is not None:
        d = cfg.image_decoder.image_size
        extra["image_tensors_dec"] = jnp.asarray(
            rng.rand(B, cfg.max_num_images, d, d, 3).astype(np.float32)
        )

    t0 = time.time()

    def init_bf16(rngs, batch, extra):
        v = model.init(rngs, **batch, **extra)
        # cast inside the jit so fp32 masters never materialise in HBM
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, v,
        )

    variables = jax.jit(init_bf16)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch, extra,
    )
    jax.block_until_ready(variables)
    print(f"init: {time.time()-t0:.1f}s")

    results = {}

    def sync(x):
        # force real completion: relay-backed block_until_ready is a no-op
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf.ravel()[0])


    phases = args.phases.split(",")

    # --- prefill + encode
    if "encode" in phases:
        prep_fn = jax.jit(lambda v, b: model.apply(
            v, b["text_ids"], b["image_tensors"], b["num_image_per_seq"],
            method=model.prepare_mm_embeds,
        ))
        sync(prep_fn(variables, batch))
        t0 = time.time()
        for _ in range(5):
            prep = prep_fn(variables, batch)
        sync(prep)
        results["encode_prefill_ms"] = (time.time() - t0) / 5 * 1e3
        print("encode_prefill_ms", round(results["encode_prefill_ms"], 2),
              flush=True)

    # --- decode throughput
    key = jax.random.PRNGKey(0)
    if "decode" in phases:
        gen_cfg = TextGenerationConfig(
            max_new_tokens=args.decode_tokens, eos_token_ids=(999999,),
            pad_token_id=S.pad_token_id,
        )
        dec_fn = jax.jit(lambda v, b, r: generate_texts(
            model, v, b["text_ids"], b["image_tensors"],
            b["num_image_per_seq"], b["attention_mask"], gen_cfg, r,
        ))
        sync(dec_fn(variables, batch, key))
        t0 = time.time()
        reps = 3
        for i in range(reps):
            out = dec_fn(variables, batch, jax.random.fold_in(key, i))
        sync(out)
        dt = (time.time() - t0) / reps
        results["decode_tokens_per_sec"] = B * args.decode_tokens / dt
        results["decode_ms_per_token"] = dt / args.decode_tokens * 1e3
        print("decode_tokens_per_sec",
              round(results["decode_tokens_per_sec"], 1),
              "ms_per_token", round(results["decode_ms_per_token"], 2),
              flush=True)

    # --- decode without MMFS cross-attention (isolates its per-step cost)
    if "decode_novision" in phases:
        from mm_interleaved_tpu.generation.text import generate_tokens

        gen_cfg = TextGenerationConfig(
            max_new_tokens=args.decode_tokens, eos_token_ids=(999999,),
            pad_token_id=S.pad_token_id,
        )

        def novis(v, b, r):
            embeds = model.apply(
                v, b["text_ids"], method=lambda m, i: m.mm_decoder.embed(i)
            )
            return generate_tokens(
                model, v, embeds, b["attention_mask"], None, None,
                gen_cfg, r,
            )

        nv_fn = jax.jit(novis)
        sync(nv_fn(variables, batch, key))
        t0 = time.time()
        reps = 3
        for i in range(reps):
            out = nv_fn(variables, batch, jax.random.fold_in(key, i))
        sync(out)
        dt = (time.time() - t0) / reps
        results["novision_ms_per_token"] = dt / args.decode_tokens * 1e3
        print("novision_ms_per_token",
              round(results["novision_ms_per_token"], 2), flush=True)

    # --- SD denoise
    if cfg.image_decoder is not None and "image" in phases:
        img_inputs_fn = jax.jit(lambda v, b: model.apply(
            v, b["text_ids"], b["image_tensors"], b["num_image_per_seq"],
            b["attention_mask"], method=model.generate_image_inputs,
        ))
        ctx, ctx_mask, mmfs_vals, mmfs_mask = img_inputs_fn(variables, batch)
        gen_img = jax.jit(lambda v, c, cm, mv, mm, r: generate_images(
            model, v, c, cm, r, mmfs_values=mv, mmfs_mask=mm,
            num_inference_steps=args.denoise_steps, guidance_scale=3.5,
        ))
        tgt = slice(0, B)
        sync(gen_img(variables, ctx[tgt], ctx_mask[tgt], mmfs_vals[tgt],
                     mmfs_mask[tgt], key))
        t0 = time.time()
        imgs = gen_img(variables, ctx[tgt], ctx_mask[tgt], mmfs_vals[tgt],
                       mmfs_mask[tgt], key)
        sync(imgs)
        dt = time.time() - t0
        results["denoise_steps_per_sec"] = args.denoise_steps / dt
        results["image_sec_per_sample"] = dt / B
        print("denoise_steps_per_sec",
              round(results["denoise_steps_per_sec"], 2), flush=True)

    # --- SD denoise without MMFS injection (isolates the deformable cost)
    if cfg.image_decoder is not None and "image_nommfs" in phases:
        img_inputs_fn = jax.jit(lambda v, b: model.apply(
            v, b["text_ids"], b["image_tensors"], b["num_image_per_seq"],
            b["attention_mask"], method=model.generate_image_inputs,
        ))
        ctx, ctx_mask, _, _ = img_inputs_fn(variables, batch)
        gen_img2 = jax.jit(lambda v, c, cm, r: generate_images(
            model, v, c, cm, r,
            num_inference_steps=args.denoise_steps, guidance_scale=3.5,
        ))
        tgt = slice(0, B)
        sync(gen_img2(variables, ctx[tgt], ctx_mask[tgt], key))
        t0 = time.time()
        imgs = gen_img2(variables, ctx[tgt], ctx_mask[tgt], key)
        sync(imgs)
        dt = time.time() - t0
        results["denoise_nommfs_steps_per_sec"] = args.denoise_steps / dt
        print("denoise_nommfs_steps_per_sec",
              round(results["denoise_nommfs_steps_per_sec"], 2), flush=True)

    # --- train step (small only)
    if args.train:
        from mm_interleaved_tpu.engine.optim import OptimConfig
        from mm_interleaved_tpu.engine.trainer import Trainer, TrainerConfig
        from mm_interleaved_tpu.parallel.partition import make_mesh

        trainer = Trainer(
            model, TrainerConfig(optim=OptimConfig(
                warmup_steps=1, total_steps=100)),
            mesh=make_mesh(data=-1),
        )
        tb = dict(batch, **extra)
        state = trainer.init_state(jax.random.PRNGKey(0), tb)
        step_fn = trainer.compile_step(state, tb)
        state, _ = step_fn(state, trainer.shard_batch(tb))
        sync(state.params)
        t0 = time.time()
        for _ in range(3):
            state, m = step_fn(state, trainer.shard_batch(tb))
        sync(m)
        results["train_steps_per_sec"] = 3 / (time.time() - t0)

    print(json.dumps({"preset": args.preset, "batch": B, **{
        k: round(v, 3) for k, v in results.items()
    }}))


if __name__ == "__main__":
    main()
