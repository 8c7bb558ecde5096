"""Training entry point.

Mirrors the reference `train.py:28-74`: load YAML config, build datasets /
model / trainer, auto-resume from the latest checkpoint, train, final save.
No monkey patches needed — flash attention, qk-norm, the SD hooks and
return-new-tokens generation are all first-class here.

Usage:
    python train.py --config configs/pretrain.yaml [--output_dir OUT]
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument(
        "--load_from", default=None,
        help="orbax checkpoint dir (scripts/convert_checkpoint.py output) "
        "to warm-start params from when no auto-resume checkpoint exists",
    )
    args = ap.parse_args()

    import jax

    from mm_interleaved_tpu.utils.config import (
        build_model_config,
        dump_config,
        load_config,
    )

    cfg = load_config(args.config)
    output_dir = args.output_dir or cfg.get("output_dir", "OUTPUT/run")
    os.makedirs(output_dir, exist_ok=True)
    dump_config(cfg, output_dir)

    # multi-host bring-up (replaces init_distributed_mode, misc.py:292-337)
    if cfg.get("distributed", {}).get("initialize", False):
        jax.distributed.initialize()

    model_cfg = build_model_config(cfg["model"])

    from mm_interleaved_tpu.engine.optim import OptimConfig
    from mm_interleaved_tpu.engine.trainer import Trainer, TrainerConfig
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
    from mm_interleaved_tpu.parallel.partition import make_mesh
    from mm_interleaved_tpu.data.pipeline import build_train_iterator

    tr = cfg.get("training", {})
    optim = OptimConfig(
        learning_rate=tr.get("learning_rate", 1e-4),
        weight_decay=tr.get("weight_decay", 0.05),
        beta1=tr.get("adam_beta1", 0.9),
        beta2=tr.get("adam_beta2", 0.995),
        eps=tr.get("adam_epsilon", 1e-6),
        warmup_steps=tr.get("warmup_steps", 1000),
        total_steps=args.max_steps or tr.get("max_steps", 15000),
        grad_clip=tr.get("max_grad_norm", 1.0),
    )
    mesh_cfg = cfg.get("mesh", {})
    mesh = make_mesh(
        data=mesh_cfg.get("data", -1),
        fsdp=mesh_cfg.get("fsdp", 1),
        tensor=mesh_cfg.get("tensor", 1),
    )
    trainer = Trainer(
        MMInterleaved(model_cfg),
        TrainerConfig(
            optim=optim,
            max_steps=optim.total_steps,
            log_every=tr.get("logging_steps", 10),
            save_every=tr.get("save_steps", 1000),
            keep_checkpoints=tr.get("save_total_limit", 5),
            seed=tr.get("seed", 32),
            checkpoint_dir=os.path.join(output_dir, "checkpoints"),
        ),
        mesh=mesh,
    )

    data_iter, example_batch = build_train_iterator(
        cfg.get("data", {}), model_cfg
    )
    state = trainer.init_state(jax.random.PRNGKey(optim_seed(tr)), example_batch)

    from mm_interleaved_tpu.engine.optim import trainable_mask
    from mm_interleaved_tpu.utils.logging import print_parameters_stats

    if jax.process_index() == 0:
        print_parameters_stats(
            jax.tree_util.tree_map(lambda x: x, state.params),
            trainable_mask(optim, state.params["params"]),
            prefix="MMInterleaved.",
        )

    # warm-start from a converted/released checkpoint (reference
    # train.py:58-59 `load_model_weights(model, config.load_from)`) — only
    # when not resuming mid-run, so auto-resume always wins
    load_from = args.load_from or tr.get("load_from")
    state = trainer.restore(state)  # auto-resume (train.py:62-66)
    if load_from and int(state.step) == 0:
        from mm_interleaved_tpu.engine.trainer import TrainState
        from mm_interleaved_tpu.utils.checkpoint import load_variables

        loaded = load_variables(
            trainer.model, model_cfg, load_from, seed=optim_seed(tr)
        )
        state = trainer.shard_state(TrainState(
            step=state.step, params=loaded, opt_state=state.opt_state,
        ))
        if jax.process_index() == 0:
            print(f"warm-started params from {load_from}")
    from mm_interleaved_tpu.data.pipeline import prefetch, skip_batches

    if int(state.step) > 0:
        # deterministic data fast-forward (counted skip)
        data_iter = skip_batches(data_iter, int(state.step))
    data_iter = prefetch(data_iter, size=2)

    def log_fn(step, metrics):
        if jax.process_index() == 0:
            print(f"step {step}: " + " ".join(
                f"{k}={v:.4g}" for k, v in metrics.items()
            ))

    remaining = optim.total_steps - int(state.step)
    state = trainer.fit(state, data_iter, num_steps=remaining, log_fn=log_fn)
    trainer.maybe_save(state, force=True)
    trainer.wait_for_saves()


def optim_seed(tr):
    return tr.get("seed", 32)


if __name__ == "__main__":
    main()
