"""Trainer: sharded train step on the 8-device CPU mesh, loss decreases,
frozen params stay frozen, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.engine.optim import (
    OptimConfig,
    label_for_path,
    make_optimizer,
    trainable_mask,
)
from mm_interleaved_tpu.engine.trainer import Trainer, TrainerConfig
from mm_interleaved_tpu.parallel.partition import make_mesh

CFG = tiny_config(with_image_decoder=True)
S = CFG.special
NTOK = CFG.num_img_token


def example_batch(B=8, L=24, seed=0):
    rng = np.random.RandomState(seed)
    row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * NTOK + [
        7, 8, 9, S.eos_token_id,
    ]
    ids = np.tile(np.array(row + [S.pad_token_id] * (L - len(row)),
                           dtype=np.int32), (B, 1))
    att = (ids != S.pad_token_id).astype(np.int32)
    return dict(
        text_ids=jnp.array(ids),
        image_tensors=jnp.array(
            rng.rand(B, CFG.max_num_images, 56, 56, 3).astype(np.float32)
        ),
        num_image_per_seq=jnp.ones((B,), jnp.int32),
        attention_mask=jnp.array(att),
        image_tensors_dec=jnp.array(
            rng.rand(B, CFG.max_num_images, 16, 16, 3).astype(np.float32)
        ),
    )


def test_label_routing():
    oc = OptimConfig()
    assert label_for_path(
        "mm_decoder/layers_0/llama_cross_attn/gate", oc) == "group_0"
    assert label_for_path(
        "mm_decoder/layers_0/llama_cross_attn/attn/sampling_offsets/kernel",
        oc) == "group_1"
    assert label_for_path(
        "mm_decoder/layers_0/llama_cross_attn/attn/value_proj/kernel", oc
    ) == "group_2"
    assert label_for_path("image_decoder/unet/mid_res_0/conv1/kernel", oc
                          ) == "group_3"
    assert label_for_path("mm_decoder/layers_0/self_attn/q_proj/kernel", oc
                          ) == "frozen"
    assert label_for_path("text_decoder/head/kernel", oc) == "frozen"
    assert label_for_path("text_decoder/head_new/kernel", oc) == "default"
    assert label_for_path("visual_tokenizer/encoder/layers_3/fc1/kernel", oc
                          ) == "frozen"
    assert label_for_path(
        "visual_tokenizer/encoder/adapter_spm/fc1/kernel", oc) == "default"
    assert label_for_path("image_decoder/vae/encoder/conv_in/kernel", oc
                          ) == "frozen"


@pytest.mark.slow
def test_train_steps_update_and_freeze():
    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    model = MMInterleaved(CFG)
    tcfg = TrainerConfig(
        optim=OptimConfig(
            learning_rate=1e-3, warmup_steps=1, total_steps=10,
            grad_clip=1.0,
        ),
        log_every=1,
    )
    trainer = Trainer(model, tcfg, mesh=mesh)
    batch = example_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    p0 = jax.device_get(state.params["params"])

    step_fn = trainer.compile_step(state, batch)
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, trainer.shard_batch(batch))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))

    p1 = jax.device_get(state.params["params"])
    mask = trainable_mask(tcfg.optim, p0)

    def check(path, old, new, trainable):
        changed = np.abs(np.asarray(old) - np.asarray(new)).max() > 0
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if trainable:
            return  # some trainable params may legitimately have ~0 grad
        assert not changed, f"frozen param changed: {name}"

    jax.tree_util.tree_map_with_path(
        lambda kp, o, n, t: check(kp, o, n, t), p0, p1, mask
    )

    # a few specific trainables must move
    def get(tree, path):
        for k in path.split("/"):
            tree = tree[k]
        return np.asarray(tree)

    moved = "mm_decoder/layers_0/llama_cross_attn/gate"
    assert np.abs(get(p0, moved) - get(p1, moved)).max() > 0
    frozen = "mm_decoder/layers_0/self_attn/q_proj/kernel"
    assert np.abs(get(p0, frozen) - get(p1, frozen)).max() == 0


@pytest.mark.slow
def test_grad_accum_matches_big_batch():
    """accum=2 over two half-batches == one step over the full batch (the
    text-only tiny model consumes no training RNG, so grads must agree)."""
    mesh = make_mesh(data=8)
    model = MMInterleaved(tiny_config(with_image_decoder=False))
    big = {k: v for k, v in example_batch(B=16).items()
           if k != "image_tensors_dec"}

    def run(accum):
        tcfg = TrainerConfig(
            optim=OptimConfig(warmup_steps=1, total_steps=5),
            grad_accum_steps=accum,
        )
        trainer = Trainer(model, tcfg, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), {
            k: (v[:8] if hasattr(v, "shape") else v) for k, v in big.items()
        } if accum > 1 else big)
        if accum > 1:
            stacked = jax.tree_util.tree_map(
                lambda x: np.stack([x[:8], x[8:]], axis=0), big
            )
            batch = trainer.shard_batch(stacked)
        else:
            batch = trainer.shard_batch(big)
        step_fn = trainer.compile_step(state, batch)
        state, metrics = step_fn(state, batch)
        return jax.device_get(state.params["params"]), metrics

    p_accum, m_accum = run(2)
    p_full, m_full = run(1)
    np.testing.assert_allclose(
        float(m_accum["loss"]), float(m_full["loss"]), rtol=1e-5
    )
    flat_a = jax.tree_util.tree_leaves(p_accum)
    flat_f = jax.tree_util.tree_leaves(p_full)
    for a, f in zip(flat_a, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_resume_bitwise_at_accum_boundary(tmp_path):
    """Save/kill/resume mid-run reproduces the uninterrupted parameter
    trajectory bitwise, including the data-iterator position and host RNG
    (VERDICT item 5's done-criterion)."""
    from mm_interleaved_tpu.data.pipeline import build_train_iterator

    mesh = make_mesh(data=8)
    model_cfg = tiny_config(with_image_decoder=False)
    model = MMInterleaved(model_cfg)
    data_cfg = {"per_device_batch_size": 8, "seed": 3,
                "datasets": [{"name": "synthetic", "num_samples": 48}]}

    def make_trainer(ckpt_dir):
        tcfg = TrainerConfig(
            optim=OptimConfig(warmup_steps=1, total_steps=10),
            grad_accum_steps=2, save_every=2, log_every=100,
            checkpoint_dir=ckpt_dir,
        )
        return Trainer(model, tcfg, mesh=mesh)

    def init(trainer, it, first):
        return trainer.init_state(jax.random.PRNGKey(0), first)

    # --- uninterrupted 4 steps
    it, first = build_train_iterator(data_cfg, model_cfg)
    tr = make_trainer(str(tmp_path / "a"))
    state = init(tr, it, first)
    state = tr.fit(state, it, num_steps=4)
    tr.wait_for_saves()
    ref = jax.device_get(state.params["params"])

    # --- 2 steps, save, then a *fresh* process resumes for 2 more
    it2, first2 = build_train_iterator(data_cfg, model_cfg)
    tr2 = make_trainer(str(tmp_path / "b"))
    state2 = init(tr2, it2, first2)
    state2 = tr2.fit(state2, it2, num_steps=2)
    tr2.wait_for_saves()

    it3, first3 = build_train_iterator(data_cfg, model_cfg)
    tr3 = make_trainer(str(tmp_path / "b"))
    state3 = init(tr3, it3, first3)
    state3 = tr3.restore(state3, data_iter=it3)
    assert int(state3.step) == 2
    assert it3.state() == it2.state()
    state3 = tr3.fit(state3, it3, num_steps=2)

    out = jax.device_get(state3.params["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        ref, out,
    )


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    mesh = make_mesh(data=8)
    model = MMInterleaved(tiny_config(with_image_decoder=False))
    tcfg = TrainerConfig(
        optim=OptimConfig(warmup_steps=1, total_steps=5),
        checkpoint_dir=str(tmp_path / "ckpt"),
        save_every=1,
    )
    trainer = Trainer(model, tcfg, mesh=mesh)
    batch = {
        k: v for k, v in example_batch(B=8).items()
        if k != "image_tensors_dec"
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = trainer.compile_step(state, batch)
    state, _ = step_fn(state, trainer.shard_batch(batch))
    trainer.maybe_save(state, force=True)
    trainer.wait_for_saves()

    # fresh trainer restores the step and params
    trainer2 = Trainer(model, tcfg, mesh=mesh)
    state2 = trainer2.init_state(jax.random.PRNGKey(1), batch)
    state2 = trainer2.restore(state2)
    assert int(state2.step) == int(state.step)
    a = jax.device_get(state.params["params"]["soi_token"])
    b = jax.device_get(state2.params["params"]["soi_token"])
    np.testing.assert_array_equal(a, b)
