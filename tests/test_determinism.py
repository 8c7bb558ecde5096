"""Determinism + transfer-hygiene of the sharded train step.

The reference's only concurrency-correctness devices are deterministic
shuffles and barriers (SURVEY §5.2); the TPU analogue of a sanitizer pass
is (a) bitwise step determinism — same state + batch -> identical params,
catching nondeterministic reductions or unkeyed RNG — and (b) a
`jax.transfer_guard` sweep proving the hot loop performs no implicit
host<->device transfers (each one is a sync point that would serialise the
pipeline)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.engine.optim import OptimConfig
from mm_interleaved_tpu.engine.trainer import Trainer, TrainerConfig
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.parallel.partition import make_mesh

from test_trainer import example_batch


@pytest.mark.slow
def test_train_step_bitwise_deterministic_and_transfer_clean():
    mesh = make_mesh(data=4, fsdp=2, tensor=1)
    model = MMInterleaved(tiny_config(with_image_decoder=True))
    tcfg = TrainerConfig(
        optim=OptimConfig(warmup_steps=1, total_steps=10), log_every=1,
    )
    trainer = Trainer(model, tcfg, mesh=mesh)
    batch = example_batch()
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_fn = trainer.compile_step(state, batch)
    sharded = trainer.shard_batch(batch)

    # warmup compile outside the guard (compilation may transfer constants)
    s1, m1 = step_fn(state, sharded)

    # the dispatch of an already-compiled step on committed inputs must not
    # move data between host and device in either direction
    state2 = trainer.init_state(jax.random.PRNGKey(0), batch)
    state3 = trainer.init_state(jax.random.PRNGKey(0), batch)
    with jax.transfer_guard("disallow"):
        s2, m2 = step_fn(state2, sharded)
        s3, m3 = step_fn(state3, sharded)

    # bitwise determinism: identical init + batch -> identical updates
    l2 = jax.device_get(s2.params["params"])
    l3 = jax.device_get(s3.params["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        l2, l3,
    )
    assert float(m2["loss"]) == float(m3["loss"])
    # and the guarded run matches the unguarded one bitwise too
    l1 = jax.device_get(s1.params["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        l1, l2,
    )
