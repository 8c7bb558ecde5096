"""Channel-last GroupNorm (`ops/group_norm.py`) vs `flax.linen.GroupNorm`.

The TPU-layout implementation must be numerically interchangeable with the
flax reference (which itself matches torch/diffusers GroupNorm semantics,
covered transitively by tests/test_convert_sd.py's torch-oracle parity).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_interleaved_tpu.ops.group_norm import GroupNorm


@pytest.mark.parametrize(
    "shape,groups,eps",
    [
        ((2, 8, 8, 32), 32, 1e-5),
        ((2, 8, 8, 320), 32, 1e-6),
        ((3, 5, 7, 12), 4, 1e-5),  # odd spatial, cpg=3
        ((2, 49, 64), 16, 1e-6),  # rank-3 [B, T, C]
    ],
)
def test_matches_flax_groupnorm(shape, groups, eps):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32)) * 3.0 + 1.5

    ours = GroupNorm(num_groups=groups, epsilon=eps)
    theirs = nn.GroupNorm(num_groups=groups, epsilon=eps)
    init_v = ours.init(jax.random.PRNGKey(0), x)
    assert set(init_v["params"]) == {"scale", "bias"}
    assert init_v["params"]["scale"].shape == (shape[-1],)
    # same param names/shapes -> same variables load into both modules
    scale = jnp.asarray(rng.rand(shape[-1]).astype(np.float32)) + 0.5
    bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    v = {"params": {"scale": scale, "bias": bias}}

    got = ours.apply(v, x)
    want = theirs.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_output_dtype_fp32_stats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 64).astype(np.float32))
    m = GroupNorm(num_groups=8, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.dtype == jnp.bfloat16
    # stats in fp32: bf16 output must still match the fp32 reference to
    # bf16 resolution
    want = nn.GroupNorm(num_groups=8).apply(v, x)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_bf16_input_promoted_for_stats():
    # an offset bf16 input: if moments were accumulated in bf16 the
    # mean/var would collapse; fp32 accumulation must match fp32 GroupNorm
    # of the same (already bf16-quantized) input.  mean/std ~ 8: bf16
    # accumulation would be off by O(1); the one-pass E[x^2]-E[x]^2
    # variance (same formula as flax fast-variance) cancels to ~0.4% here,
    # so a 3e-2 gate still separates the two cleanly.
    rng = np.random.RandomState(2)
    base = rng.randn(2, 16, 16, 32).astype(np.float32)
    x16 = jnp.asarray(base + 8.0).astype(jnp.bfloat16)
    m = GroupNorm(num_groups=4)
    v = m.init(jax.random.PRNGKey(0), x16.astype(jnp.float32))
    got = m.apply(v, x16).astype(jnp.float32)
    want = nn.GroupNorm(num_groups=4).apply(v, x16.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)
