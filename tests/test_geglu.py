"""Fused GEGLU MLP kernel (ops/geglu.py) vs the unfused XLA math."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from mm_interleaved_tpu.ops.geglu import geglu_mlp, _tile_for


@pytest.mark.parametrize("C,T", [(320, 1024), (640, 512)])
def test_geglu_matches_unfused(C, T):
    rng = np.random.RandomState(0)
    B = 2
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w1 = jnp.asarray(rng.randn(C, 8 * C).astype(np.float32) * 0.02)
    b1 = jnp.asarray(rng.randn(8 * C).astype(np.float32) * 0.02)
    w2 = jnp.asarray(rng.randn(4 * C, C).astype(np.float32) * 0.02)
    b2 = jnp.asarray(rng.randn(C).astype(np.float32) * 0.02)

    got = geglu_mlp(x, w1, b1, w2, b2, interpret=True)

    g = x @ w1 + b1
    a, b = jnp.split(g, 2, axis=-1)
    want = (a * nn.gelu(b, approximate=False)) @ w2 + b2
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_tile_divides_unet_token_counts():
    # every attention-bearing UNet scale must be tileable: 64px/32px at
    # C=320/640 (C=1280 scales stay on the XLA path)
    assert 4096 % _tile_for(320) == 0
    assert 1024 % _tile_for(640) == 0
