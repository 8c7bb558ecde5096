"""Pallas separable deformable-attention kernel vs the XLA oracle
(interpret mode on CPU; on-chip parity checked in scripts/perf_probe.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.ops.ms_deform_attn import ms_deform_attn
from mm_interleaved_tpu.ops.ms_deform_attn_pallas import (
    ms_deform_attn_pallas,
    ms_deform_attn_pallas_v2,
)


@pytest.mark.parametrize("shapes,Lq,P", [
    (((12, 16), (6, 8), (3, 4)), 50, 6),  # non-square levels, odd sizes
    (((16, 16), (8, 8)), 40, 8),
    (((8, 8),), 33, 2),  # rows below the sublane multiple (padding path)
])
def test_matches_oracle_interpret(shapes, Lq, P):
    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in shapes)
    B, H, D = 2, 4, 16
    L = len(shapes)
    value = rng.randn(B, S, H, D).astype(np.float32) * 0.1
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, H, L, P).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    got = ms_deform_attn_pallas(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        tile_q=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("shapes,Lq,P", [
    (((12, 16), (6, 8), (3, 4)), 50, 6),  # non-square, odd sizes, pc=2
    (((16, 16), (8, 8)), 40, 8),          # pc hits 4/8 on small budgets
    (((8, 8),), 33, 2),
])
def test_v2_matches_oracle_interpret(shapes, Lq, P):
    """v2 (stacked points + D-major values + repeat expansion) keeps the
    exact f32 numerics of the oracle."""
    rng = np.random.RandomState(0)
    S = sum(h * w for h, w in shapes)
    B, H, D = 2, 4, 16
    L = len(shapes)
    value = rng.randn(B, S, H, D).astype(np.float32) * 0.1
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, H, L, P).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    for budget in (64 * 1024, 2 * 1024 * 1024):  # force different chunkings
        got = ms_deform_attn_pallas_v2(
            jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
            tile_q=32, vmem_budget=budget, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


def test_query_padding():
    """Q not a multiple of tile_q pads and unpads correctly."""
    rng = np.random.RandomState(1)
    shapes = ((8, 8),)
    value = rng.randn(1, 64, 2, 8).astype(np.float32)
    loc = rng.rand(1, 19, 2, 1, 3, 2).astype(np.float32)
    w = rng.rand(1, 19, 2, 1, 3).astype(np.float32)
    want = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    got = ms_deform_attn_pallas(
        jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
        tile_q=16, interpret=True,
    )
    assert got.shape == want.shape == (1, 19, 16)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )
