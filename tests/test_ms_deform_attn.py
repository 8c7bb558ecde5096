"""Parity tests for the TPU-native multi-scale deformable attention.

Mirrors the reference's op test strategy
(`mm_interleaved/models/utils/ops/tests/forward_backward_error.py`): compare
against an independent grid_sample-based oracle (torch CPU) across dtypes and
shapes, forward and backward.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mm_interleaved_tpu.ops import ms_deform_attn
from mm_interleaved_tpu.ops.ms_deform_attn import ms_deform_attn_multi_image


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent oracle using torch.grid_sample (align_corners=False,
    zeros padding) — the same numerical contract as the reference CUDA op."""
    value = torch.from_numpy(np.asarray(value, dtype=np.float64))
    sampling_locations = torch.from_numpy(
        np.asarray(sampling_locations, dtype=np.float64)
    )
    attention_weights = torch.from_numpy(
        np.asarray(attention_weights, dtype=np.float64)
    )
    N, S, M, D = value.shape
    _, Lq, M, L, P, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    out_per_level = []
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N * M, D, h, w)
        g = sampling_grids[:, :, :, lid].permute(0, 2, 1, 3, 4).flatten(0, 1)
        s = F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # [N*M, D, Lq, P]
        out_per_level.append(s)
    attention_weights = attention_weights.permute(0, 2, 1, 3, 4).reshape(
        N * M, 1, Lq, L * P
    )
    out = (
        (torch.stack(out_per_level, dim=-2).flatten(-2) * attention_weights)
        .sum(-1)
        .view(N, M * D, Lq)
    )
    return out.transpose(1, 2).contiguous().numpy()


def make_inputs(seed, B=2, Lq=8, heads=4, D=16, P=6,
                shapes=((12, 16), (6, 8), (3, 4))):
    rng = np.random.RandomState(seed)
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.randn(B, S, heads, D).astype(np.float32) * 0.1
    # include out-of-range locations to exercise zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, heads, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Lq, heads, L, P).astype(np.float32) + 1e-3
    w = w / w.sum(axis=(3, 4), keepdims=True)
    return value, shapes, loc, w


def test_forward_matches_oracle():
    # Lq=8 -> dense one-hot small-Q path
    value, shapes, loc, w = make_inputs(0)
    got = np.asarray(ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w)))
    want = torch_oracle(value, shapes, loc, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_forward_matches_oracle_large_q():
    # Lq=50 -> gather path
    value, shapes, loc, w = make_inputs(0, Lq=50)
    got = np.asarray(ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w)))
    want = torch_oracle(value, shapes, loc, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_forward_bf16_close():
    value, shapes, loc, w = make_inputs(1)
    got = ms_deform_attn(
        jnp.array(value, dtype=jnp.bfloat16),
        shapes,
        jnp.array(loc, dtype=jnp.bfloat16),
        jnp.array(w, dtype=jnp.bfloat16),
    )
    assert got.dtype == jnp.bfloat16
    want = torch_oracle(value, shapes, loc, w)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), want, rtol=0.05, atol=0.02
    )


def test_backward_matches_oracle():
    value, shapes, loc, w = make_inputs(2, B=1, Lq=4, heads=2, D=4, P=3)

    def f_jax(v, l, a):
        return (ms_deform_attn(v, shapes, l, a) ** 2).sum()

    gv, gl, ga = jax.grad(f_jax, argnums=(0, 1, 2))(
        jnp.array(value), jnp.array(loc), jnp.array(w)
    )

    vt = torch.tensor(np.float64(value), requires_grad=True)
    lt = torch.tensor(np.float64(loc), requires_grad=True)
    at = torch.tensor(np.float64(w), requires_grad=True)
    N, S, M, D = vt.shape
    _, Lq, M, L, P, _ = lt.shape
    value_list = vt.split([h * w_ for h, w_ in shapes], dim=1)
    grids = 2 * lt - 1
    outs = []
    for lid, (h, w_) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N * M, D, h, w_)
        g = grids[:, :, :, lid].permute(0, 2, 1, 3, 4).flatten(0, 1)
        outs.append(F.grid_sample(v, g, mode="bilinear",
                                  padding_mode="zeros", align_corners=False))
    aw = at.permute(0, 2, 1, 3, 4).reshape(N * M, 1, Lq, L * P)
    out = ((torch.stack(outs, dim=-2).flatten(-2) * aw).sum(-1)
           .view(N, M * D, Lq).transpose(1, 2))
    (out ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), vt.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), at.grad.numpy(), rtol=1e-3, atol=1e-4)
    # grad wrt locations only matches where bilinear weights are differentiable
    # (away from integer grid lines); random floats are a.s. in the interior.
    np.testing.assert_allclose(np.asarray(gl), lt.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_multi_image_fold_equals_flat():
    """Folding images into batch == treating them as extra levels."""
    rng = np.random.RandomState(3)
    B, n_img, heads, D, Lq, P = 2, 3, 2, 8, 5, 4
    level_shapes = ((8, 8), (4, 4))
    hw = sum(h * w for h, w in level_shapes)
    value = rng.randn(B, n_img, hw, heads, D).astype(np.float32)
    loc = rng.rand(B, Lq, heads, n_img, len(level_shapes), P, 2).astype(np.float32)
    w = rng.rand(B, Lq, heads, n_img, len(level_shapes), P).astype(np.float32)

    got = ms_deform_attn_multi_image(
        jnp.array(value), level_shapes, jnp.array(loc), jnp.array(w)
    )

    # flat formulation: concatenate images along S, levels repeat per image
    flat_shapes = tuple(level_shapes) * n_img
    value_flat = value.reshape(B, n_img * hw, heads, D)
    loc_flat = loc.reshape(B, Lq, heads, n_img * len(level_shapes), P, 2)
    w_flat = w.reshape(B, Lq, heads, n_img * len(level_shapes), P)
    want = ms_deform_attn(
        jnp.array(value_flat), flat_shapes, jnp.array(loc_flat), jnp.array(w_flat)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_zero_outside_grid():
    """Locations far outside the grid must contribute exactly zero."""
    shapes = ((4, 4),)
    value = np.ones((1, 16, 1, 2), dtype=np.float32)
    loc = np.full((1, 1, 1, 1, 2, 2), 5.0, dtype=np.float32)
    w = np.ones((1, 1, 1, 1, 2), dtype=np.float32)
    out = ms_deform_attn(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    np.testing.assert_array_equal(np.asarray(out), 0.0)
