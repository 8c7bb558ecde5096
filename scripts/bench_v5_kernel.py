"""On-chip v4 vs v5 deformable-attention comparison: forward and fwd+bwd
at UNet/prefill shapes, under realistic (clustered) and adversarial
(uniform) sampling-location distributions.

Measurement discipline (docs/KERNELS.md): dispatch rides a relay, so each
variant runs as a chain of CHAIN *data-dependent* calls inside one jit
(defeats CSE/DCE) and only a scalar is pulled to the host."""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v4 import (
    ms_deform_attn_pallas_v4,
    ms_deform_attn_pallas_v4_trainable,
)
from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v5 import (
    ms_deform_attn_pallas_v5,
    ms_deform_attn_pallas_v5_trainable,
)

CHAIN = 8
TRIALS = 5


def timeit(fn, value, loc, w):
    """fn(value, loc, w) -> array or tree; chained by perturbing loc with a
    zero derived from the previous output."""

    @jax.jit
    def chained(value, loc, w):
        out = None
        l = loc
        for _ in range(CHAIN):
            out = fn(value, l, w)
            leaf = jax.tree_util.tree_leaves(out)[0]
            l = loc + (leaf.ravel()[0] * 0).astype(loc.dtype)
        return jax.tree_util.tree_leaves(out)[0].ravel()[0]

    r = chained(value, loc, w)
    np.asarray(r)
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        r = chained(value, loc, w)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1000


def make_case(kind):
    rng = np.random.RandomState(0)
    if kind.startswith("unet"):
        B, Q, H, D, P = 4, 4096, 16, 64, 8
        shapes = ((64, 64), (32, 32), (16, 16), (8, 8))
        gy, gx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        ref = np.stack([(gx + .5) / 64, (gy + .5) / 64], -1).reshape(1, Q, 2)
        loc = ref[:, :, None, None, None, :] + rng.uniform(
            -1 / 64, 1 / 64, (B, Q, H, len(shapes), P, 2))
    else:
        B, Q, H, D, P = 16, 512, 16, 64, 8
        shapes = ((32, 32), (16, 16), (8, 8))
        loc = 0.5 + rng.uniform(
            -3 / 16, 3 / 16, (B, Q, H, len(shapes), P, 2))
    if kind.endswith("uniform"):
        loc = rng.uniform(0.02, 0.98, loc.shape)
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.randn(B, S, H, D).astype(np.float32) * .1, jnp.bfloat16)
    loc = jnp.asarray(loc.astype(np.float32))
    w = jnp.asarray(rng.rand(B, Q, H, len(shapes), P).astype(np.float32))
    return shapes, value, loc, w


for kind in ["unet", "unet-uniform", "prefill", "prefill-uniform"]:
    shapes, value, loc, w = make_case(kind)

    t4 = timeit(lambda v, l, a: ms_deform_attn_pallas_v4(v, shapes, l, a),
                value, loc, w)
    t5 = timeit(lambda v, l, a: ms_deform_attn_pallas_v5(v, shapes, l, a),
                value, loc, w)

    def loss4(v, l, a):
        return (ms_deform_attn_pallas_v4_trainable(
            v, shapes, l, a).astype(jnp.float32) ** 2).sum()

    def loss5(v, l, a):
        return (ms_deform_attn_pallas_v5_trainable(
            v, shapes, l, a).astype(jnp.float32) ** 2).sum()

    g4 = timeit(jax.grad(loss4, argnums=(0, 1, 2)), value, loc, w)
    g5 = timeit(jax.grad(loss5, argnums=(0, 1, 2)), value, loc, w)

    # parity spot check on-chip
    o4 = np.asarray(ms_deform_attn_pallas_v4(
        value, shapes, loc, w), np.float32)
    o5 = np.asarray(ms_deform_attn_pallas_v5(
        value, shapes, loc, w), np.float32)
    err = np.abs(o4 - o5).max() / (np.abs(o4).max() + 1e-9)
    print(f"{kind:16s} fwd v4 {t4:7.1f} ms | v5 {t5:7.1f} ms ({t4/t5:4.1f}x)"
          f" | fwd+bwd v4 {g4:7.1f} | v5 {g5:7.1f} ({g4/g5:4.1f}x)"
          f" | relerr {err:.2e}", flush=True)
