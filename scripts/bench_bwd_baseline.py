"""XLA-autodiff fwd+bwd baseline at UNet/prefill shapes, measured with the
same data-dependent chain + scalar sync as bench_v5_kernel.py."""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.ops.ms_deform_attn import ms_deform_attn

CHAIN = 8
TRIALS = 5


def timeit(fn, value, loc, w):
    @jax.jit
    def chained(value, loc, w):
        out = None
        l = loc
        for _ in range(CHAIN):
            out = fn(value, l, w)
            leaf = jax.tree_util.tree_leaves(out)[0]
            l = loc + (leaf.ravel()[0] * 0).astype(loc.dtype)
        return jax.tree_util.tree_leaves(out)[0].ravel()[0]

    np.asarray(chained(value, loc, w))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        r = chained(value, loc, w)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1000


rng = np.random.RandomState(0)
for name, (B, Q, shapes, P, H, D) in {
    "unet": (4, 4096, ((64, 64), (32, 32), (16, 16), (8, 8)), 8, 16, 64),
    "prefill": (16, 512, ((32, 32), (16, 16), (8, 8)), 8, 16, 64),
}.items():
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32) * .1,
                        jnp.bfloat16)
    if name == "unet":
        gy, gx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        ref = np.stack([(gx + .5) / 64, (gy + .5) / 64], -1).reshape(1, Q, 2)
        loc = ref[:, :, None, None, None, :] + rng.uniform(
            -1 / 64, 1 / 64, (B, Q, H, L, P, 2))
    else:
        loc = 0.5 + rng.uniform(-3 / 16, 3 / 16, (B, Q, H, L, P, 2))
    loc = jnp.asarray(loc.astype(np.float32))
    w = jnp.asarray(rng.rand(B, Q, H, L, P).astype(np.float32))

    def loss(v, l, a):
        return (ms_deform_attn(v, shapes, l, a).astype(jnp.float32) ** 2).sum()

    t_fwd = timeit(lambda v, l, a: ms_deform_attn(v, shapes, l, a),
                   value, loc, w)
    t_fb = timeit(jax.grad(loss, argnums=(0, 1, 2)), value, loc, w)
    print(f"{name}: XLA gather fwd {t_fwd:.1f} ms | fwd+bwd autodiff "
          f"{t_fb:.1f} ms", flush=True)
