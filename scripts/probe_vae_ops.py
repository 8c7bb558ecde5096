"""Per-op timing at the VAE decoder's expensive scales (256px/c256,
512px/c128): GroupNorm, silu, conv3x3, and composed GN+silu+conv — to find
where the 17-32% MXU ResnetBlocks lose time (probe_vae.py r4).

Long data-dependent chains (default 4 vs 12) because these ops are
sub-millisecond; scalar-only host pulls.
"""
import sys

sys.path.insert(0, "/root/repo")
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mm_interleaved_tpu.ops.group_norm import group_norm

SHORT = int(os.environ.get("PROBE_SHORT", "4"))
LONG = int(os.environ.get("PROBE_LONG", "12"))
TRIALS = 3
B = 2


def _chain(fn, n, x, *rest):
    @jax.jit
    def chained(x, *rest):
        out = x
        for _ in range(n):
            out = fn(x, *rest)
            x = x + out.ravel()[0].astype(x.dtype) * 0
        return out.ravel()[0]

    np.asarray(chained(x, *rest))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(chained(x, *rest))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, x, *rest):
    return (
        _chain(fn, LONG, x, *rest) - _chain(fn, SHORT, x, *rest)
    ) / (LONG - SHORT) * 1000


rng = np.random.RandomState(0)

for size, ch in [(256, 256), (512, 128)]:
    xs = jnp.asarray(
        rng.randn(B, size, size, ch).astype(np.float32), jnp.bfloat16
    )
    scale = jnp.ones((ch,), jnp.float32)
    bias = jnp.zeros((ch,), jnp.float32)
    conv = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16)
    cv = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        jax.jit(conv.init)(jax.random.PRNGKey(0), xs),
    )
    bytes_rw = 2 * B * size * size * ch * 2  # one bf16 read + write
    fl = B * size * size * 9 * ch * ch * 2

    t_gn = timeit(
        lambda y: group_norm(y, scale, bias, 32, dtype=jnp.bfloat16), xs
    )
    t_silu = timeit(lambda y: nn.silu(y), xs)
    t_conv = timeit(lambda y: conv.apply(cv, y), xs)
    t_gsc = timeit(
        lambda y: conv.apply(cv, nn.silu(
            group_norm(y, scale, bias, 32, dtype=jnp.bfloat16)
        )), xs,
    )
    t_flax_gn = timeit(
        lambda y: nn.GroupNorm(num_groups=32, epsilon=1e-5,
                               dtype=jnp.bfloat16, use_bias=False,
                               use_scale=False).apply({}, y), xs,
    )
    print(f"--- {size}px c{ch} (bf16, B={B}; 1 pass r+w = "
          f"{bytes_rw/400e9*1e3:5.3f} ms @400GB/s; conv roofline "
          f"{fl/197e12*1e3:5.3f} ms) ---", flush=True)
    print(f"  group_norm(ours): {t_gn:7.3f} ms", flush=True)
    print(f"  nn.GroupNorm:     {t_flax_gn:7.3f} ms", flush=True)
    print(f"  silu:             {t_silu:7.3f} ms", flush=True)
    print(f"  conv3x3:          {t_conv:7.3f} ms "
          f"({fl/197e9/t_conv*100:3.0f}% MXU)", flush=True)
    print(f"  GN+silu+conv:     {t_gsc:7.3f} ms (sum of parts "
          f"{t_gn + t_silu + t_conv:6.3f})", flush=True)
