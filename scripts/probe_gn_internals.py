"""Bisect group_norm's cost at 512px/c128 (probe_conv512 r4: GN+silu+conv
runs at 5.5 ms/group while conv alone is 0.8 and silu+conv 1.3).

Stacks of N data-dependent ops inside one jit; all report total ms minus
the relay floor (floor variance ~±6 ms, stacks sized to dominate it).
"""
import sys

sys.path.insert(0, "/root/repo")
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

TRIALS = int(os.environ.get("PROBE_TRIALS", "5"))
B, S, C, G = 2, 512, 128, 32
N = 12
DT = jnp.bfloat16

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, S, S, C).astype(np.float32), DT)
w0 = jnp.asarray(rng.rand(B, C).astype(np.float32))
k33 = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32), DT) * 0.02


def conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=DT,
    )


def timeit(jitted, *args):
    def sync(r):
        return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])

    sync(jitted(*args))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        sync(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


floor = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(0))
print(f"relay floor: {floor:6.1f} ms   (1 bf16 pass r+w = "
      f"{2*B*S*S*C*2/400e9*1e3:5.3f} ms)", flush=True)


def report(name, fn, *args):
    t = timeit(jax.jit(fn), *args) - floor
    print(f"  {name:34s}: {t:7.2f} ms total ({t/N:6.3f}/op)", flush=True)


def stats(x):
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))
    s2 = jnp.sum(xf * xf, axis=(1, 2))
    return s1, s2


def wb_from(s1, s2):
    n = float(S * S * (C // G))
    g1 = s1.reshape(B, G, C // G).sum(-1)
    g2 = s2.reshape(B, G, C // G).sum(-1)
    mean = g1 / n
    var = g2 / n - mean * mean
    inv = lax.rsqrt(var + 1e-5)
    w = jnp.repeat(inv, C // G, -1)
    b = -jnp.repeat(mean, C // G, -1) * w
    return w, b


def stack_stats(x):
    acc = jnp.float32(0)
    for _ in range(N):
        s1, s2 = stats(x)
        acc = acc + s1.ravel()[0] + s2.ravel()[0]
        x = x + acc.astype(x.dtype) * 0
    return acc


def stack_fma_f32(x, w):
    for _ in range(N):
        y = x.astype(jnp.float32) * w[:, None, None, :] + 1.0
        x = y.astype(DT)
    return x


def stack_fma_bf16(x, w):
    wb = w.astype(DT)
    for _ in range(N):
        x = x * wb[:, None, None, :] + jnp.asarray(1.0, DT)
    return x


def gn_f32(x):
    s1, s2 = stats(x)
    w, b = wb_from(s1, s2)
    y = x.astype(jnp.float32) * w[:, None, None, :] + b[:, None, None, :]
    return y.astype(DT)


def gn_bf16apply(x):
    s1, s2 = stats(x)
    w, b = wb_from(s1, s2)
    return x * w.astype(DT)[:, None, None, :] + b.astype(DT)[:, None, None, :]


def stack_gn_conv(gn):
    def f(x, k):
        for _ in range(N):
            x = conv(jax.nn.silu(gn(x)), k)
        return x
    return f


report("stats only", stack_stats, x0)
report("fma f32 (x->f32*w->bf16)", stack_fma_f32, x0, w0)
report("fma bf16", stack_fma_bf16, x0, w0)
report("gn_f32+silu+conv", stack_gn_conv(gn_f32), x0, k33)
report("gn_bf16apply+silu+conv", stack_gn_conv(gn_bf16apply), x0, k33)


def gn_barrier(x):
    y = gn_bf16apply(x)
    return lax.optimization_barrier(y)


report("gn_bf16+barrier+silu+conv", stack_gn_conv(gn_barrier), x0, k33)


def stack_stats_conv(x, k):
    # stats consumed but apply skipped: isolates the stats+conv interaction
    for _ in range(N):
        s1, s2 = stats(x)
        w, b = wb_from(s1, s2)
        x = conv(jax.nn.silu(x * (1 + 0 * w.astype(DT)[:, None, None, :])), k)
    return x


report("stats+identity-fma+silu+conv", stack_stats_conv, x0, k33)


def stack_fma_indep_conv(x, k, w):
    wb = w.astype(DT)
    for _ in range(N):
        x = conv(jax.nn.silu(x * wb[:, None, None, :]), k)
    return x


report("fma(indep w)+silu+conv", stack_fma_indep_conv, x0, k33, w0)


def gn_wbarrier(x):
    s1, s2 = stats(x)
    w, b = wb_from(s1, s2)
    w, b = lax.optimization_barrier((w, b))  # decouple only the tiny stats
    return x * w.astype(DT)[:, None, None, :] + b.astype(DT)[:, None, None, :]


report("gn_bf16(w-barrier)+silu+conv", stack_gn_conv(gn_wbarrier), x0, k33)
