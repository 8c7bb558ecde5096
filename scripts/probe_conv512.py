"""What dominates the VAE decoder's 512px stage: convs or norms?

Builds the up3 stage's op sequence as standalone stacks INSIDE one jit
(single dispatch, total >= several ms — reliable on the relay, unlike
sub-ms two-chain slopes): conv-only, GN-only, silu-only, the full
GN+silu+conv pattern, and conv variants (NCHW, im2col-GEMM) at the same
shapes.  All bf16, B=2.
"""
import sys

sys.path.insert(0, "/root/repo")
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mm_interleaved_tpu.ops.group_norm import group_norm

TRIALS = int(os.environ.get("PROBE_TRIALS", "5"))
B = 2
S = 512
DT = jnp.bfloat16

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, S, S, 128).astype(np.float32), DT)
x256 = jnp.asarray(rng.randn(B, S, S, 256).astype(np.float32), DT)

# up3 conv shapes: RB0: 256->128 (+1x1 shortcut), RB1/RB2: 128->128 x2 each,
# + conv_norm_out/conv_out ~ small.  8 3x3 convs total-ish; use 8x 128->128
# as the canonical stack plus one 256->128.
k33 = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32), DT) * 0.02
k33_in = jnp.asarray(rng.randn(3, 3, 256, 128).astype(np.float32), DT) * 0.02

dn = lax.conv_dimension_numbers((B, S, S, 128), (3, 3, 128, 128),
                                ("NHWC", "HWIO", "NHWC"))


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
print(f"relay floor: {floor:6.1f} ms", flush=True)
N = 8
fl_one = B * S * S * 9 * 128 * 128 * 2
print(f"(one 3x3 conv 512px c128 roofline: {fl_one/197e12*1e3:5.3f} ms; "
      f"one bf16 r+w pass: {2*B*S*S*128*2/400e9*1e3:5.3f} ms)", flush=True)


def stack_conv(x, k):
    for _ in range(N):
        x = conv(x, k)
    return x


def stack_gn(x):
    sc = jnp.ones((128,), jnp.float32)
    bi = jnp.zeros((128,), jnp.float32)
    for _ in range(N):
        x = group_norm(x, sc, bi, 32, dtype=DT)
    return x


def stack_silu(x):
    for _ in range(N):
        x = jax.nn.silu(x)
    return x


def stack_full(x, k):
    sc = jnp.ones((128,), jnp.float32)
    bi = jnp.zeros((128,), jnp.float32)
    for _ in range(N):
        x = conv(jax.nn.silu(group_norm(x, sc, bi, 32, dtype=DT)), k)
    return x


t = timeit(jax.jit(stack_conv), x0, k33) - floor
print(f"conv x{N}:          {t:7.2f} ms ({t/N:6.3f}/op, "
      f"{fl_one/197e9/(t/N)*100:3.0f}% MXU)", flush=True)
t = timeit(jax.jit(stack_gn), x0) - floor
print(f"group_norm x{N}:    {t:7.2f} ms ({t/N:6.3f}/op)", flush=True)
t = timeit(jax.jit(stack_silu), x0) - floor
print(f"silu x{N}:          {t:7.2f} ms ({t/N:6.3f}/op)", flush=True)
t = timeit(jax.jit(stack_full), x0, k33) - floor
print(f"GN+silu+conv x{N}:  {t:7.2f} ms ({t/N:6.3f}/group)", flush=True)

# --- variants for the conv itself ---
xc = jnp.moveaxis(x0, -1, 1)  # NCHW
kc = jnp.transpose(k33, (3, 2, 0, 1))  # OIHW


def stack_conv_nchw(x, k):
    for _ in range(N):
        x = lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=DT,
        )
    return x


t = timeit(jax.jit(stack_conv_nchw), xc, kc) - floor
print(f"conv NCHW x{N}:     {t:7.2f} ms ({t/N:6.3f}/op)", flush=True)


def conv_im2col(x, k):
    # 9 shifted reads -> one GEMM [B*S*S, 9*128] @ [9*128, 128]
    pads = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate([
        pads[:, dy:dy + S, dx:dx + S, :]
        for dy in range(3) for dx in range(3)
    ], axis=-1)
    return jnp.einsum(
        "bhwk,kc->bhwc", cols, k.reshape(9 * 128, 128),
        preferred_element_type=DT,
    )


def stack_im2col(x, k):
    for _ in range(N):
        x = conv_im2col(x, k)
    return x


t = timeit(jax.jit(stack_im2col), x0, k33) - floor
print(f"conv im2col x{N}:   {t:7.2f} ms ({t/N:6.3f}/op)", flush=True)

# wider channel control: same spatial at c256 (up2's width)
k256 = jnp.asarray(rng.randn(3, 3, 256, 256).astype(np.float32), DT) * 0.02
fl256 = B * S * S * 9 * 256 * 256 * 2


def stack_conv256(x, k):
    for _ in range(4):
        x = conv(x, k)
    return x


t = timeit(jax.jit(stack_conv256), x256, k256) - floor
print(f"conv c256 x4:      {t:7.2f} ms ({t/4:6.3f}/op, "
      f"{fl256/197e9/(t/4)*100:3.0f}% MXU)", flush=True)


def stack_full_barrier(x, k):
    sc = jnp.ones((128,), jnp.float32)
    bi = jnp.zeros((128,), jnp.float32)
    for _ in range(N):
        h = jax.nn.silu(group_norm(x, sc, bi, 32, dtype=DT))
        # materialize the conv input: without this XLA fuses the elementwise
        # chain into the conv and recomputes it per 3x3 tap (9x)
        h = lax.optimization_barrier(h)
        x = conv(h, k)
    return x


t = timeit(jax.jit(stack_full_barrier), x0, k33) - floor
print(f"GN+silu+|barrier|+conv x{N}: {t:7.2f} ms ({t/N:6.3f}/group)",
      flush=True)


def stack_silu_conv(x, k):
    for _ in range(N):
        x = conv(jax.nn.silu(x), k)
    return x


t = timeit(jax.jit(stack_silu_conv), x0, k33) - floor
print(f"silu+conv x{N}:              {t:7.2f} ms ({t/N:6.3f}/group)",
      flush=True)
