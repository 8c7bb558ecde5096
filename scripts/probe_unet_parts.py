"""On-chip cost split of the SD UNet at CFG batch: conv / groupnorm /
attention blocks at each scale, vs bf16 roofline.

Per-op time is the SLOPE between two chain lengths inside one jit
((T_long - T_short) / (LONG - SHORT)) — a single relay dispatch costs
~25 ms, which would swamp any sub-millisecond op measured per-call."""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

SHORT, LONG = 8, 40
TRIALS = 4
B = 4  # bench batch 2 with CFG


def _chain(fn, n, *args):
    @jax.jit
    def chained(x, *rest):
        out = x
        for _ in range(n):
            out = fn(out, *rest)
        return out.ravel()[0]

    np.asarray(chained(*args))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        r = chained(*args)
        np.asarray(r)
        best = min(best, time.perf_counter() - t0)
    return best


def timeit(fn, *args):
    return (_chain(fn, LONG, *args) - _chain(fn, SHORT, *args)) \
        / (LONG - SHORT) * 1000


rng = np.random.RandomState(0)

print("=== 3x3 conv, bf16, per scale (ms, vs roofline) ===", flush=True)
for size, ch in [(64, 320), (32, 640), (16, 1280), (8, 1280)]:
    x = jnp.asarray(rng.randn(B, size, size, ch).astype(np.float32),
                    jnp.bfloat16)
    conv = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16)
    v = conv.init(jax.random.PRNGKey(0), x)
    t = timeit(lambda y: conv.apply(v, y), x)
    fl = 2 * B * size * size * 9 * ch * ch
    print(f"  {size:3d}px c{ch:5d}: {t:6.2f} ms | roofline "
          f"{fl / 197e12 * 1e3:5.2f} ms | {fl / 197e12 * 1e3 / t * 100:4.0f}%",
          flush=True)

print("=== GroupNorm32 (no dtype -> f32 out) vs dtype=bf16 ===", flush=True)
for size, ch in [(64, 320), (32, 640)]:
    x = jnp.asarray(rng.randn(B, size, size, ch).astype(np.float32),
                    jnp.bfloat16)
    gn32 = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    gnbf = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    v = gn32.init(jax.random.PRNGKey(0), x)
    t32 = timeit(lambda y: gn32.apply(v, y).astype(jnp.bfloat16), x)
    tbf = timeit(lambda y: gnbf.apply(v, y), x)
    print(f"  {size:3d}px c{ch:5d}: f32 {t32:5.2f} ms | bf16 {tbf:5.2f} ms",
          flush=True)

print("=== self-attention T=4096 d=320 h=5 (flash path) ===", flush=True)
from mm_interleaved_tpu.ops.attention import dot_product_attention

x = jnp.asarray(rng.randn(B, 4096, 5, 64).astype(np.float32), jnp.bfloat16)


def attn(q):
    return dot_product_attention(q, q, q).astype(q.dtype)


t = timeit(attn, x)
fl = 2 * 2 * B * 5 * 4096 * 4096 * 64
print(f"  {t:6.2f} ms | roofline {fl / 197e12 * 1e3:5.2f} ms", flush=True)

print("=== full ResnetBlock 64px ===", flush=True)
from mm_interleaved_tpu.models.sd.unet import ResnetBlock

x = jnp.asarray(rng.randn(B, 64, 64, 320).astype(np.float32), jnp.bfloat16)
temb = jnp.asarray(rng.randn(B, 1280).astype(np.float32), jnp.bfloat16)
blk = ResnetBlock(320, 32, jnp.bfloat16)
v = blk.init(jax.random.PRNGKey(0), x, temb)
t = timeit(lambda y: blk.apply(v, y, temb).astype(jnp.bfloat16), x)
print(f"  ResnetBlock as-is: {t:6.2f} ms", flush=True)
