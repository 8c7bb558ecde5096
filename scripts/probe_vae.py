"""Section-level cost split of the VAE decoder at 512px (the bench image
half's dominant fixed cost: ~125 ms at B=2, round-4 probe_image_half run).

Times the full `Decoder.apply` in bf16 and fp32, an attention-stripped
ablation, standalone per-scale ResnetBlock timings vs the conv roofline,
and the raw 3x3 convs per scale.

Measurement discipline as in probe_unet_sections.py: slope between two
data-dependent chain lengths inside one jit; only a scalar crosses the
relay per sample.
"""
import sys

sys.path.insert(0, "/root/repo")
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

import mm_interleaved_tpu.models.sd.vae as vae_mod
from mm_interleaved_tpu.models.sd.vae import (
    AttnBlock,
    Decoder,
    ResnetBlock,
    VAEConfig,
)

SHORT = int(os.environ.get("PROBE_SHORT", "2"))
LONG = int(os.environ.get("PROBE_LONG", "6"))
SECTIONS = set(os.environ.get(
    "PROBE_SECTIONS", "full,attn,rblocks,convs").split(","))
TRIALS = 3
B = 2  # bench latency batch (VAE decode runs on the un-doubled batch)


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
cfg = VAEConfig()
z = jnp.asarray(rng.randn(B, 64, 64, 4).astype(np.float32))

dec = Decoder(cfg)
v = jax.jit(dec.init)(jax.random.PRNGKey(0), z)
v16 = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v
)

if "full" in SECTIONS or "attn" in SECTIONS:
    t16 = timeit(lambda x: dec.apply(v16, x, jnp.bfloat16), z)
    print(f"decoder 512px B{B} bf16: {t16:7.2f} ms", flush=True)
    t32 = timeit(lambda x: dec.apply(v, x, jnp.float32), z)
    print(f"decoder 512px B{B} fp32: {t32:7.2f} ms", flush=True)

if "attn" in SECTIONS:
    _orig = AttnBlock.__call__
    AttnBlock.__call__ = lambda self, x, dtype=jnp.float32: x
    t_no = timeit(lambda x: dec.apply(v16, x, jnp.bfloat16), z)
    AttnBlock.__call__ = _orig
    print(f"  mid-attn stripped (bf16): {t_no:7.2f} ms "
          f"(attn ~{t16 - t_no:5.2f} ms)", flush=True)

if "rblocks" in SECTIONS:
    print("=== ResnetBlock per scale (GN+silu+conv3x3 x2) bf16 ===",
          flush=True)
    # (spatial, ch, count in decoder incl. mid)
    for size, ch, count in [(64, 512, 5), (128, 512, 3), (256, 256, 3),
                            (512, 128, 3)]:
        xs = jnp.asarray(
            rng.randn(B, size, size, ch).astype(np.float32), jnp.bfloat16
        )
        blk = ResnetBlock(ch, 32)
        bv = jax.jit(blk.init)(jax.random.PRNGKey(0), xs)
        bv = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, bv,
        )
        tms = timeit(lambda y: blk.apply(bv, y, jnp.bfloat16), xs)
        fl = 2 * B * size * size * 9 * ch * ch * 2  # two 3x3 convs
        by = B * size * size * ch * 2 * 8  # ~8 bf16 passes over the map
        print(f"  {size:3d}px c{ch:4d} x{count}: {tms:7.3f} ms | conv "
              f"roofline {fl / 197e12 * 1e3:6.3f} ms "
              f"({fl / 197e9 / tms * 100:3.0f}%) | hbm "
              f"{by / 400e9 * 1e3:6.3f} ms", flush=True)

if "convs" in SECTIONS:
    print("=== raw conv3x3 per scale bf16 ===", flush=True)
    for size, ch in [(64, 512), (128, 512), (256, 256), (512, 128)]:
        xs = jnp.asarray(
            rng.randn(B, size, size, ch).astype(np.float32), jnp.bfloat16
        )
        conv = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16)
        cv = jax.jit(conv.init)(jax.random.PRNGKey(0), xs)
        cv = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, cv,
        )
        tms = timeit(lambda y: conv.apply(cv, y), xs)
        fl = B * size * size * 9 * ch * ch * 2
        print(f"  {size:3d}px c{ch:4d}: {tms:7.3f} ms | roofline "
              f"{fl / 197e12 * 1e3:6.3f} ms "
              f"({fl / 197e9 / tms * 100:3.0f}%)", flush=True)
