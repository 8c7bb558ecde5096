"""Section-level cost split of the full SD-2.1 UNet step at CFG batch.

Times the full `UNet2DConditionModel.apply`, then an attention-stripped
ablation (monkeypatching SpatialTransformer), standalone per-scale
ResnetBlock timings vs the conv roofline (`rblocks` section), and a
single full TransformerBlock per scale (self+cross+GEGLU+LN) vs roofline.

Measurement discipline as in probe_unet_parts.py: slope between two
data-dependent chain lengths inside one jit; only a scalar crosses the
relay per sample.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

import mm_interleaved_tpu.models.sd.unet as unet_mod
from mm_interleaved_tpu.models.sd.unet import (
    TransformerBlock,
    UNet2DConditionModel,
    UNetConfig,
)

import os
# sub-ms blocks need long chains to rise above relay dispatch noise
SHORT = int(os.environ.get("PROBE_SHORT", "2"))
LONG = int(os.environ.get("PROBE_LONG", "6"))
SECTIONS = set(os.environ.get(
    "PROBE_SECTIONS", "full,attn,rblocks,blocks").split(","))
TRIALS = 3
B = 4  # bench batch 2 with CFG


def _chain(fn, n, x, *rest):
    @jax.jit
    def chained(x, *rest):
        out = x
        for _ in range(n):
            out = fn(out, *rest)
            # re-seed the chain input from the output scalar so links are
            # data-dependent but shapes stay fixed
            x = x + out.ravel()[0].astype(x.dtype) * 0
            out = x
        return out.ravel()[0]

    np.asarray(chained(x, *rest))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(chained(x, *rest))
        best = min(best, time.perf_counter() - t0)
    return best


def _chain_unet(apply_fn, n, v, x, t, ctx):
    @jax.jit
    def chained(v, x, t, ctx):
        for _ in range(n):
            out = apply_fn(v, x, t, ctx)
            x = x + out.astype(x.dtype) * 0
        return out.ravel()[0]

    np.asarray(chained(v, x, t, ctx))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(chained(v, x, t, ctx))
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_unet(apply_fn, v, x, t, ctx):
    return (
        _chain_unet(apply_fn, LONG, v, x, t, ctx)
        - _chain_unet(apply_fn, SHORT, v, x, t, ctx)
    ) / (LONG - SHORT) * 1000


rng = np.random.RandomState(0)
cfg = UNetConfig(dtype="bfloat16")
x = jnp.asarray(rng.randn(B, 64, 64, 4).astype(np.float32))
t = jnp.full((B,), 500, jnp.int32)
ctx = jnp.asarray(rng.randn(B, 77, 1024).astype(np.float32), jnp.bfloat16)

model = UNet2DConditionModel(cfg)
v = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, ctx)
v = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v
)

full = None
if "full" in SECTIONS or "attn" in SECTIONS:
    full = timeit_unet(model.apply, v, x, t, ctx)
    print(f"full UNet step (B={B} CFG, 64px latent): {full:6.2f} ms", flush=True)

# --- ablation: strip SpatialTransformers
if "attn" in SECTIONS:
    _orig_st = unet_mod.SpatialTransformer.__call__
    unet_mod.SpatialTransformer.__call__ = lambda self, x, context: x
    no_attn = timeit_unet(model.apply, v, x, t, ctx)
    print(f"  attention stripped: {no_attn:6.2f} ms "
          f"(attn total ~{full - no_attn:5.2f} ms)", flush=True)
    unet_mod.SpatialTransformer.__call__ = _orig_st

# --- single ResnetBlock per scale vs conv roofline (no monkeypatching:
# standalone blocks, counts below map them back onto the full UNet)
if "rblocks" in SECTIONS:
    from mm_interleaved_tpu.models.sd.unet import ResnetBlock

    temb = jnp.asarray(rng.randn(B, 1280).astype(np.float32), jnp.bfloat16)
    print("=== ResnetBlock per scale (GN+silu+conv3x3 x2+temb) ===",
          flush=True)
    # (size, ch, count in full UNet incl. up blocks; channel-changing and
    # skip-concat blocks approximated by the square case)
    for size, ch, count in [(64, 320, 5), (32, 640, 5), (16, 1280, 5),
                            (8, 1280, 7)]:
        xs = jnp.asarray(
            rng.randn(B, size, size, ch).astype(np.float32), jnp.bfloat16
        )
        blk = ResnetBlock(ch, 32, jnp.bfloat16)
        bv = blk.init(jax.random.PRNGKey(0), xs, temb)
        tms = (
            _chain(lambda y, tb: blk.apply(bv, y, tb), LONG, xs, temb)
            - _chain(lambda y, tb: blk.apply(bv, y, tb), SHORT, xs, temb)
        ) / (LONG - SHORT) * 1000
        fl = 2 * B * size * size * 9 * ch * ch * 2  # two 3x3 convs
        by = B * size * size * ch * 2 * 8  # ~8 bf16 passes over the map
        print(f"  {size:3d}px c{ch:5d} x{count}: {tms:6.3f} ms | conv "
              f"roofline {fl / 197e12 * 1e3:6.3f} ms ({fl/197e9/tms*100:3.0f}"
              f"%) | hbm {by / 400e9 * 1e3:6.3f} ms", flush=True)

# --- single TransformerBlock per scale vs roofline
if "blocks" not in SECTIONS:
    sys.exit(0)
print("=== TransformerBlock per scale (self+cross+GEGLU+LN) ===", flush=True)
for size, ch in [(64, 320), (32, 640), (16, 1280)]:
    T = size * size
    h = jnp.asarray(rng.randn(B, T, ch).astype(np.float32), jnp.bfloat16)
    blk = TransformerBlock(ch, ch // 64, 1024, jnp.bfloat16)
    bv = blk.init(jax.random.PRNGKey(0), h, ctx)
    tms = (
        _chain(lambda y, c: blk.apply(bv, y, c), LONG, h, ctx)
        - _chain(lambda y, c: blk.apply(bv, y, c), SHORT, h, ctx)
    ) / (LONG - SHORT) * 1000
    # roofline: qkv+out self (4 ch^2 T) + self-attn (2*2 T^2 ch) +
    # cross qkv/out (2 ch^2 T + 2*77*T*(ch+1024)... small) + GEGLU
    fl = 2 * B * (
        4 * T * ch * ch                      # self qkv+out
        + 2 * T * T * ch                     # QK^T + PV
        + 2 * T * ch * ch + 77 * T * ch * 2  # cross q,out + attn
        + 77 * (1024 * ch * 2)               # cross k,v
        + T * (ch * 8 * ch + 4 * ch * ch)    # GEGLU in + out
    )
    print(f"  {size:3d}px c{ch:5d}: {tms:6.2f} ms | roofline "
          f"{fl / 197e12 * 1e3:5.2f} ms | {fl / 197e12 * 1e3 / tms * 100:4.0f}%",
          flush=True)
