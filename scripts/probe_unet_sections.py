"""Section-level cost split of the full SD-2.1 UNet step at CFG batch.

Times the full `UNet2DConditionModel.apply`, then ablated variants
(attention stripped / resnets stripped) by monkeypatching the module
classes — the difference attributes the 64 ms/step budget.  Also times a
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

SHORT, LONG = 2, 6
import os
SECTIONS = set(os.environ.get("PROBE_SECTIONS", "full,attn,res,blocks").split(","))
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
if "full" in SECTIONS or "attn" in SECTIONS or "res" in SECTIONS:
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

# --- ablation: resnets reduced to their convs (no GN/silu/temb)
_orig_rb = unet_mod.ResnetBlock.__call__


def _convs_only(self, x, temb):
    import flax.linen as nn
    from mm_interleaved_tpu.ops.group_norm import GroupNorm

    in_ch = x.shape[-1]
    # instantiate the same modules so the param tree matches, but skip the
    # GN/silu/temb *compute* on the hot tensors
    GroupNorm(num_groups=min(self.groups, in_ch), epsilon=1e-5,
              dtype=self.dtype, name="norm1")(x[:1, :1, :1])
    h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                name="conv1")(x)
    t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(temb)
    h = h + t[:, None, None, :].astype(h.dtype) * 0
    GroupNorm(num_groups=min(self.groups, self.out_ch), epsilon=1e-5,
              dtype=self.dtype, name="norm2")(h[:1, :1, :1])
    h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                name="conv2")(h)
    if in_ch != self.out_ch:
        x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                    name="conv_shortcut")(x)
    return x + h


if "res" in SECTIONS:
    import flax.linen as nn
    unet_mod.ResnetBlock.__call__ = nn.compact(_convs_only)
    res_lean = timeit_unet(model.apply, v, x, t, ctx)
    print(f"  resnet GN/silu/temb stripped: {res_lean:6.2f} ms "
          f"(res overhead ~{full - res_lean:5.2f} ms)", flush=True)
    unet_mod.ResnetBlock.__call__ = _orig_rb

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
