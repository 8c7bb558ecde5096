"""Attribute the per-step UNet MMFS cost (bench: ~15 ms/step) across the
13 MMFSBlocks: full MMFSNet pass + per-resolution block groups, each timed
by the chain-slope method (single dispatch ~25 ms would swamp per-call
times).  Shapes = bench scenario: base preset, B=2 with CFG -> B_cfg=4,
n_img=2, SD-2.1 residual stack (3x 320@64, 320@32, 2x 640@32, 640@16,
2x 1280@16, 1280@8, 2x 1280@8, mid 1280@8).
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.configs import base_config
from mm_interleaved_tpu.models.sd.mmfs_net import MMFSBlock, MMFSNet

SHORT, LONG = 2, 8
TRIALS = 4
B = 4  # bench batch 2 with CFG
N_IMG = 2
DTYPE = jnp.bfloat16

cfg = base_config()
ucfg = cfg.image_decoder.unet
mcfg = ucfg.mmfs
chans, sizes = ucfg.down_residual_spec()
mid_ch = ucfg.block_out_channels[-1]
mid_size = sizes[-1]
hw = sum(s * s for s in mcfg.feat_spatial_shapes)

rng = np.random.RandomState(0)
mmfs_values = jnp.asarray(
    rng.randn(B, N_IMG, hw, mcfg.input_channel).astype(np.float32), DTYPE
)
mmfs_mask = jnp.asarray(
    np.stack([np.array([1, 0])] * B).astype(np.int32)
)  # 1 valid image per row, like the bench


def timeit_chain(apply_fn, n, *args):
    from mm_interleaved_tpu.ops.ms_deform_attn import pallas_deform_inference

    @jax.jit
    def chained(*a):
        out = a[0]
        # same dispatch context the denoise scan traces under — without it
        # every block silently falls back to the XLA gather oracle
        with pallas_deform_inference():
            for _ in range(n):
                out = apply_fn(out, *a[1:])
        return jax.tree_util.tree_leaves(out)[0].ravel()[0]

    np.asarray(chained(*args))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_ms(apply_fn, *args):
    return (timeit_chain(apply_fn, LONG, *args)
            - timeit_chain(apply_fn, SHORT, *args)) / (LONG - SHORT) * 1e3


# ---- full MMFSNet (as the denoise scan runs it, projections hoisted) ----
net = MMFSNet(mcfg, residual_channels=chans, residual_sizes=sizes,
              mid_channel=mid_ch, mid_size=mid_size)
sample = jnp.asarray(
    rng.randn(B, mid_size, mid_size, mid_ch).astype(np.float32), DTYPE)
res = tuple(
    jnp.asarray(rng.randn(B, s, s, c).astype(np.float32), DTYPE)
    for c, s in zip(chans, sizes)
)
variables = net.init(jax.random.PRNGKey(0), sample, res, mmfs_values,
                     mmfs_mask)
_, inters = net.apply(variables, sample, res, mmfs_values, mmfs_mask,
                      mutable=["intermediates"])


def _collect(tree):
    n_down = sum(1 for k in tree if k.startswith("down_blocks_"))
    names = [f"down_blocks_{i}" for i in range(n_down)] + ["mid_block"]
    return tuple(tree[n]["mmfs"]["projected_value"][0] for n in names)


pv = _collect(inters["intermediates"])
print(f"projected value shapes: {[tuple(p.shape) for p in pv[:2]]} x13",
      flush=True)


def net_fn(carry, values, mask, pvs):
    s, r = carry
    s2, r2 = net.apply(variables, s, r, values, mask, projected_values=pvs)
    return (s2, r2)


t_full = slope_ms(net_fn, (sample, res), mmfs_values, mmfs_mask, pv)
print(f"full MMFSNet (13 blocks, proj hoisted): {t_full:6.2f} ms", flush=True)

# with value projection NOT hoisted (the capture-pass cost shape)
t_noh = slope_ms(
    lambda carry, values, mask: net.apply(
        variables, carry[0], carry[1], values, mask),
    (sample, res), mmfs_values, mmfs_mask,
)
print(f"full MMFSNet (proj recomputed):        {t_noh:6.2f} ms", flush=True)

# ---- per-block groups ----
groups = {}
for i, (c, s) in enumerate(zip(chans, sizes)):
    groups.setdefault((c, s), []).append(i)

for (c, s), idxs in sorted(groups.items(), key=lambda kv: -kv[0][1]):
    blk = MMFSBlock(mcfg, c, s)
    x = jnp.asarray(rng.randn(B, s, s, c).astype(np.float32), DTYPE)
    bv = blk.init(jax.random.PRNGKey(1), x, mmfs_values, mmfs_mask)
    _, bi = blk.apply(bv, x, mmfs_values, mmfs_mask,
                      mutable=["intermediates"])
    bpv = bi["intermediates"]["mmfs"]["projected_value"][0]

    t = slope_ms(
        lambda y, values, mask, p: y + blk.apply(
            bv, y, values, mask, projected_value=p),
        x, mmfs_values, mmfs_mask, bpv,
    )
    n = len(idxs)
    print(f"block {s:3d}px c{c:5d} x{n}: {t:6.2f} ms each "
          f"-> {t * n:6.2f} ms total", flush=True)

# mid block
blk = MMFSBlock(mcfg, mid_ch, mid_size)
x = jnp.asarray(rng.randn(B, mid_size, mid_size, mid_ch).astype(np.float32),
                DTYPE)
bv = blk.init(jax.random.PRNGKey(1), x, mmfs_values, mmfs_mask)
_, bi = blk.apply(bv, x, mmfs_values, mmfs_mask, mutable=["intermediates"])
bpv = bi["intermediates"]["mmfs"]["projected_value"][0]
t = slope_ms(
    lambda y, values, mask, p: y + blk.apply(
        bv, y, values, mask, projected_value=p),
    x, mmfs_values, mmfs_mask, bpv,
)
print(f"mid   {mid_size:3d}px c{mid_ch:5d} x1: {t:6.2f} ms", flush=True)
