"""Breakdown of the UNet-side MMFS cost per denoise step (base preset).

Times, on the real chip:
  * the full MMFSNet forward (all down/mid blocks, projected values given)
  * the deform core alone (ms_deform_attn_multi_image on precomputed
    locations/weights at the same shapes)
  * a single 64x64 MMFSBlock (the largest) full vs core

The difference full-minus-core is the "module overhead" VERDICT r2 flags:
per-image relpos/offsets/softmax math on [B, n_img, Lq, ...] tensors.

Run: python scripts/bench_mmfs_module.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[0])


def timeit(fn, *args, reps=5):
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps * 1e3


def main():
    from mm_interleaved_tpu.models.sd.mmfs_net import (
        MMFSBlock, MMFSNet, MMFSNetConfig,
    )
    from mm_interleaved_tpu.models.sd.unet import UNetConfig
    from mm_interleaved_tpu.ops.ms_deform_attn import (
        ms_deform_attn_multi_image, pallas_deform_inference,
    )

    B = 4  # bench batch 2 with CFG
    n_img = 2
    cfg = MMFSNetConfig(
        input_channel=1024, attn_dim=1024, n_heads=16, n_points=8,
        feat_spatial_shapes=(64, 32, 16, 8), max_num_image_per_seq=10,
    )
    ucfg = UNetConfig()
    chans, sizes = ucfg.down_residual_spec()
    hw = sum(s * s for s in cfg.feat_spatial_shapes)
    H, P, L = cfg.n_heads, cfg.n_points, 4
    D = cfg.input_channel // H

    rng = np.random.RandomState(0)
    values = jnp.asarray(
        rng.rand(B, n_img, hw, cfg.input_channel).astype(np.float32),
        jnp.bfloat16,
    )
    mask = jnp.ones((B, n_img), jnp.int32)

    net = MMFSNet(cfg, residual_channels=chans, residual_sizes=sizes,
                  mid_channel=chans[-1], mid_size=sizes[-1])
    sample = jnp.asarray(
        rng.rand(B, sizes[-1], sizes[-1], chans[-1]).astype(np.float32),
        jnp.bfloat16,
    )
    res = tuple(
        jnp.asarray(rng.rand(B, s, s, c).astype(np.float32), jnp.bfloat16)
        for c, s in zip(chans, sizes)
    )
    variables = net.init(jax.random.PRNGKey(0), sample, res, values, mask)

    # hoisted per-block projections (what the denoise loop feeds per step)
    _, inters = net.apply(variables, sample, res, values, mask,
                          mutable=["intermediates"])
    blocks = [f"down_blocks_{i}" for i in range(len(chans))] + ["mid_block"]
    pv = tuple(
        inters["intermediates"][name]["mmfs"]["projected_value"][0]
        for name in blocks
    )

    ctx = pallas_deform_inference()
    ctx.__enter__()

    full = jax.jit(lambda v, s, r, val, m, p: net.apply(
        v, s, r, val, m, projected_values=p))
    t_full = timeit(full, variables, sample, res, values, mask, pv)
    print(f"MMFSNet full (13 blocks, projected given): {t_full:.1f} ms")

    # deform core alone at each block shape (same total kernel work)
    value5 = values.reshape(B, n_img, hw, H, D)

    def core_all(value5, locs, wts):
        outs = []
        for loc, w in zip(locs, wts):
            outs.append(ms_deform_attn_multi_image(
                value5, tuple((s, s) for s in cfg.feat_spatial_shapes),
                loc, w))
        return outs

    locs, wts = [], []
    for s in list(sizes) + [sizes[-1]]:
        Lq = s * s
        locs.append(jnp.asarray(
            rng.rand(B, Lq, H, n_img, L, P, 2).astype(np.float32),
            jnp.bfloat16))
        wts.append(jnp.asarray(
            (rng.rand(B, Lq, H, n_img, L, P) / (n_img * L * P))
            .astype(np.float32), jnp.bfloat16))
    core_j = jax.jit(core_all)
    t_core = timeit(core_j, value5, locs, wts)
    print(f"deform core only (13 calls):               {t_core:.1f} ms")
    print(f"module overhead:                           {t_full - t_core:.1f} ms")

    # single largest block (64x64, Cq=320)
    blk = MMFSBlock(cfg, chans[0], sizes[0])
    bv = blk.init(jax.random.PRNGKey(1), res[0], values, mask)
    _, bi = blk.apply(bv, res[0], values, mask, mutable=["intermediates"])
    bpv = bi["intermediates"]["mmfs"]["projected_value"][0]
    blk_j = jax.jit(lambda v, s, val, m, p: blk.apply(
        v, s, val, m, projected_value=p))
    t_blk = timeit(blk_j, bv, res[0], values, mask, bpv)

    def core_one(value5, loc, w):
        return ms_deform_attn_multi_image(
            value5, tuple((s, s) for s in cfg.feat_spatial_shapes), loc, w)
    core1_j = jax.jit(core_one)
    t_c1 = timeit(core1_j, value5, locs[0], wts[0])
    print(f"single 64x64 block full: {t_blk:.1f} ms | core: {t_c1:.1f} ms | "
          f"overhead: {t_blk - t_c1:.1f} ms")

    ctx.__exit__()


if __name__ == "__main__":
    main()
