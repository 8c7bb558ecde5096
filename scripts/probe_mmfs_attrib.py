"""Attribute the per-denoise-step MMFS overhead above the bare UNet.

Variants (each times the real 5- and 15-step denoise scans; per-step cost
is the slope):

  full      : production path with the hoisted value slabs (baseline)
  zeros_out : `mmfs_deform_factorized_prepared` returns zeros immediately —
              slope drop = per-step kernel cost (query slab + occupancy +
              pallas kernel)
  no_mmfs   : mmfs inputs absent entirely — the UNet-only ceiling; the
              (full - no_mmfs) gap is the whole MMFSNet machinery (13
              blocks of query projections, convs, kernel)

Round-5 state: the step-invariant value layout (feat_norm + value_proj +
per-level row-major slabs) is hoisted out of the scan by
generation/diffusion.py, so `full` vs `no_mmfs` is pure per-step work.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

import mm_interleaved_tpu.ops.ms_deform_attn_pallas_mi as mi
from mm_interleaved_tpu.configs import base_config
from mm_interleaved_tpu.generation.diffusion import generate_images
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

TRIALS = 3
B = 2

cfg = base_config(seq_len=512, max_num_images=2, remat=False)
model = MMInterleaved(cfg)
S = cfg.special
ntok = cfg.num_img_token
rng = np.random.RandomState(0)
L = 128
row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * ntok
row += list(rng.randint(10, 30000, size=L - len(row)))
ids = jnp.asarray(np.tile(np.asarray(row[:L], np.int32), (B, 1)))
enc = cfg.visual.encoder.vit.image_size
batch = dict(
    text_ids=ids,
    image_tensors=jnp.asarray(
        rng.rand(B, cfg.max_num_images, enc, enc, 3).astype(np.float32)
    ),
    num_image_per_seq=jnp.ones((B,), jnp.int32),
    attention_mask=jnp.ones_like(ids),
)
variables = jax.jit(
    lambda r, b: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.init(r, **b, image_tensors_dec=jnp.zeros(
            (B, cfg.max_num_images, cfg.image_decoder.image_size,
             cfg.image_decoder.image_size, 3), jnp.float32)),
    )
)({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
   "dropout": jax.random.PRNGKey(2)}, batch)


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


gii = jax.jit(lambda v, b: model.apply(
    v, b["text_ids"], b["image_tensors"], b["num_image_per_seq"],
    b["attention_mask"], method=model.generate_image_inputs,
))
ctx, ctx_mask, mmfs_vals, mmfs_mask = gii(variables, batch)
key = jax.random.PRNGKey(0)

_orig_prepared = mi.mmfs_deform_factorized_prepared


def _zeros_prepared(level_vals, delta, level_shapes, ref, off_q, wq,
                    inv_base, tile_q=128, interpret=False):
    B_, Lq = off_q.shape[:2]
    H = level_vals[0].shape[1]
    D = level_vals[0].shape[3]
    return jnp.zeros((B_, Lq, H * D), level_vals[0].dtype)


def run(mode):
    mi.mmfs_deform_factorized_prepared = (
        _zeros_prepared if mode == "zeros_out" else _orig_prepared
    )
    try:
        ts = {}
        for n in (5, 15):
            if mode == "no_mmfs":
                f = jax.jit(lambda v, c, m, r, n=n: generate_images(
                    model, v, c[:B], m[:B], r,
                    num_inference_steps=n, guidance_scale=3.5,
                ))
                ts[n] = timeit(f, variables, ctx, ctx_mask, key)
            else:
                f = jax.jit(lambda v, c, m, mv, mm, r, n=n: generate_images(
                    model, v, c[:B], m[:B], r, mmfs_values=mv[:B],
                    mmfs_mask=mm[:B], num_inference_steps=n,
                    guidance_scale=3.5,
                ))
                ts[n] = timeit(f, variables, ctx, ctx_mask, mmfs_vals,
                               mmfs_mask, key)
        slope = (ts[15] - ts[5]) / 10
        print(f"{mode:10s}: 5-step {ts[5]:7.1f} ms, 15-step {ts[15]:7.1f} ms"
              f" -> {slope:6.2f} ms/step", flush=True)
    finally:
        mi.mmfs_deform_factorized_prepared = _orig_prepared


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["no_mmfs", "zeros_out", "full"]:
        run(mode)
