"""Sweep tile_q (and CFG value-dedup) for the factorized multi-image
deformable kernel at the bench's hot shapes.

The mi kernel's grid is (B, H, Lq/tile_q) *sequential* cells; at the 64px
MMFS block that is 4*16*32 = 2048 cells per call.  If per-cell fixed cost
dominates (out init, slab load, 2*22 pl.when evals), raising tile_q cuts
cells linearly while total A-build/matmul work stays constant.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.ops.ms_deform_attn_pallas_mi import (
    mmfs_deform_factorized,
)

CHAIN = 8
TRIALS = 4
B = 4  # bench: B=2 with CFG
N_IMG = 2
H, D, P = 16, 64, 8
LEVELS = ((64, 64), (32, 32), (16, 16), (8, 8))
HW = sum(h * w for h, w in LEVELS)
L = len(LEVELS)


def bench_shape(Lq, base, tile_q):
    rng = np.random.RandomState(0)
    value = jnp.asarray(
        rng.randn(B, N_IMG, HW, H, D).astype(np.float32), jnp.bfloat16
    )
    # grid-local references (latent-grid points), like the real blocks
    s = int(round(Lq ** 0.5))
    gx, gy = np.meshgrid(np.arange(s), np.arange(s))
    ref = np.stack([(gx + 0.5) / s, (gy + 0.5) / s], -1).reshape(-1, 2)
    ref = jnp.asarray(np.tile(ref[None, :Lq], (B, 1, 1)), jnp.float32)
    off_q = jnp.asarray(
        rng.randn(B, Lq, H, P, 2).astype(np.float32) * 0.5, jnp.float32
    )
    off_img = jnp.asarray(
        rng.randn(B, N_IMG, H, P, 2).astype(np.float32) * 0.5, jnp.float32
    )
    wq = jnp.asarray(
        np.abs(rng.randn(B, Lq, H, L, P)).astype(np.float32), jnp.float32
    )
    # 1 valid image per row, like the bench scenario
    wi = np.abs(rng.randn(B, N_IMG, H, L, P)).astype(np.float32)
    wi[:, 1] = 0.0
    wi = jnp.asarray(wi)

    @jax.jit
    def chained(value, ref, off_q, off_img, wq, wi):
        out = None
        for i in range(CHAIN):
            o = mmfs_deform_factorized(
                value, LEVELS, ref, off_q, off_img, wq, wi,
                inv_base=1.0 / base, tile_q=tile_q,
            )
            # data-dependent chain: perturb wq by a zero derived from o
            z = (o.astype(jnp.float32).ravel()[0] * 0).astype(wq.dtype)
            wq = wq + z
            out = o
        return out.astype(jnp.float32).ravel()[0]

    np.asarray(chained(value, ref, off_q, off_img, wq, wi))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        np.asarray(chained(value, ref, off_q, off_img, wq, wi))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1e3


for Lq, base in ((4096, 64), (1024, 32)):
    for tile_q in (128, 256, 512, 1024):
        t = bench_shape(Lq, base, tile_q)
        cells = B * H * ((Lq + tile_q - 1) // tile_q)
        print(f"Lq={Lq:5d} tile_q={tile_q:5d} ({cells:5d} cells): "
              f"{t:7.3f} ms/call", flush=True)
