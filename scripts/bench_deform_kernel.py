"""On-chip deformable-kernel comparison: v1 (separable one-hot) vs v4
(dense bilinear matrix, production dispatch).

Dispatch on this box goes through a relay, so single-call wall times swing
by 2x. Each variant is measured as a chain of CHAIN dependent calls inside
ONE jit (output perturbs the next input, preventing CSE/overlap); report
min over trials / CHAIN.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mm_interleaved_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas
from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v4 import (
    ms_deform_attn_pallas_v4)

CHAIN = 10
TRIALS = 6


def bench_chain(fn, value, shapes, loc, w, **kw):
    @jax.jit
    def chained(value, loc, w):
        out = None
        l = loc
        for _ in range(CHAIN):
            out = fn(value, shapes, l, w, **kw)
            # data dependency: perturb loc by a scalar derived from out
            l = loc + (out[0, 0, 0] * 0).astype(loc.dtype)
        return out
    r = chained(value, loc, w)
    np.asarray(r)
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        r = chained(value, loc, w)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1000


rng = np.random.RandomState(0)
CASES = {
    "unet":   (4, 4096, ((64,64),(32,32),(16,16),(8,8)), 8, 16, 64),
    "prefill":(16, 512, ((32,32),(16,16),(8,8)), 8, 16, 64),
}
for name, (B,Q,shapes,P,H,D) in CASES.items():
    S = sum(h*w for h,w in shapes); L=len(shapes)
    value = jnp.asarray(rng.randn(B,S,H,D).astype(np.float32), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B,Q,H,L,P,2).astype(np.float32))
    w = jnp.asarray(rng.rand(B,Q,H,L,P).astype(np.float32))
    t1 = bench_chain(ms_deform_attn_pallas, value, shapes, loc, w)
    print(f"{name}: v1 {t1:.2f} ms", flush=True)
    ref = np.asarray(ms_deform_attn_pallas(value, shapes, loc, w), np.float32)
    for tag, kw in [
        ("v4 tq128", dict(tile_q=128)),
        ("v4 tq256", dict(tile_q=256)),
    ]:
        try:
            t2 = bench_chain(ms_deform_attn_pallas_v4, value, shapes, loc, w,
                             **kw)
            b = np.asarray(ms_deform_attn_pallas_v4(
                value, shapes, loc, w, **kw), np.float32)
            diff = np.abs(ref-b).max()
            print(f"  {tag}: {t2:.2f} ms  speedup {t1/t2:.2f}x  "
                  f"maxdiff {diff:.2e}", flush=True)
        except Exception as e:
            print(f"  {tag}: FAIL {str(e)[:100]}", flush=True)
