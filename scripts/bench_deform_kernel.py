import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mm_interleaved_tpu.ops.ms_deform_attn_pallas import (
    ms_deform_attn_pallas, ms_deform_attn_pallas_v2)

def bench(fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1000

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
    t1 = bench(ms_deform_attn_pallas, value, shapes, loc, w)
    print(f"{name}: v1 {t1:.2f} ms", flush=True)
    ref = np.asarray(ms_deform_attn_pallas(value, shapes, loc, w), np.float32)
    for tq, budget in [(64, 1<<20), (64, 2<<20), (128, 1<<20), (128, 2<<20), (256, 2<<20)]:
        try:
            t2 = bench(ms_deform_attn_pallas_v2, value, shapes, loc, w,
                       tile_q=tq, vmem_budget=budget)
            b = np.asarray(ms_deform_attn_pallas_v2(
                value, shapes, loc, w, tile_q=tq, vmem_budget=budget), np.float32)
            diff = np.abs(ref-b).max()
            print(f"  v2 tq={tq} budget={budget>>20}MB: {t2:.2f} ms  "
                  f"speedup {t1/t2:.2f}x  maxdiff {diff:.2e}", flush=True)
        except Exception as e:
            print(f"  v2 tq={tq} budget={budget>>20}MB: FAIL {str(e)[:120]}",
                  flush=True)
