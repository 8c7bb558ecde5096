"""Training-path (fwd+bwd) deformable-attention benchmark: XLA-gather
autodiff vs the Pallas custom_vjp kernel, chained-in-one-jit timing."""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from mm_interleaved_tpu.ops.ms_deform_attn import ms_deform_attn
from mm_interleaved_tpu.ops.ms_deform_attn_pallas_v4 import (
    ms_deform_attn_pallas_v4_trainable)

CHAIN = 6
TRIALS = 5

def bench_grad(loss_fn, value, loc, w):
    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2))

    @jax.jit
    def chained(value, loc, w):
        g = None
        l = loc
        for _ in range(CHAIN):
            g = grad_fn(value, l, w)
            l = loc + (g[1][0, 0, 0, 0, 0, 0] * 0).astype(loc.dtype)
        return g
    r = chained(value, loc, w)
    jax.tree_util.tree_map(np.asarray, r)
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        r = chained(value, loc, w)
        jax.tree_util.tree_map(np.asarray, r)
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
    loc = jnp.asarray(rng.uniform(0.05,0.95,(B,Q,H,L,P,2)).astype(np.float32))
    w = jnp.asarray(rng.rand(B,Q,H,L,P).astype(np.float32))

    def loss_xla(v, l, a):
        return (ms_deform_attn(v, shapes, l, a).astype(jnp.float32) ** 2).sum()

    def loss_pal(v, l, a):
        return (ms_deform_attn_pallas_v4_trainable(
            v, shapes, l, a).astype(jnp.float32) ** 2).sum()

    try:
        t_x = bench_grad(loss_xla, value, loc, w)
        print(f"{name}: xla fwd+bwd {t_x:.2f} ms", flush=True)
    except Exception as e:
        t_x = None
        print(f"{name}: xla FAIL {str(e)[:100]}", flush=True)
    try:
        t_p = bench_grad(loss_pal, value, loc, w)
        sp = f"  speedup {t_x/t_p:.2f}x" if t_x else ""
        print(f"  pallas fwd+bwd {t_p:.2f} ms{sp}", flush=True)
        # on-chip grad parity spot check
        gx = np.asarray(jax.grad(loss_xla, argnums=(0,))(value, loc, w)[0], np.float32)
        gp = np.asarray(jax.grad(loss_pal, argnums=(0,))(value, loc, w)[0], np.float32)
        d = np.abs(gx - gp).max()
        print(f"  d_value on-chip: maxdiff {d:.2e}  scale {np.abs(gx).max():.2e}"
              f"  rel {d/max(np.abs(gx).max(),1e-9):.2e}", flush=True)
    except Exception as e:
        print(f"  pallas FAIL {str(e)[:140]}", flush=True)
