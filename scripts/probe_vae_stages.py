"""Stage-level cost split of the VAE decoder via early-exit bisection.

Times `Decoder(..., up_to=k)` as whole single-dispatch jits (each tens of
ms — far above relay noise, unlike sub-ms chained micro-ops) and reports
per-stage deltas.  Stages: mid (64px c512), up0 (64px c512 + upsample to
128), up1 (128px c512 + up to 256), up2 (256px c256 + up to 512),
up3+out (512px c128 + conv_norm_out/conv_out).
"""
import sys

sys.path.insert(0, "/root/repo")
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.models.sd.vae import Decoder, VAEConfig

TRIALS = int(os.environ.get("PROBE_TRIALS", "5"))
B = 2
DTYPE = jnp.bfloat16

rng = np.random.RandomState(0)
cfg = VAEConfig()
z = jnp.asarray(rng.randn(B, 64, 64, 4).astype(np.float32))
dec = Decoder(cfg)
v = jax.jit(dec.init)(jax.random.PRNGKey(0), z)
v = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, v
)


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


floor = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(0))
print(f"relay floor: {floor:6.1f} ms", flush=True)

names = ["mid(64,512)", "up0(64,512->128)", "up1(128,512->256)",
         "up2(256,256->512)", "up3+out(512,128)"]
prev = floor
cum = []
for k in [0, 1, 2, 3, None]:
    f = jax.jit(lambda z, k=k: dec.apply(v, z, DTYPE, up_to=k))
    t = timeit(f, z)
    cum.append(t)
    print(f"  up_to={str(k):4s}: {t - floor:7.2f} ms  (+{t - prev:6.2f})",
          flush=True)
    prev = t
print("stage deltas:", flush=True)
base = floor
for name, t in zip(names, cum):
    print(f"  {name:20s}: {t - base:7.2f} ms", flush=True)
    base = t
