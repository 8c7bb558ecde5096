"""MMFS share of the bench denoise step: times the 5-step and 10-step
denoise scans with (a) one valid previous image per row (the bench
scenario) and (b) all images masked — the slope difference is the
per-step MMFS cost through the factorized multi-image kernel.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.configs import base_config
from mm_interleaved_tpu.generation.diffusion import generate_images
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

TRIALS = 4
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

for label, mask in [("1 valid img", mmfs_mask),
                    ("all masked ", jnp.zeros_like(mmfs_mask)),
                    ("2 valid img", jnp.ones_like(mmfs_mask))]:
    ts = {}
    for n in (5, 15):
        f = jax.jit(lambda v, c, m, mv, mm, r, n=n: generate_images(
            model, v, c[:B], m[:B], r, mmfs_values=mv[:B], mmfs_mask=mm[:B],
            num_inference_steps=n, guidance_scale=3.5,
        ))
        ts[n] = timeit(f, variables, ctx, ctx_mask, mmfs_vals, mask, key)
    slope = (ts[15] - ts[5]) / 10
    print(f"{label}: 5-step {ts[5]:7.1f} ms, 15-step {ts[15]:7.1f} ms "
          f"-> {slope:6.2f} ms/step", flush=True)

# no-MMFS program (mmfs absent entirely): the UNet-only ceiling
for n in (5, 15):
    f = jax.jit(lambda v, c, m, r, n=n: generate_images(
        model, v, c[:B], m[:B], r, num_inference_steps=n, guidance_scale=3.5,
    ))
    ts[n] = timeit(f, variables, ctx, ctx_mask, key)
print(f"no mmfs inputs: 5-step {ts[5]:7.1f} ms, 15-step {ts[15]:7.1f} ms "
      f"-> {(ts[15] - ts[5]) / 10:6.2f} ms/step", flush=True)
