"""Breakdown of the bench image-half fixed costs at the base preset:
generate_image_inputs (ViT + adapter + LLM context pass), the MMFS
capture pass, the 25-step denoise scan, and the VAE decode — each timed
as its own jit with scalar-only host pulls (single dispatch per sample;
these are tens-of-ms calls, so the ~25 ms relay floor is subtracted via
a no-op reference instead of chaining)."""
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

# relay floor
floor = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(0))
print(f"relay floor (scalar add): {floor:7.1f} ms", flush=True)

gii = jax.jit(lambda v, b: model.apply(
    v, b["text_ids"], b["image_tensors"], b["num_image_per_seq"],
    b["attention_mask"], method=model.generate_image_inputs,
))
t = timeit(gii, variables, batch)
print(f"generate_image_inputs (ViT+adapter+LLM ctx): {t - floor:7.1f} ms",
      flush=True)
ctx, ctx_mask, mmfs_vals, mmfs_mask = jax.tree_util.tree_map(
    lambda x: x, gii(variables, batch)
)

full = jax.jit(lambda v, c, m, mv, mm, r: generate_images(
    model, v, c[:B], m[:B], r, mmfs_values=mv[:B], mmfs_mask=mm[:B],
    num_inference_steps=25, guidance_scale=3.5,
))
key = jax.random.PRNGKey(0)
t_full = timeit(full, variables, ctx, ctx_mask, mmfs_vals, mmfs_mask, key)
print(f"generate_images 25 steps (resample+capture+scan+vae): "
      f"{t_full - floor:7.1f} ms", flush=True)

short = jax.jit(lambda v, c, m, mv, mm, r: generate_images(
    model, v, c[:B], m[:B], r, mmfs_values=mv[:B], mmfs_mask=mm[:B],
    num_inference_steps=5, guidance_scale=3.5,
))
t_short = timeit(short, variables, ctx, ctx_mask, mmfs_vals, mmfs_mask, key)
per_step = (t_full - t_short) / 20
print(f"generate_images 5 steps: {t_short - floor:7.1f} ms", flush=True)
print(f"  -> per denoise step (slope): {per_step:7.1f} ms", flush=True)
print(f"  -> fixed (resample+capture+vae+init): "
      f"{t_short - floor - 5 * per_step:7.1f} ms", flush=True)

# vae decode alone (fp32 islands as configured)
lat = jnp.asarray(rng.randn(
    B, cfg.image_decoder.latent_size, cfg.image_decoder.latent_size,
    cfg.image_decoder.vae.latent_channels).astype(np.float32))
vd = jax.jit(lambda v, z: model.apply(
    v, z, method=lambda m, z: m.image_decoder.vae_decode(z)))
t = timeit(vd, variables, lat)
print(f"vae_decode 512px B{B}: {t - floor:7.1f} ms", flush=True)
