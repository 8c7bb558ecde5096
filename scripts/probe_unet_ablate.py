"""In-graph UNet cost attribution: ablate transformer sub-parts inside the
REAL no-MMFS denoise scan (the trustworthy measurement — standalone block
chains are noise-dominated below ~1 ms on the relay).

Variants (each inits fresh params under the patch, then times 5/15-step
scans; per-step cost is the slope):

  full     : production TransformerBlock
  noself   : self-attention (attn1) skipped
  nocross  : cross-attention (attn2) skipped
  noff     : GEGLU feed-forward skipped
  notrans  : whole TransformerBlock = identity (keeps SpatialTransformer's
             GN + proj_in/out wrapper)
  xla_attn : flash path disabled (allow_pallas=False) — in-graph flash win

Usage: python scripts/probe_unet_ablate.py [variant ...]
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

import mm_interleaved_tpu.models.sd.unet as unet_mod
from mm_interleaved_tpu.configs import base_config
from mm_interleaved_tpu.generation.diffusion import generate_images
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

TRIALS = 3
B = 2

_TB = unet_mod.TransformerBlock


class TBnoself(_TB):
    @nn.compact
    def __call__(self, x, context):
        d = self.dim
        hd = d // self.n_heads
        B, T, _ = x.shape

        def attend(h, kv, prefix):
            S = kv.shape[1]
            q = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_q")(h).reshape(B, T, self.n_heads, hd)
            k = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_k")(kv).reshape(B, S, self.n_heads, hd)
            v = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_v")(kv).reshape(B, S, self.n_heads, hd)
            o = unet_mod.dot_product_attention(q, k, v).reshape(B, T, d)
            return nn.Dense(d, dtype=self.dtype, name=f"{prefix}_out")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + attend(h, context, "attn2")
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        g = nn.Dense(8 * d, dtype=self.dtype, name="ff_in")(h)
        a, b = jnp.split(g, 2, axis=-1)
        h = a * nn.gelu(b, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="ff_out")(h)


class TBnocross(_TB):
    @nn.compact
    def __call__(self, x, context):
        d = self.dim
        hd = d // self.n_heads
        B, T, _ = x.shape

        def attend(h, kv, prefix):
            S = kv.shape[1]
            q = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_q")(h).reshape(B, T, self.n_heads, hd)
            k = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_k")(kv).reshape(B, S, self.n_heads, hd)
            v = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_v")(kv).reshape(B, S, self.n_heads, hd)
            o = unet_mod.dot_product_attention(q, k, v).reshape(B, T, d)
            return nn.Dense(d, dtype=self.dtype, name=f"{prefix}_out")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + attend(h, h, "attn1")
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        g = nn.Dense(8 * d, dtype=self.dtype, name="ff_in")(h)
        a, b = jnp.split(g, 2, axis=-1)
        h = a * nn.gelu(b, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="ff_out")(h)


class TBnoff(_TB):
    @nn.compact
    def __call__(self, x, context):
        d = self.dim
        hd = d // self.n_heads
        B, T, _ = x.shape

        def attend(h, kv, prefix):
            S = kv.shape[1]
            q = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_q")(h).reshape(B, T, self.n_heads, hd)
            k = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_k")(kv).reshape(B, S, self.n_heads, hd)
            v = nn.Dense(d, use_bias=False, dtype=self.dtype,
                         name=f"{prefix}_v")(kv).reshape(B, S, self.n_heads, hd)
            o = unet_mod.dot_product_attention(q, k, v).reshape(B, T, d)
            return nn.Dense(d, dtype=self.dtype, name=f"{prefix}_out")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + attend(h, h, "attn1")
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x + attend(h, context, "attn2")


class TBnone(_TB):
    @nn.compact
    def __call__(self, x, context):
        return x


VARIANTS = {
    "full": _TB,
    "noself": TBnoself,
    "nocross": TBnocross,
    "noff": TBnoff,
    "notrans": TBnone,
}


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


def run(name):
    import mm_interleaved_tpu.ops.attention as attn_mod

    orig_attn = unet_mod.dot_product_attention
    if name == "xla_attn":
        unet_mod.TransformerBlock = _TB
        unet_mod.dot_product_attention = (
            lambda q, k, v, **kw: attn_mod.dot_product_attention(
                q, k, v, allow_pallas=False, **kw
            )
        )
    else:
        unet_mod.TransformerBlock = VARIANTS[name]
    try:
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
                rng.rand(B, cfg.max_num_images, enc, enc, 3).astype(
                    np.float32)
            ),
            num_image_per_seq=jnp.ones((B,), jnp.int32),
            attention_mask=jnp.ones_like(ids),
        )
        variables = jax.jit(
            lambda r, b: jax.tree_util.tree_map(
                lambda x: (x.astype(jnp.bfloat16)
                           if x.dtype == jnp.float32 else x),
                model.init(r, **b, image_tensors_dec=jnp.zeros(
                    (B, cfg.max_num_images, cfg.image_decoder.image_size,
                     cfg.image_decoder.image_size, 3), jnp.float32)),
            )
        )({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
           "dropout": jax.random.PRNGKey(2)}, batch)
        gii = jax.jit(lambda v, b: model.apply(
            v, b["text_ids"], b["image_tensors"], b["num_image_per_seq"],
            b["attention_mask"], method=model.generate_image_inputs,
        ))
        ctx, ctx_mask, _, _ = gii(variables, batch)
        key = jax.random.PRNGKey(0)
        ts = {}
        for n in (5, 15):
            f = jax.jit(lambda v, c, m, r, n=n: generate_images(
                model, v, c[:B], m[:B], r,
                num_inference_steps=n, guidance_scale=3.5,
            ))
            ts[n] = timeit(f, variables, ctx, ctx_mask, key)
        slope = (ts[15] - ts[5]) / 10
        print(f"{name:8s}: 5-step {ts[5]:7.1f} ms, 15-step {ts[15]:7.1f} ms"
              f" -> {slope:6.2f} ms/step", flush=True)
    finally:
        unet_mod.TransformerBlock = _TB
        unet_mod.dot_product_attention = orig_attn


if __name__ == "__main__":
    for name in sys.argv[1:] or ["notrans", "noself", "nocross", "noff"]:
        run(name)
