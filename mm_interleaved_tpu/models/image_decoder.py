"""Image decoder: perceiver-resampled LLM context conditioning a Stable
Diffusion UNet with MMFS pyramid injection.

Re-design of the reference `decoders/decoder_image.py:9-156` +
`decoders/sd.py:24-316` + the SD pipeline monkey patch
(`monkey_patch/sd_pipeline_monkey_patch.py`):

  * 77-query 1-layer perceiver over the (reversed, pos-embedded) LLM context;
  * learned negative prompt embeddings, uncond dropout p=0.1 during training;
  * VAE encode/decode in fp32 (the reference's explicit fp32 islands);
  * loss: per-pixel MSE vs epsilon / v-target, masked to images with context
    > 2 tokens and the dataset-level image_loss_mask;
  * generation: jitted ``lax.scan`` denoise loop with classifier-free
    guidance (mmfs inputs duplicated across both halves, patch :173-178).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .perceiver import PerceiverConfig, PerceiverResampler
from .sd.scheduler import DiffusionSchedule
from .sd.unet import UNet2DConditionModel, UNetConfig
from .sd.vae import AutoencoderKL, VAEConfig


@dataclasses.dataclass(frozen=True)
class ImageDecoderConfig:
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    schedule: DiffusionSchedule = dataclasses.field(
        default_factory=DiffusionSchedule
    )
    perceiver: PerceiverConfig = dataclasses.field(
        default_factory=lambda: PerceiverConfig(
            num_queries=77,
            hidden_size=1024,
            encoder_hidden_size=5120,
            num_hidden_layers=1,
            num_attention_heads=16,
            cross_attention_frequency=1,
        )
    )
    uncond_prob: float = 0.1
    image_size: int = 512
    # which ViT pyramid level resolutions feed the UNet MMFS (all four)
    spatial_shapes: tuple = (64, 32, 16, 8)
    # fp32-VAE intra-op micro-batching (reference sd.py:149, 225-238):
    # bounds peak activation memory at 512px; applied via lax.map when the
    # batch divides evenly, else whole-batch
    vae_encode_mini_bs: int = 32
    vae_decode_mini_bs: int = 8
    # inference-decode compute dtype.  The reference's fp32 island guards
    # against fp16 *overflow*; bf16 keeps fp32's exponent range, so the TPU
    # decode runs bf16 by default (GroupNorm stats still reduce fp32).
    # Training (vae encode -> diffusion targets) always stays fp32.
    vae_decode_dtype: str = "bfloat16"

    @property
    def latent_size(self) -> int:
        return self.image_size // 2 ** (len(self.vae.block_out_channels) - 1)


class ImageDecoder(nn.Module):
    cfg: ImageDecoderConfig

    def _chunked_vae(self, fn, x: jax.Array, mini: int,
                     rng: Optional[jax.Array] = None) -> jax.Array:
        """Apply ``fn`` over batch chunks of ``mini`` via `lax.map` — the
        reference's VAE mini-batch loops (sd.py:149, 225-238) as sequential
        XLA execution bounding peak fp32 activation memory.  Falls back to
        one whole-batch call when chunking doesn't divide evenly or during
        init (params must be created outside control flow).  With ``rng``,
        ``fn(chunk, chunk_rng)`` gets an independent key per chunk."""
        B = x.shape[0]
        if (self.is_initializing() or mini <= 0 or B <= mini
                or B % mini != 0):
            return fn(x, rng) if rng is not None else fn(x)
        n = B // mini
        xs = x.reshape((n, mini) + x.shape[1:])
        if rng is not None:
            out = jax.lax.map(
                lambda args: fn(args[0], jax.random.fold_in(rng, args[1])),
                (xs, jnp.arange(n)),
            )
        else:
            out = jax.lax.map(fn, xs)
        return out.reshape((B,) + out.shape[2:])

    def setup(self):
        c = self.cfg
        self.perceiver_resampler = PerceiverResampler(c.perceiver)
        self.vae = AutoencoderKL(c.vae)
        self.unet = UNet2DConditionModel(c.unet)
        self.neg_prompt_embeds = self.param(
            "neg_prompt_embeds",
            nn.initializers.normal(stddev=0.02),
            (1, c.perceiver.num_queries, c.perceiver.hidden_size),
            jnp.float32,
        )

    def _resample_context(self, context_features, context_attention_mask,
                          deterministic=True):
        return self.perceiver_resampler(
            encoder_hidden_states=context_features,
            encoder_attention_mask=context_attention_mask,
            deterministic=deterministic,
        )

    def __call__(
        self,
        image_tensors: jax.Array,  # [B, H, W, 3] in [0, 1]
        context_features: jax.Array,  # [B, L_ctx, C_llm]
        context_attention_mask: jax.Array,  # [B, L_ctx]
        image_loss_mask: Optional[jax.Array] = None,  # [B]
        mmfs_features: Optional[jax.Array] = None,  # [B, n_img, sum hw, Cv]
        mmfs_mask: Optional[jax.Array] = None,  # [B, n_img]
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Diffusion training loss (scalar)."""
        c = self.cfg
        if rng is None:
            rng = self.make_rng("noise")
        r_vae, r_noise, r_t, r_uncond = jax.random.split(rng, 4)
        B = image_tensors.shape[0]

        ctx = self._resample_context(
            context_features, context_attention_mask, deterministic
        )
        if c.uncond_prob > 0 and not deterministic:
            drop = (
                jax.random.uniform(r_uncond, (B, 1, 1)) < c.uncond_prob
            )
            ctx = jnp.where(drop, self.neg_prompt_embeds.astype(ctx.dtype), ctx)

        # fp32 VAE island (reference sd.py:220-238), micro-batched to bound
        # peak memory at 512px: lax.map enforces sequential chunk execution
        image = image_tensors.astype(jnp.float32) * 2.0 - 1.0
        latents = self._chunked_vae(
            lambda x, r: self.vae.encode(x, rng=r, sample=True),
            image, self.cfg.vae_encode_mini_bs, rng=r_vae,
        )
        latents = jax.lax.stop_gradient(latents)
        if self.is_initializing():
            # trace the decode path so its params exist for generation
            self.vae.decode(latents)

        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        timesteps = jax.random.randint(
            r_t, (B,), 0, c.schedule.num_train_timesteps
        )
        noisy = c.schedule.add_noise(latents, noise, timesteps)
        target = c.schedule.training_target(latents, noise, timesteps)

        pred = self.unet(
            noisy.astype(c.unet.compute_dtype),
            timesteps,
            ctx,
            mmfs_values=mmfs_features,
            mmfs_mask=mmfs_mask,
        )
        loss = jnp.square(pred.astype(jnp.float32) - target)  # [B, h, w, 4]
        loss = loss.mean(axis=(1, 2, 3))
        if image_loss_mask is not None:
            loss = loss * image_loss_mask.astype(loss.dtype)
        return loss.mean()

    # ------------------------------------------------------------------ #
    # generation pieces — the jitted lax.scan denoise loop lives in        #
    # generation/diffusion.py (a pure function over model.apply, so the    #
    # UNet is traced once, not unrolled per step)                          #
    # ------------------------------------------------------------------ #

    def resample_context(self, context_features, context_attention_mask):
        """Returns (cond_ctx, neg_ctx) both [B, 77, C]."""
        ctx = self._resample_context(context_features, context_attention_mask)
        neg = jnp.broadcast_to(
            self.neg_prompt_embeds.astype(ctx.dtype), ctx.shape
        )
        return ctx, neg

    def unet_pred(self, latents, timesteps, ctx, mmfs_values=None,
                  mmfs_mask=None, mmfs_projected=None):
        return self.unet(
            latents.astype(self.cfg.unet.compute_dtype),
            timesteps,
            ctx,
            mmfs_values=mmfs_values,
            mmfs_mask=mmfs_mask,
            mmfs_projected=mmfs_projected,
        )

    def vae_decode(self, latents):
        dtype = jnp.dtype(self.cfg.vae_decode_dtype)
        image = self._chunked_vae(
            lambda z: self.vae.decode(z, dtype), latents,
            self.cfg.vae_decode_mini_bs,
        )
        return jnp.clip(image * 0.5 + 0.5, 0.0, 1.0)
