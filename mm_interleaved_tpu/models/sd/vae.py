"""AutoencoderKL — the SD latent VAE, native flax (NHWC).

Replaces diffusers' `AutoencoderKL` used by the reference
(`decoders/sd.py:52-58`, fp32 encode at `:220-238`, fp32 decode at
`:212-215`).  The reference's fp32 islands exist because fp16 *overflows*
in the VAE; bf16 has fp32's exponent range, so on TPU the decode path may
run bf16 safely (a deliberate TPU-native deviation — GroupNorm statistics
still reduce in fp32 inside flax).  ``encode``/``decode`` take a call-time
``dtype`` defaulting to fp32, so training and all torch-oracle parity
tests keep the reference's exact fp32 semantics; only the inference decode
(`ImageDecoderConfig.vae_decode_dtype`) opts into bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.group_norm import GroupNorm, GroupNormSiLU


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


def _gn(groups, name=None, dtype=jnp.float32):
    return GroupNorm(num_groups=groups, epsilon=1e-6, name=name, dtype=dtype)


def _gn_silu(groups, name=None, dtype=jnp.float32):
    # fused norm+silu sweep (ops.group_norm.group_norm_silu) — XLA stops
    # fusing the GN->silu->conv pattern and each ResnetBlock pays ~4x its
    # bandwidth floor at the big-spatial stages (probe_gn_internals.py)
    return GroupNormSiLU(num_groups=groups, epsilon=1e-6, name=name,
                         dtype=dtype)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, dtype=jnp.float32):
        in_ch = x.shape[-1]
        h = _gn_silu(min(self.groups, in_ch), "norm1", dtype)(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=dtype,
                    name="conv1")(h)
        h = _gn_silu(min(self.groups, self.out_ch), "norm2", dtype)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=dtype,
                    name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=dtype,
                        name="conv_shortcut")(x)
        return x.astype(h.dtype) + h


class AttnBlock(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x, dtype=jnp.float32):
        B, H, W, C = x.shape
        h = _gn(min(self.groups, C), "group_norm", dtype)(x) \
            .reshape(B, H * W, C)
        q = nn.Dense(C, dtype=dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=dtype, name="to_v")(h)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * (C ** -0.5),
            axis=-1,
        )
        h = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v)
        h = nn.Dense(C, dtype=dtype, name="to_out")(h).reshape(B, H, W, C)
        return x.astype(h.dtype) + h


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x, dtype=jnp.float32):
        c = self.cfg
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=dtype,
                    name="conv_in")(x.astype(dtype))
        for i, ch in enumerate(c.block_out_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, c.norm_num_groups,
                                name=f"down_{i}_res_{j}")(h, dtype)
            if i != len(c.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=dtype,
                            name=f"down_{i}_downsample")(h)
        ch = c.block_out_channels[-1]
        h = ResnetBlock(ch, c.norm_num_groups, name="mid_res_0")(h, dtype)
        h = AttnBlock(c.norm_num_groups, name="mid_attn")(h, dtype)
        h = ResnetBlock(ch, c.norm_num_groups, name="mid_res_1")(h, dtype)
        h = _gn_silu(c.norm_num_groups, "conv_norm_out", dtype)(h)
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                       name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z, dtype=jnp.float32, up_to: Optional[int] = None):
        """``up_to``: perf-probe early exit — 0 stops after the mid stack,
        k >= 1 after up-block k-1 (scripts/probe_vae_stages.py)."""
        c = self.cfg
        ch = c.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dtype,
                    name="conv_in")(z.astype(dtype))
        h = ResnetBlock(ch, c.norm_num_groups, name="mid_res_0")(h, dtype)
        h = AttnBlock(c.norm_num_groups, name="mid_attn")(h, dtype)
        h = ResnetBlock(ch, c.norm_num_groups, name="mid_res_1")(h, dtype)
        if up_to == 0:
            return h
        for i, ch in enumerate(reversed(c.block_out_channels)):
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock(ch, c.norm_num_groups,
                                name=f"up_{i}_res_{j}")(h, dtype)
            if i != len(c.block_out_channels) - 1:
                B, H, W, C = h.shape
                # x2 nearest upsample as a reshape-broadcast (stays a copy in
                # XLA; jax.image.resize lowers to a gather)
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (B, H, 2, W, 2, C)
                ).reshape(B, 2 * H, 2 * W, C)
                h = nn.Conv(C, (3, 3), padding=1, dtype=dtype,
                            name=f"up_{i}_upsample")(h)
            if up_to == i + 1:
                return h
        h = _gn_silu(c.norm_num_groups, "conv_norm_out", dtype)(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1))
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1))

    def encode(self, x: jax.Array, rng=None, sample: bool = True,
               dtype=jnp.float32):
        """x in [-1, 1] NHWC fp32 -> latents scaled by scaling_factor."""
        x = x.astype(jnp.float32)
        moments = self.quant_conv(
            self.encoder(x, dtype).astype(jnp.float32)
        )
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample:
            assert rng is not None
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        else:
            z = mean
        return z * self.cfg.scaling_factor

    def decode(self, z: jax.Array, dtype=jnp.float32):
        z = z.astype(jnp.float32) / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z), dtype) \
            .astype(jnp.float32)

    def __call__(self, x, rng=None):
        z = self.encode(x, rng=rng, sample=rng is not None)
        return self.decode(z)
