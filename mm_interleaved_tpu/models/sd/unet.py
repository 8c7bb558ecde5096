"""UNet2DConditionModel — SD 2.1-base architecture, native flax (NHWC).

Replaces diffusers' UNet + the reference's forward monkey patch
(`monkey_patch/sd_unet_forward_monkey_patch.py:17-373`): the MMFS readout of
previous-image pyramids is a first-class optional input applied to the down
residuals and mid sample (patch hook at :318-325), not a runtime patch.

Attention runs through :mod:`mm_interleaved_tpu.ops.attention` (fp32 softmax,
Pallas flash path on TPU) — the analogue of the reference's xformers swap
(`decoders/sd.py:64-65`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ...ops.attention import dot_product_attention
from ...ops.group_norm import GroupNorm, GroupNormSiLU
from .mmfs_net import MMFSNet, MMFSNetConfig


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64  # per-head width (SD2.x uses ch/64 heads)
    norm_num_groups: int = 32
    mmfs: Optional[MMFSNetConfig] = None
    dtype: str = "float32"
    # rematerialize each Resnet/SpatialTransformer block in the backward
    # pass (the reference trains with use_unet_gradient_checkpointing=True,
    # sd.py:31-32) — at 512px the unstashed conv/attn activations dominate
    # the train step's peak memory
    remat: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def down_residual_spec(self):
        """(channels, sizes) of the down-block residual stack — one entry per
        skip connection, in emission order."""
        chans, sizes = [self.block_out_channels[0]], [self.sample_size]
        size = self.sample_size
        for i, ch in enumerate(self.block_out_channels):
            for _ in range(self.layers_per_block):
                chans.append(ch)
                sizes.append(size)
            if i != len(self.block_out_channels) - 1:
                size //= 2
                chans.append(ch)
                sizes.append(size)
        return tuple(chans), tuple(sizes)


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """diffusers-compatible sinusoidal embedding (flip_sin_to_cos=True,
    freq_shift=0): [B] -> [B, dim] fp32."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        # stats stay fp32 inside flax; dtype only sets the normalized-output
        # dtype — bf16 here halves the HBM round-trip between norm and conv
        h = GroupNormSiLU(num_groups=min(self.groups, in_ch), epsilon=1e-5,
                          dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :].astype(h.dtype)
        h = GroupNormSiLU(num_groups=min(self.groups, self.out_ch),
                          epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class _DenseParams(nn.Module):
    """Parameters of an `nn.Dense` (same names, shapes, initializers)
    without the matmul — lets a fused Pallas kernel consume `ff_in` /
    `ff_out` weights while keeping checkpoint paths identical to the
    unfused module."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(),
            (self.features,), jnp.float32,
        )
        return kernel, bias


class TransformerBlock(nn.Module):
    dim: int
    n_heads: int
    cross_dim: int
    dtype: jnp.dtype = jnp.float32

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
            o = dot_product_attention(q, k, v).reshape(B, T, d)
            return nn.Dense(d, dtype=self.dtype, name=f"{prefix}_out")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + attend(h, h, "attn1")
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + attend(h, context, "attn2")
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        # GEGLU feed-forward.  On TPU inference traces the fused Pallas
        # kernel keeps the [T, 4d] GEGLU halves in VMEM — the XLA path's
        # [B, T, 8d] intermediate is the UNet's largest HBM stream
        # (~6 ms/step at 64px, ops/geglu.py); training and CPU keep the
        # unfused path (same params, same math, f32 accumulation both ways)
        from ...ops.geglu import geglu_fused_eligible, geglu_mlp

        if geglu_fused_eligible(d, T):
            w1, b1 = _DenseParams(d, 8 * d, name="ff_in")()
            w2, b2 = _DenseParams(4 * d, d, name="ff_out")()
            h = geglu_mlp(
                h, w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
            )
            return x + h
        g = nn.Dense(8 * d, dtype=self.dtype, name="ff_in")(h)
        a, b = jnp.split(g, 2, axis=-1)
        h = a * nn.gelu(b, approximate=False)
        return x + nn.Dense(d, dtype=self.dtype, name="ff_out")(h)


class SpatialTransformer(nn.Module):
    n_heads: int
    cross_dim: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = GroupNorm(num_groups=self.groups, epsilon=1e-6,
                      dtype=self.dtype, name="norm")(x)
        h = nn.Dense(C, dtype=self.dtype, name="proj_in")(
            h.reshape(B, H * W, C)
        )
        h = TransformerBlock(C, self.n_heads, self.cross_dim,
                             self.dtype, name="block")(h, context)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return residual + h.reshape(B, H, W, C)


class UNet2DConditionModel(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, H, W, in_channels] latents
        timesteps: jax.Array,  # [B]
        encoder_hidden_states: jax.Array,  # [B, S, cross_dim]
        mmfs_values: Optional[jax.Array] = None,  # [B, n_img, sum hw, Cv]
        mmfs_mask: Optional[jax.Array] = None,  # [B, n_img]
        mmfs_projected=None,  # per-block pre-projected values (denoise hoist)
    ) -> jax.Array:
        c = self.cfg
        dtype = c.compute_dtype
        n_blocks = len(c.block_out_channels)
        Res = nn.remat(ResnetBlock) if c.remat else ResnetBlock
        Attn = nn.remat(SpatialTransformer) if c.remat else SpatialTransformer

        temb = timestep_embedding(timesteps, c.block_out_channels[0])
        temb = nn.Dense(c.time_embed_dim, dtype=dtype, name="time_fc1")(
            temb.astype(dtype)
        )
        temb = nn.Dense(c.time_embed_dim, dtype=dtype, name="time_fc2")(
            nn.silu(temb)
        )

        ctx = encoder_hidden_states.astype(dtype)
        h = nn.Conv(c.block_out_channels[0], (3, 3), padding=1, dtype=dtype,
                    name="conv_in")(sample.astype(dtype))

        res_stack = [h]
        for i, ch in enumerate(c.block_out_channels):
            has_attn = i != n_blocks - 1  # last down block is attention-free
            for j in range(c.layers_per_block):
                h = Res(ch, c.norm_num_groups, dtype,
                                name=f"down_{i}_res_{j}")(h, temb)
                if has_attn:
                    h = Attn(
                        ch // c.attention_head_dim, c.cross_attention_dim,
                        c.norm_num_groups, dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, ctx)
                res_stack.append(h)
            if i != n_blocks - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            dtype=dtype, name=f"down_{i}_downsample")(h)
                res_stack.append(h)

        # mid
        ch = c.block_out_channels[-1]
        h = Res(ch, c.norm_num_groups, dtype, name="mid_res_0")(h, temb)
        h = Attn(
            ch // c.attention_head_dim, c.cross_attention_dim,
            c.norm_num_groups, dtype, name="mid_attn",
        )(h, ctx)
        h = Res(ch, c.norm_num_groups, dtype, name="mid_res_1")(h, temb)

        # MMFS residual injection (reference hook sd_unet...py:318-325)
        if c.mmfs is not None and mmfs_values is not None:
            chans, sizes = c.down_residual_spec()
            h, res_stack = MMFSNet(
                c.mmfs,
                residual_channels=chans,
                residual_sizes=sizes,
                mid_channel=ch,
                mid_size=sizes[-1],
                name="mmfs_net",
            )(h, tuple(res_stack), mmfs_values, mmfs_mask,
              projected_values=mmfs_projected)
            res_stack = list(res_stack)

        # up
        for i, ch in enumerate(reversed(c.block_out_channels)):
            block_idx = n_blocks - 1 - i
            has_attn = block_idx != n_blocks - 1
            for j in range(c.layers_per_block + 1):
                res = res_stack.pop()
                h = jnp.concatenate([h, res], axis=-1)
                h = Res(ch, c.norm_num_groups, dtype,
                                name=f"up_{i}_res_{j}")(h, temb)
                if has_attn:
                    h = Attn(
                        ch // c.attention_head_dim, c.cross_attention_dim,
                        c.norm_num_groups, dtype,
                        name=f"up_{i}_attn_{j}",
                    )(h, ctx)
            if i != n_blocks - 1:
                B, H, W, C = h.shape
                # x2 nearest upsample as a reshape-broadcast (stays a copy
                # in XLA; jax.image.resize lowers to a gather) — same trick
                # as the VAE decoder
                h = jnp.broadcast_to(
                    h[:, :, None, :, None, :], (B, H, 2, W, 2, C)
                ).reshape(B, 2 * H, 2 * W, C)
                h = nn.Conv(C, (3, 3), padding=1, dtype=dtype,
                            name=f"up_{i}_upsample")(h)

        h = GroupNormSiLU(num_groups=c.norm_num_groups, epsilon=1e-5,
                          dtype=dtype, name="conv_norm_out")(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, name="conv_out")(h)
