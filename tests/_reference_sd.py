"""Tiny PyTorch oracle for the SD UNet/VAE converter parity tests.

diffusers itself is not installed in this image, so this module re-creates
the *math* of `UNet2DConditionModel` (SD2.x layout: linear proj_in/out,
GEGLU feed-forward, GroupNorm eps 1e-5 in resnets / 1e-6 in the spatial
transformer norm) and `AutoencoderKL` from torch.nn primitives, with module
attribute names chosen so ``state_dict()`` yields exactly the diffusers key
set that `utils/convert_sd.py` consumes.  The conventions pinned here are
the ones the reference model depends on (reference `models/decoders/
sd.py:48-71` loads stock diffusers weights; the patched forward
`monkey_patch/sd_unet_forward_monkey_patch.py:17-373` preserves them):

  * timestep embedding: flip_sin_to_cos=True, freq_shift=0 -> [cos, sin];
  * resnet: GN(1e-5) -> silu -> conv3x3 -> + time_emb_proj(silu(t)) ->
    GN(1e-5) -> silu -> conv3x3, 1x1 conv_shortcut on channel change;
  * transformer block: LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU
    (x*gelu(gate), exact erf gelu), head split [B,T,H,hd], scale hd^-0.5;
  * up path: channel-concat [h, skip] (h first);
  * VAE: GN eps 1e-6 everywhere, single-head mid attention scaled C^-0.5,
    asymmetric (0,1,0,1) pad on encoder downsample convs.

A converter transpose/flip/eps error must make `test_sd_oracle.py` fail.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    emb = t.float()[:, None] * torch.exp(exponent / half)[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TimeEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(groups, in_ch), in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(min(groups, out_ch), out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class CrossAttention(nn.Module):
    def __init__(self, dim, ctx_dim, n_heads):
        super().__init__()
        self.heads = n_heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, T, D = x.shape
        H = self.heads
        hd = D // H
        q = self.to_q(x).view(B, T, H, hd).transpose(1, 2)
        k = self.to_k(ctx).view(B, -1, H, hd).transpose(1, 2)
        v = self.to_v(ctx).view(B, -1, H, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, T, D)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, 4 * dim), nn.Identity(), nn.Linear(4 * dim, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, n_heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = CrossAttention(dim, dim, n_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = CrossAttention(dim, ctx_dim, n_heads)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff(self.norm3(x))


class Transformer2DModel(nn.Module):
    """SD2.x form: linear proj_in/out."""

    def __init__(self, dim, ctx_dim, n_heads, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, ctx_dim, n_heads)]
        )
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = self.proj_out(h)
        return res + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


class _Down(nn.Module):
    def __init__(self, conv):
        super().__init__()
        self.conv = conv


class _Block(nn.Module):
    def __init__(self, resnets, attentions=None, downsamplers=None,
                 upsamplers=None):
        super().__init__()
        self.resnets = nn.ModuleList(resnets)
        if attentions is not None:
            self.attentions = nn.ModuleList(attentions)
        if downsamplers is not None:
            self.downsamplers = nn.ModuleList(downsamplers)
        if upsamplers is not None:
            self.upsamplers = nn.ModuleList(upsamplers)


class TorchMiniUNet(nn.Module):
    """diffusers UNet2DConditionModel at a tiny config (same block logic as
    `mm_interleaved_tpu/models/sd/unet.py`: last down block attention-free,
    up path in reverse channel order)."""

    def __init__(self, in_ch=4, out_ch=4, block_out=(16, 32),
                 layers_per_block=1, ctx_dim=16, head_dim=8, groups=4):
        super().__init__()
        n = len(block_out)
        temb_dim = block_out[0] * 4
        self.block_out = block_out
        self.conv_in = nn.Conv2d(in_ch, block_out[0], 3, padding=1)
        self.time_embedding = TimeEmbedding(block_out[0], temb_dim)

        self.down_blocks = nn.ModuleList()
        ch = block_out[0]
        for i, out in enumerate(block_out):
            has_attn = i != n - 1
            resnets, attns = [], []
            for _ in range(layers_per_block):
                resnets.append(ResnetBlock2D(ch, out, temb_dim, groups))
                ch = out
                if has_attn:
                    attns.append(
                        Transformer2DModel(out, ctx_dim, out // head_dim,
                                           groups)
                    )
            down = None
            if i != n - 1:
                down = [_Down(nn.Conv2d(out, out, 3, stride=2, padding=1))]
            self.down_blocks.append(
                _Block(resnets, attns if has_attn else None, down)
            )

        mid_ch = block_out[-1]
        self.mid_block = _Block(
            [ResnetBlock2D(mid_ch, mid_ch, temb_dim, groups),
             ResnetBlock2D(mid_ch, mid_ch, temb_dim, groups)],
            [Transformer2DModel(mid_ch, ctx_dim, mid_ch // head_dim, groups)],
        )

        # skip-channel bookkeeping mirrors diffusers: conv_in emits one skip,
        # each resnet one, each downsampler one
        skips = [block_out[0]]
        for i, out in enumerate(block_out):
            skips += [out] * layers_per_block
            if i != n - 1:
                skips.append(out)

        self.up_blocks = nn.ModuleList()
        ch = mid_ch
        for i, out in enumerate(reversed(block_out)):
            block_idx = n - 1 - i
            has_attn = block_idx != n - 1
            resnets, attns = [], []
            for _ in range(layers_per_block + 1):
                skip = skips.pop()
                resnets.append(
                    ResnetBlock2D(ch + skip, out, temb_dim, groups)
                )
                ch = out
                if has_attn:
                    attns.append(
                        Transformer2DModel(out, ctx_dim, out // head_dim,
                                           groups)
                    )
            ups = None
            if i != n - 1:
                ups = [_Down(nn.Conv2d(out, out, 3, padding=1))]
            self.up_blocks.append(
                _Block(resnets, attns if has_attn else None,
                       upsamplers=ups)
            )

        self.conv_norm_out = nn.GroupNorm(groups, block_out[0], eps=1e-5)
        self.conv_out = nn.Conv2d(block_out[0], out_ch, 3, padding=1)

    def forward(self, sample, timesteps, ctx):
        temb = self.time_embedding(
            timestep_embedding(timesteps, self.block_out[0])
        )
        h = self.conv_in(sample)
        skips = [h]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if attns:
                    h = attns[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)

        for blk in self.up_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if attns:
                    h = attns[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ------------------------------------------------------------------ #
# VAE                                                                #
# ------------------------------------------------------------------ #


class VAEResnet(ResnetBlock2D):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__(in_ch, out_ch, temb_dim=None, groups=groups,
                         eps=1e-6)


class VAEAttention(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) * C ** -0.5, dim=-1)
        h = self.to_out[0](attn @ v)
        return x + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


class _MidVAE(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnet(ch, ch, groups), VAEResnet(ch, ch, groups)]
        )
        self.attentions = nn.ModuleList([VAEAttention(ch, groups)])

    def forward(self, h):
        h = self.resnets[0](h)
        h = self.attentions[0](h)
        return self.resnets[1](h)


class TorchVAEEncoder(nn.Module):
    def __init__(self, in_ch, latent_ch, block_out, layers_per_block,
                 groups):
        super().__init__()
        n = len(block_out)
        self.conv_in = nn.Conv2d(in_ch, block_out[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = block_out[0]
        for i, out in enumerate(block_out):
            resnets = []
            for _ in range(layers_per_block):
                resnets.append(VAEResnet(ch, out, groups))
                ch = out
            down = None
            if i != n - 1:
                down = [_Down(nn.Conv2d(out, out, 3, stride=2, padding=0))]
            self.down_blocks.append(_Block(resnets, downsamplers=down))
        self.mid_block = _MidVAE(block_out[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, block_out[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(block_out[-1], 2 * latent_ch, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))  # diffusers asymmetric pad
                h = blk.downsamplers[0].conv(h)
        h = self.mid_block(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchVAEDecoder(nn.Module):
    def __init__(self, out_ch, latent_ch, block_out, layers_per_block,
                 groups):
        super().__init__()
        n = len(block_out)
        self.conv_in = nn.Conv2d(latent_ch, block_out[-1], 3, padding=1)
        self.mid_block = _MidVAE(block_out[-1], groups)
        self.up_blocks = nn.ModuleList()
        ch = block_out[-1]
        for i, out in enumerate(reversed(block_out)):
            resnets = []
            for _ in range(layers_per_block + 1):
                resnets.append(VAEResnet(ch, out, groups))
                ch = out
            ups = None
            if i != n - 1:
                ups = [_Down(nn.Conv2d(out, out, 3, padding=1))]
            self.up_blocks.append(_Block(resnets, upsamplers=ups))
        self.conv_norm_out = nn.GroupNorm(groups, block_out[0], eps=1e-6)
        self.conv_out = nn.Conv2d(block_out[0], out_ch, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid_block(h)
        for blk in self.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TorchMiniVAE(nn.Module):
    def __init__(self, in_ch=3, out_ch=3, latent_ch=4, block_out=(8, 16, 16),
                 layers_per_block=1, groups=4):
        super().__init__()
        self.encoder = TorchVAEEncoder(in_ch, latent_ch, block_out,
                                       layers_per_block, groups)
        self.decoder = TorchVAEDecoder(out_ch, latent_ch, block_out,
                                       layers_per_block, groups)
        self.quant_conv = nn.Conv2d(2 * latent_ch, 2 * latent_ch, 1)
        self.post_quant_conv = nn.Conv2d(latent_ch, latent_ch, 1)

    def encode_mean(self, x):
        moments = self.quant_conv(self.encoder(x))
        return moments.chunk(2, dim=1)[0]

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
