"""ViT-Adapter on top of the CLIP ViT — produces the multi-scale pyramid.

Re-design of the reference `models/encoders/vit_adapter/` stack:
  * `SpatialPriorModule` conv stem (adapter_modules.py:267-328),
  * `Injector` (deformable attn pyramid->ViT, zero-init gamma gate,
    adapter_modules.py:129-154),
  * `Extractor` (+ConvFFN) (ViT->pyramid, adapter_modules.py:92-126),
  * `InteractionBlockWithCls` driving groups of frozen ViT layers
    (adapter_modules.py:196-233),
  * pyramid assembly at strides 4/8/16/32 with the transposed-conv upsample
    and ViT-map residuals (vit_adapter_hf.py:109-167).

All conv/feature tensors are NHWC (TPU-native) — the reference's NCHW maps
appear here as [B, H, W, C]; flattened token views are [B, H*W, C] row-major,
matching the reference's `flatten(2).transpose(1, 2)`.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .deform_attn import MSDeformAttn, grid_reference_points
from .vit import ViTConfig, ViTEmbeddings, ViTLayer


@dataclasses.dataclass(frozen=True)
class ViTAdapterConfig:
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    conv_inplane: int = 64
    n_points: int = 4
    deform_ratio: float = 0.5
    cffn_ratio: float = 0.25
    num_interactions: int = 4
    extra_extractors: int = 2  # appended to the last interaction block
    layer_norm_eps: float = 1e-6

    @property
    def dim(self) -> int:
        return self.vit.hidden_size

    @property
    def grid(self) -> int:
        return self.vit.grid_size

    @property
    def spm_size(self) -> int:
        # the SPM runs on the input bilinearly resized so its stride-16 map
        # matches the ViT grid (vit_adapter_hf.py:115-116)
        return self.grid * 16

    @property
    def injector_levels(self) -> Tuple[Tuple[int, int], ...]:
        g = self.grid
        return ((2 * g, 2 * g), (g, g), (g // 2, g // 2))

    @property
    def extractor_levels(self) -> Tuple[Tuple[int, int], ...]:
        g = self.grid
        return ((g, g),)


class _ConvLNRelu(nn.Module):
    features: int
    stride: int = 1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False,
        )(x)
        x = nn.LayerNorm(epsilon=self.eps)(x)
        return nn.relu(x)


class SpatialPriorModule(nn.Module):
    """Conv pyramid at strides 4/8/16/32 (adapter_modules.py:267-328)."""

    inplanes: int = 64
    embed_dim: int = 1024
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        # stem: stride 2 conv + 2 convs + stride-2 maxpool -> stride 4
        h = _ConvLNRelu(self.inplanes, 2, self.eps)(x)
        h = _ConvLNRelu(self.inplanes, 1, self.eps)(h)
        h = _ConvLNRelu(self.inplanes, 1, self.eps)(h)
        c1 = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c2 = _ConvLNRelu(2 * self.inplanes, 2, self.eps)(c1)
        c3 = _ConvLNRelu(4 * self.inplanes, 2, self.eps)(c2)
        c4 = _ConvLNRelu(4 * self.inplanes, 2, self.eps)(c3)
        c1 = nn.Conv(self.embed_dim, (1, 1), name="fc1")(c1)
        c2 = nn.Conv(self.embed_dim, (1, 1), name="fc2")(c2)
        c3 = nn.Conv(self.embed_dim, (1, 1), name="fc3")(c3)
        c4 = nn.Conv(self.embed_dim, (1, 1), name="fc4")(c4)
        return c1, c2, c3, c4


class ConvFFN(nn.Module):
    """FFN with a shared depthwise 3x3 conv applied per pyramid level
    (adapter_modules.py:52-89)."""

    dim: int
    hidden: int
    level_shapes: Sequence[Tuple[int, int]]

    @nn.compact
    def __call__(self, x):  # [B, sum(HW), dim]
        B = x.shape[0]
        x = nn.Dense(self.hidden, name="fc1")(x)
        dw = nn.Conv(
            self.hidden, (3, 3), padding=1,
            feature_group_count=self.hidden, name="dwconv",
        )
        outs, start = [], 0
        for h, w in self.level_shapes:
            chunk = jax.lax.slice_in_dim(x, start, start + h * w, axis=1)
            chunk = dw(chunk.reshape(B, h, w, self.hidden))
            outs.append(chunk.reshape(B, h * w, self.hidden))
            start += h * w
        x = jnp.concatenate(outs, axis=1)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class Injector(nn.Module):
    """Pyramid -> ViT tokens, gamma-gated (adapter_modules.py:129-154)."""

    cfg: ViTAdapterConfig

    @nn.compact
    def __call__(self, query, reference_points, feat):
        c = self.cfg
        q = nn.LayerNorm(epsilon=c.layer_norm_eps, name="query_norm")(query)
        f = nn.LayerNorm(epsilon=c.layer_norm_eps, name="feat_norm")(feat)
        attn = MSDeformAttn(
            d_model=c.dim,
            n_heads=c.vit.num_attention_heads,
            n_points=c.n_points,
            ratio=c.deform_ratio,
            level_shapes=c.injector_levels,
            dtype=c.vit.compute_dtype,
            name="attn",
        )(q, reference_points, f)
        gamma = self.param("gamma", nn.initializers.zeros, (c.dim,), jnp.float32)
        return query + gamma.astype(attn.dtype) * attn


class Extractor(nn.Module):
    """ViT tokens -> pyramid, with ConvFFN (adapter_modules.py:92-126)."""

    cfg: ViTAdapterConfig

    @nn.compact
    def __call__(self, query, reference_points, feat):
        c = self.cfg
        q = nn.LayerNorm(epsilon=c.layer_norm_eps, name="query_norm")(query)
        f = nn.LayerNorm(epsilon=c.layer_norm_eps, name="feat_norm")(feat)
        attn = MSDeformAttn(
            d_model=c.dim,
            n_heads=c.vit.num_attention_heads,
            n_points=c.n_points,
            ratio=c.deform_ratio,
            level_shapes=c.extractor_levels,
            dtype=c.vit.compute_dtype,
            name="attn",
        )(q, reference_points, f)
        query = query + attn
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn_norm")(query)
        h = ConvFFN(
            c.dim,
            int(c.dim * c.cffn_ratio),
            c.injector_levels,
            name="ffn",
        )(h)
        return query + h


class CLIPViTAdapter(nn.Module):
    """CLIP ViT + adapter; returns (last_hidden_state, 4-level pyramid)."""

    cfg: ViTAdapterConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array):
        c = self.cfg
        vit = c.vit
        dim = c.dim
        B = pixel_values.shape[0]
        g = c.grid
        n_layers = vit.num_hidden_layers
        n_groups = c.num_interactions
        assert n_layers % n_groups == 0

        # --- ViT embeddings (frozen core)
        x = ViTEmbeddings(vit, name="embeddings")(pixel_values)
        x = nn.LayerNorm(epsilon=vit.layer_norm_eps,
                         dtype=vit.compute_dtype, name="pre_layrnorm")(x)
        cls, tokens = x[:, :1], x[:, 1:]

        # --- SPM pyramid on the resized input
        pix = jax.image.resize(
            pixel_values,
            (B, c.spm_size, c.spm_size, pixel_values.shape[-1]),
            method="bilinear",
        )
        c1, c2, c3, c4 = SpatialPriorModule(
            c.conv_inplane, dim, c.layer_norm_eps, name="adapter_spm"
        )(pix)

        level_embed = self.param(
            "adapter_level_embed", nn.initializers.zeros, (3, dim), jnp.float32
        )
        c2f = c2.reshape(B, -1, dim) + level_embed[0]
        c3f = c3.reshape(B, -1, dim) + level_embed[1]
        c4f = c4.reshape(B, -1, dim) + level_embed[2]
        cfeat = jnp.concatenate([c2f, c3f, c4f], axis=1)

        inj_ref = jnp.asarray(grid_reference_points(((g, g),)))[None]
        ext_ref = jnp.asarray(grid_reference_points(c.injector_levels))[None]

        layers = [ViTLayer(vit, name=f"layers_{i}") for i in range(n_layers)]
        per_group = n_layers // n_groups

        group_maps = []
        for gi in range(n_groups):
            tokens = Injector(c, name=f"interactions_{gi}_injector")(
                tokens, inj_ref, cfeat
            )
            x = jnp.concatenate([cls, tokens], axis=1)
            for li in range(gi * per_group, (gi + 1) * per_group):
                x = layers[li](x)
            cls, tokens = x[:, :1], x[:, 1:]
            cfeat = Extractor(c, name=f"interactions_{gi}_extractor")(
                cfeat, ext_ref, tokens
            )
            if gi == n_groups - 1:
                for ei in range(c.extra_extractors):
                    cfeat = Extractor(
                        c, name=f"interactions_{gi}_extra_extractor_{ei}"
                    )(cfeat, ext_ref, tokens)
            group_maps.append(tokens.reshape(B, g, g, dim))

        # --- pyramid assembly (vit_adapter_hf.py:137-153)
        n2 = 4 * g * g
        c2m = cfeat[:, :n2].reshape(B, 2 * g, 2 * g, dim)
        c3m = cfeat[:, n2 : n2 + g * g].reshape(B, g, g, dim)
        c4m = cfeat[:, n2 + g * g :].reshape(B, g // 2, g // 2, dim)
        c1m = nn.ConvTranspose(
            dim, (2, 2), strides=(2, 2), name="adapter_up"
        )(c2m) + c1

        def up(feat, size):
            return jax.image.resize(
                feat, (B, size, size, dim), method="bilinear"
            )

        x1, x2, x3, x4 = group_maps
        c1m = c1m + up(x1, 4 * g)
        c2m = c2m + up(x2, 2 * g)
        c3m = c3m + x3
        c4m = c4m + up(x4, g // 2)

        last_hidden_state = jnp.concatenate(
            [cls, group_maps[-1].reshape(B, g * g, dim)], axis=1
        )
        return last_hidden_state, (c1m, c2m, c3m, c4m)
