"""UNet-side MMFS: deformable readout of previous-image ViT pyramids,
injected as additive residuals into every UNet down-block residual and the
mid-block sample.

Re-design of the reference `decoders/sd_mmfs.py` (MMFSBlock :44-151, MMFSNet
:154-272) — but built directly into our native UNet instead of a monkey-patched
diffusers forward (`monkey_patch/sd_unet_forward_monkey_patch.py:318-325`).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ...ops.pos_embed import get_2d_sincos_pos_embed, resize_abs_pos_embed
from ..deform_attn import grid_reference_points
from ..mmfs import MMFS


@dataclasses.dataclass(frozen=True)
class MMFSNetConfig:
    input_channel: int = 1024  # ViT pyramid channel dim
    attn_dim: int = 1024
    n_heads: int = 16
    n_points: int = 8
    # per-image ViT pyramid level resolutions (c1..c4 for a 224px encoder)
    feat_spatial_shapes: Tuple[int, ...] = (64, 32, 16, 8)
    max_num_image_per_seq: int = 10
    pos_grid_size: int = 64  # latent resolution the pos table is built for


class MMFSBlock(nn.Module):
    """One deformable readout: query = a UNet feature map (+2D sin-cos pos),
    output zero-init 1x1-conv'd back to the query width
    (reference sd_mmfs.py:44-151)."""

    cfg: MMFSNetConfig
    query_dim: int
    base_spatial_shape: int

    @nn.compact
    def __call__(self, sample, mmfs_values, mmfs_mask, projected_value=None,
                 value_slabs=None):
        """sample: [B, H, W, Cq]; mmfs_values: [B, n_img, sum(hw), Cv];
        mmfs_mask: [B, n_img].

        ``projected_value`` short-circuits the step-invariant feat_norm +
        value_proj chain: the denoise loop runs one capture pass, collects
        each block's sown projection, and reuses it for every step (the
        reference recomputes both per UNet call, sd_mmfs.py:99-120).
        ``value_slabs`` additionally pre-lays-out the projection in the
        factorized kernel's per-level row-major form (the transpose is the
        dominant hoistable per-step HBM stream — see models/mmfs.py)."""
        c = self.cfg
        B, H, W, Cq = sample.shape

        q = rearrange(sample, "b h w c -> b (h w) c")
        q = nn.LayerNorm(epsilon=1e-6, name="query_norm")(q)
        table = jnp.asarray(
            get_2d_sincos_pos_embed(Cq, c.pos_grid_size, cls_token=False)
        )
        pe = resize_abs_pos_embed(table, c.pos_grid_size, H)
        q = q + pe[None].astype(q.dtype)

        feats = (
            nn.LayerNorm(epsilon=1e-6, name="feat_norm")(mmfs_values)
            if projected_value is None and value_slabs is None else None
        )

        ref = jnp.asarray(grid_reference_points(((H, W),)))[None]
        ref = jnp.broadcast_to(ref, (B, H * W, 2))

        out = MMFS(
            d_model=c.attn_dim,
            d_query=Cq,
            d_value=c.input_channel,
            d_out=Cq,
            n_heads=c.n_heads,
            n_points=c.n_points,
            ratio=1.0,
            offset_init_magnitude=1.0,
            level_shapes=tuple((s, s) for s in c.feat_spatial_shapes),
            base_spatial_shape=self.base_spatial_shape,
            max_num_image_per_seq=c.max_num_image_per_seq,
            dtype=sample.dtype,
            name="mmfs",
        )(q, feats, mmfs_mask, reference_points=ref,
          projected_value=projected_value, value_slabs=value_slabs)

        out = rearrange(out, "b (h w) c -> b h w c", h=H)
        out = nn.Conv(
            Cq, (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv",
        )(out)
        return out


class MMFSNet(nn.Module):
    """One MMFSBlock per UNet down-block residual + one for the mid sample
    (reference sd_mmfs.py:154-272)."""

    cfg: MMFSNetConfig
    residual_channels: Tuple[int, ...]  # channel of each down residual
    residual_sizes: Tuple[int, ...]  # spatial size of each down residual
    mid_channel: int
    mid_size: int

    @nn.compact
    def __call__(self, sample, down_block_res_samples, mmfs_values, mmfs_mask,
                 projected_values=None):
        """``projected_values``: optional per-block pre-projected value
        tuple, down blocks first then mid (len == n_down + 1).  Each entry
        is either the raw ``[B, n_img, hw, d_vp]`` projection or a dict
        with ``"projected"`` and/or ``"slabs"`` (the factorized kernel's
        pre-laid-out per-level value slabs, see
        `generation.diffusion.compute_mmfs_projections`)."""
        assert len(down_block_res_samples) == len(self.residual_channels)
        pv = (projected_values if projected_values is not None
              else (None,) * (len(self.residual_channels) + 1))

        def unpack(entry):
            if entry is None:
                return None, None
            if isinstance(entry, dict):
                return entry.get("projected"), entry.get("slabs")
            return entry, None

        new_res = []
        for i, res in enumerate(down_block_res_samples):
            proj, slabs = unpack(pv[i])
            delta = MMFSBlock(
                self.cfg,
                self.residual_channels[i],
                self.residual_sizes[i],
                name=f"down_blocks_{i}",
            )(res, mmfs_values, mmfs_mask, projected_value=proj,
              value_slabs=slabs)
            new_res.append(res + delta)
        proj, slabs = unpack(pv[-1])
        delta = MMFSBlock(
            self.cfg, self.mid_channel, self.mid_size, name="mid_block"
        )(sample, mmfs_values, mmfs_mask, projected_value=proj,
          value_slabs=slabs)
        return sample + delta, tuple(new_res)
