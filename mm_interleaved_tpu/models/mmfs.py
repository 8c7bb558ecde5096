"""MMFS — Multi-image Multi-scale Feature Synchronizer.

TPU-native re-design of the reference module
(`/root/reference/mm_interleaved/models/utils/ops/modules/mmfs.py:26-276`):
masked multi-image deformable cross-attention from a query stream onto the
multi-scale ViT feature pyramids of the images in the sequence.

Differences from the reference (behaviour-preserving, shape-friendly for XLA):
  * the image axis is folded into the batch axis for the gather instead of
    being flattened into the level axis (one gather per *unique* level);
  * per-level spatial shapes are static python ints;
  * the softmax over ``n_img*n_levels*(n_points+1)`` slots — including the
    learned "ignore" slot pinned at logit ``-log(n_img*n_levels)``
    (reference mmfs.py:225) and the ``-10000`` masking of invalid images
    (mmfs.py:203-223) — is reproduced exactly;
  * **linear decomposition over the relpos embedding** (round 3): the
    reference materialises ``q_img = q[:, None] + relpos_emb[r]`` as a
    ``[B, n_img, Lq, d_query]`` tensor and runs the offsets/attention
    projections on it (mmfs.py:175-193).  Both projections are linear, so
    ``W(q + e[r]) = W q + (W e)[r]`` — we project the (tiny) relpos table
    once and gather, cutting the projection FLOPs and every wide
    intermediate by the ``n_img`` factor.  The softmax factorises the same
    way: ``softmax`` weights become ``Eq[l,p] * Et[r][l,p] / Z`` with
    ``Eq = exp(logit_q - m_q)``, ``Et = exp(logit_tab - m_t)`` and a
    closed-form ignore-slot mass (the ignore logit is the constant
    ``-log(n_img*n_levels)``), so no ``[B, Lq, H, n_img, L, P+1]`` softmax
    is ever materialised.

Note the reference's conditional write of 1.0 into the ignore logit for
all-masked queries (mmfs.py:212,223) is dead code: line 225 unconditionally
overwrites the ignore slot afterwards.  We implement the effective semantics.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..ops.ms_deform_attn import ms_deform_attn_multi_image


def _offset_bias_init(magnitude: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-magnitude, maxval=magnitude
        )

    return init


def image_relpos_from_mask(mask: jax.Array, max_images: int) -> jax.Array:
    """Per-(query,) image relative-position index (reference mmfs.py:154-163):
    the most recent valid image gets the highest index, counting down;
    invalid images get 0.  ``mask`` is int [..., n_img]."""
    num_tot = mask.sum(axis=-1, keepdims=True)
    num_prev = jnp.cumsum(mask, axis=-1)
    relpos = (num_tot + 1 - num_prev) * mask
    return jnp.clip(relpos, 0, max_images - 1)


class MMFS(nn.Module):
    """Masked multi-image multi-scale deformable attention.

    Attributes mirror the reference constructor (mmfs.py:27-42).
    ``level_shapes`` are the static per-image level resolutions, e.g.
    ``((32, 32), (16, 16), (8, 8))`` for the LLM branch.
    """

    d_model: int = 256
    d_query: int = -1
    d_value: int = 256
    d_out: int = -1
    n_heads: int = 8
    n_points: int = 8
    ratio: float = 1.0
    offset_init_magnitude: float = 3.0
    level_shapes: Sequence[Tuple[int, int]] = ((16, 16),)
    base_spatial_shape: int = 16
    max_num_image_per_seq: int = 50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [B, Lq, d_query]
        input_flatten: Optional[jax.Array],  # [B, n_img, hw, d_value]
        attention_mask: jax.Array,  # [B, Lq, n_img] or [B, n_img]; 1=valid
        reference_points: Optional[jax.Array] = None,  # [B, Lq, 2] in [0,1]
        projected_value: Optional[jax.Array] = None,  # [B, n_img, hw, d_vp]
        value_slabs: Optional[Tuple[jax.Array, ...]] = None,
    ) -> jax.Array:
        """``projected_value`` lets decode steps reuse the value projection of
        the (step-invariant) vision pyramid: the prefill pass sows it under
        'intermediates'/'projected_value' and the generation runtime feeds it
        back, skipping a full `value_proj` matmul per step per layer.

        ``value_slabs`` goes one step further for the factorized UNet path:
        per-level row-major kernel-layout slabs (``[B, H, n_img*HWp_l, D]``,
        see `ops.ms_deform_attn_pallas_mi.prepare_value_slabs`) prepared
        once outside the denoise scan — the layout transpose is ~180 MB of
        HBM per 64px block per step and XLA does not hoist it out of
        `lax.scan` on its own.  When given, ``input_flatten`` /
        ``projected_value`` may be None and the factorized kernel is used
        unconditionally (the caller made the dispatch decision)."""
        d_query = self.d_query if self.d_query > 0 else self.d_model
        d_out = self.d_out if self.d_out > 0 else self.d_model
        d_val_proj = int(self.d_model * self.ratio)
        n_levels = len(self.level_shapes)
        B, Lq, _ = query.shape
        n_img = attention_mask.shape[-1]
        nlevels = n_img * n_levels
        P = self.n_points
        H = self.n_heads
        R = self.max_num_image_per_seq

        # mask per image, optionally per query (LLM branch)
        per_query_mask = attention_mask.ndim == 3
        mask = attention_mask.astype(jnp.int32)
        # relpos: [B, n_img] (UNet branch) or [B, Lq, n_img] (LLM branch)
        image_relpos = image_relpos_from_mask(mask, R)

        # --- value projection (skipped when the prefill already computed it)
        if value_slabs is not None:
            value = None
        elif projected_value is None:
            value = nn.Dense(
                d_val_proj,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name="value_proj",
            )(input_flatten)
            self.sow("intermediates", "projected_value", value)
        else:
            value = projected_value
        if value is not None:
            value = value.reshape(
                B, n_img, -1, H, d_val_proj // H
            )

        # --- per-image query conditioning, linearly decomposed
        q = nn.Dense(d_query, dtype=self.dtype, name="dynamic_offset_mask")(
            query
        )  # [B, Lq, d_query]
        relpos_table = nn.Embed(
            R,
            d_query,
            embedding_init=nn.initializers.truncated_normal(stddev=0.02),
            dtype=self.dtype,
            name="query_relpos",
        )
        emb_mat = relpos_table(jnp.arange(R, dtype=jnp.int32))  # [R, d_query]
        # bias-free projection of the relpos table: Dense(x) - Dense(0) == xW
        zero_row = jnp.zeros((1, d_query), emb_mat.dtype)

        # --- sampling offsets: zero weight, uniform bias (mmfs.py:102-110)
        off_dense = nn.Dense(
            H * P * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(self.offset_init_magnitude),
            name="sampling_offsets",
        )
        off_q = off_dense(q)  # [B, Lq, H*P*2] (bias included)
        off_tab = off_dense(emb_mat) - off_dense(zero_row)  # [R, H*P*2]

        attn_dense = nn.Dense(
            H * n_levels * (P + 1),
            dtype=self.dtype,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )
        logit_q = attn_dense(q)  # [B, Lq, H*L*(P+1)]
        logit_tab = attn_dense(emb_mat) - attn_dense(zero_row)

        # --- factorised softmax over (n_img, L, P) + closed-form ignore slot.
        # Point slot (n,l,p) logit = lq[l,p] + lt[r_n][l,p] (+ -10000 invalid,
        # realised as a hard 0 factor: exp(-10000) == 0 in fp32); ignore slots
        # are the constant -log(nlevels), total unnormalised mass
        # n_img*L*exp(-log(n_img*L)) = 1 (reference mmfs.py:225-241).
        lq = logit_q.reshape(B, Lq, H, n_levels, P + 1)[..., :P]
        lq = lq.astype(jnp.float32)
        lt = logit_tab.reshape(R, H, n_levels, P + 1)[..., :P]
        lt = lt.astype(jnp.float32)
        m_q = lq.max(axis=(-2, -1))  # [B, Lq, H]
        m_t = lt.max(axis=(0, -2, -1))  # [H]
        Eq = jnp.exp(lq - m_q[..., None, None])  # [B, Lq, H, L, P]
        Et = jnp.exp(lt - m_t[None, :, None, None])  # [R, H, L, P]

        m_sum = m_q + m_t[None, None, :]  # [B, Lq, H]
        mc = jnp.maximum(m_sum, -80.0)  # overflow guard on the ignore mass
        point_scale = jnp.exp(m_sum - mc)  # <= 1, == 1 unless clamped
        # total unnormalised ignore mass: nlevels slots of
        # exp(-log(nlevels) - mc) each -> exp(-mc)
        ignore_mass = jnp.exp(-mc)  # [B, Lq, H]

        off_q_r = off_q.astype(jnp.float32).reshape(B, Lq, H, P, 2)
        off_tab_r = off_tab.astype(jnp.float32).reshape(R, H, P, 2)

        # per-level offset scaling (mmfs.py:193-198, 243-250): a single
        # offset set broadcast across levels, scaled by
        # (level_size / base_spatial_shape) / (W_l, H_l)
        per_level = jnp.asarray(
            [
                [w / self.base_spatial_shape / w, h / self.base_spatial_shape / h]
                for (h, w) in self.level_shapes
            ],
            dtype=jnp.float32,
        )  # [L, 2] == 1/base per axis, kept per-level for generality

        if reference_points is None:
            ref = jnp.full((B, Lq, 2), 0.5, dtype=jnp.float32)
        else:
            ref = reference_points.astype(jnp.float32)

        factorized = False
        if per_query_mask:
            # LLM branch: relpos varies per query -> gather per (b, q, n)
            Et_g = Et[image_relpos]  # [B, Lq, n_img, H, L, P]
            Et_g = Et_g * mask[..., None, None, None].astype(jnp.float32)
            S = jnp.einsum("bqhlp,bqnhlp->bqhn", Eq, Et_g)
            off_img = off_tab_r[image_relpos]  # [B, Lq, n_img, H, P, 2]
            off_full = (
                off_q_r[:, :, None] + off_img
            )  # [B, Lq, n_img, H, P, 2]
            Et_b = rearrange(Et_g, "b q n h l p -> b q h n l p")
            off_b = rearrange(off_full, "b q n h p t -> b q h n p t")
        else:
            # UNet branch: relpos is per (b, n) only -> tiny gathers
            from ..ops.ms_deform_attn import factorized_deform_eligible

            Et_g = Et[image_relpos]  # [B, n_img, H, L, P]
            Et_g = Et_g * mask[..., None, None, None].astype(jnp.float32)
            S = jnp.einsum("bqhlp,bnhlp->bqhn", Eq, Et_g)
            off_img = off_tab_r[image_relpos]  # [B, n_img, H, P, 2]
            factorized = (
                value_slabs is not None or factorized_deform_eligible(Lq)
            )
            if not factorized:
                off_full = off_q_r[:, :, None] + off_img[:, None]
                Et_b = rearrange(Et_g, "b n h l p -> b () h n l p")
                off_b = rearrange(off_full, "b q n h p t -> b q h n p t")

        Z = S.sum(axis=-1) * point_scale + ignore_mass  # [B, Lq, H]
        rZ = point_scale / Z  # point-mass normaliser

        # --- ignore-token contribution (zeros at init; kept for parity with
        # loaded weights, mmfs.py:87-89, 233-241).  Folded through the output
        # projection instead of materialised per query: with
        # ig[b,q] = concat_h(w_ignore[b,q,h] * token_h), linearity gives
        # (out + ig) @ W + bias == Dense(out) + w_ignore @ (token_h @ W_h)
        # — the [B, Lq, H*D] intermediate (200 MB/f32 per 64px UNet block)
        # collapses to a [H, d_out] table.
        ignore_token = self.param(
            "ignore_token",
            nn.initializers.zeros,
            (d_val_proj,),
            jnp.float32,
        )
        ignore_heads = ignore_token.reshape(H, d_val_proj // H)
        w_ignore_tot = ignore_mass / Z  # [B, Lq, H]

        if factorized:
            # image axis stays on-chip: the kernel expands the (query,
            # image)-separable offsets/weights internally.  The query weight
            # factor rides in the value dtype (bf16 in production) — post-
            # softmax weights don't need f32, and it halves the second-
            # largest per-step HBM stream of the denoise loop.
            from ..ops.ms_deform_attn_pallas_mi import (
                build_delta,
                mmfs_deform_factorized_prepared,
                prepare_value_slabs,
            )

            inv_base = 1.0 / self.base_spatial_shape
            shapes = tuple(self.level_shapes)
            slabs = (
                value_slabs if value_slabs is not None
                else prepare_value_slabs(value, shapes)
            )
            delta = build_delta(off_img, Et_g, shapes, inv_base)
            Bv = slabs[0].shape[0]
            if Bv != B:
                # CFG-shared slabs (denoise hoist): the image side is
                # identical across the guidance halves — relpos tables and
                # masks are duplicated — so the kernel reads the
                # un-duplicated half (query row c*Bv+b <- image row b)
                delta = delta[:Bv]
            out = mmfs_deform_factorized_prepared(
                slabs,
                delta,
                shapes,
                ref,
                off_q_r,
                (Eq * rZ[..., None, None]).astype(slabs[0].dtype),
                inv_base=inv_base,
            )
        else:
            # wide tensors for the deform core, built by broadcast (fused by
            # XLA into the core's own input prep)
            w_points = (
                Eq[:, :, :, None] * Et_b * rZ[:, :, :, None, None, None]
            )  # [B, Lq, H, n_img, L, P]
            sampling_locations = (
                ref[:, :, None, None, None, None, :]
                + off_b[:, :, :, :, None, :, :]
                * per_level[None, None, None, None, :, None, :]
            )  # [B, Lq, H, n_img, L, P, 2]
            out = ms_deform_attn_multi_image(
                value,
                self.level_shapes,
                sampling_locations.astype(value.dtype),
                w_points.astype(value.dtype),
            )
        out_dense = nn.Dense(
            d_out,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="output_proj",
        )
        out = out_dense(out)
        # folded ignore path: embed token_h into head-h's input slot
        # (block-diagonal [H, H*D]), project bias-free (Dense(x) - Dense(0)
        # == x W) to the [H, d_out] table, then one tiny per-query matmul.
        tok = (
            jnp.eye(H, dtype=jnp.float32)[:, :, None]
            * ignore_heads[:, None, :]
        ).reshape(H, d_val_proj)
        tok_w = out_dense(tok) - out_dense(jnp.zeros((1, d_val_proj)))
        out = out + jnp.einsum(
            "bqh,ho->bqo", w_ignore_tot.astype(tok_w.dtype), tok_w
        )
        return out
