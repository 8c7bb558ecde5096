"""MMInterleaved — the top-level interleaved image-text generative model.

TPU-native re-design of the reference `models/mm_interleaved.py:25-763`:
one token stream mixes text with per-image blocks of ``<soi>`` +
``num_img_token`` ``<image>`` placeholders; a visual tokenizer contributes
per-image query embeddings (scattered into the stream) and multi-scale
pyramids (cross-attended by MMFS layers in the LLM and by the SD UNet).

Static-shape conventions (vs the reference's ragged flat image batch):
  * ``image_tensors``: ``[B, max_img, H, W, 3]`` padded, with
    ``num_image_per_seq[B]`` real counts;
  * all position bookkeeping via :mod:`stream_ops` masked computations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..ops.pos_embed import get_1d_sincos_pos_embed
from . import stream_ops as so
from .image_decoder import ImageDecoder, ImageDecoderConfig
from .llama import KVCache, LlamaConfig, LlamaModel, TextDecoder
from .visual_tokenizer import VisualTokenizer, VisualTokenizerConfig


@dataclasses.dataclass(frozen=True)
class SpecialTokens:
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 31999
    soi_token_id: int = 32000
    image_token_id: int = 32001

    def asdict(self):
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class MMInterleavedConfig:
    llm: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    visual: VisualTokenizerConfig = dataclasses.field(
        default_factory=VisualTokenizerConfig
    )
    image_decoder: Optional[ImageDecoderConfig] = None
    special: SpecialTokens = dataclasses.field(default_factory=SpecialTokens)
    seq_len: int = 2048
    num_img_token: int = 64
    max_num_images: int = 10
    max_context_len: int = 512
    loss_img_weight: float = 10.0
    loss_txt_weight: float = 1.0
    orig_vocab_size: int = 32000


class MMInterleaved(nn.Module):
    cfg: MMInterleavedConfig

    def setup(self):
        c = self.cfg
        self.visual_tokenizer = VisualTokenizer(c.visual)
        self.mm_decoder = LlamaModel(c.llm)
        self.text_decoder = TextDecoder(c.llm, orig_vocab_size=c.orig_vocab_size)
        self.context_feat_proj = nn.Dense(
            c.llm.hidden_size, dtype=c.llm.compute_dtype
        )
        self.soi_token = self.param(
            "soi_token", nn.initializers.zeros, (c.llm.hidden_size,), jnp.float32
        )
        if c.image_decoder is not None:
            self.image_decoder = ImageDecoder(c.image_decoder)
        else:
            self.image_decoder = None

    # ------------------------------------------------------------------ #
    # shared preparation                                                  #
    # ------------------------------------------------------------------ #

    def _encode_images(self, image_tensors: jax.Array, deterministic=True):
        """[B, max_img, H, W, 3] -> vis_embed [B, max_img, n_tok, C_llm],
        pyramid levels each [B, max_img, h, w, C_vis]."""
        B, max_img = image_tensors.shape[:2]
        flat = rearrange(image_tensors, "b n h w c -> (b n) h w c")
        out = self.visual_tokenizer(flat, deterministic=deterministic)
        vis_embed = rearrange(
            out["vis_embed"], "(b n) t c -> b n t c", b=B
        )
        pyramid = tuple(
            rearrange(f, "(b n) h w c -> b n h w c", b=B)
            for f in out["multiscale_features"]
        )
        return vis_embed, pyramid

    def _mmfs_value_for_llm(self, pyramid):
        """Select pyramid levels matching ``llm.spatial_shapes`` and flatten to
        the MMFS value layout ``[B, max_img, sum(hw), C]``
        (reference mm_interleaved.py:223-250)."""
        c = self.cfg
        chosen = []
        for feat in pyramid:
            if feat.shape[2] in c.llm.spatial_shapes:
                chosen.append(rearrange(feat, "b n h w c -> b n (h w) c"))
        assert len(chosen) == len(c.llm.spatial_shapes), (
            [f.shape for f in pyramid], c.llm.spatial_shapes
        )
        return jnp.concatenate(chosen, axis=2)

    def prepare_mm_embeds(
        self,
        text_ids: jax.Array,
        image_tensors: jax.Array,
        num_image_per_seq: jax.Array,
        deterministic: bool = True,
    ):
        c = self.cfg
        max_img = image_tensors.shape[1]
        text_embeds = self.mm_decoder.embed(text_ids)
        vis_embed, pyramid = self._encode_images(
            image_tensors, deterministic=deterministic
        )
        mm_embeds = so.scatter_image_embeds(
            text_embeds, text_ids, vis_embed, c.special.image_token_id
        )
        mm_embeds = so.add_soi_embeds(
            mm_embeds, text_ids,
            self.soi_token.astype(mm_embeds.dtype), c.special.soi_token_id
        )
        # pin the merged stream to batch sharding: GSPMD propagation from
        # the (tensor, fsdp)-sharded embed table otherwise lands a
        # [1, seq, hidden]-style sharding here and pays an involuntary full
        # rematerialization resharding into the decoder's batch layout
        from ..parallel.inference import constrain

        mm_embeds = constrain(mm_embeds, ("data", "fsdp"))
        cross_mask, soi_pos = so.mm_cross_attention_mask(
            text_ids,
            num_image_per_seq,
            c.special.soi_token_id,
            c.special.bos_token_id,
            max_img,
        )
        mmfs_values = self._mmfs_value_for_llm(pyramid)
        return dict(
            mm_embeds=mm_embeds,
            cross_attention_mask=cross_mask,
            mmfs_values=mmfs_values,
            soi_pos=soi_pos,
            pyramid=pyramid,
        )

    def _image_decoder_inputs(
        self, hidden, text_ids, soi_pos, pyramid, num_image_per_seq,
        nearest_bos: Optional[jax.Array] = None,
    ):
        """Context windows + previous-image pyramid for the SD branch
        (reference mm_interleaved.py:254-340)."""
        c = self.cfg
        B, L, _ = hidden.shape
        if nearest_bos is None:
            near_bos = so.nearest_bos_positions(
                text_ids, c.special.bos_token_id
            )
        else:
            near_bos = nearest_bos
        ctx, ctx_mask = so.context_windows(
            hidden, soi_pos, near_bos, num_image_per_seq,
            min(c.max_context_len, L),
        )
        ctx = self.context_feat_proj(ctx)
        pe = jnp.asarray(
            get_1d_sincos_pos_embed(c.llm.hidden_size, ctx.shape[2])
        )
        ctx = ctx + pe[None, None].astype(ctx.dtype)

        # previous-image multiscale features, n_img axis = 1
        prev_mask = so.previous_image_mask(
            soi_pos, near_bos, num_image_per_seq, L
        )  # [B, max_img]
        mmfs_feats = []
        for feat in pyramid:
            if feat.shape[2] in (c.image_decoder.spatial_shapes
                                 if c.image_decoder is not None
                                 else c.llm.spatial_shapes):
                prev = jnp.roll(feat, 1, axis=1)  # image k-1 at slot k
                prev = prev * prev_mask[:, :, None, None, None].astype(prev.dtype)
                mmfs_feats.append(
                    rearrange(prev, "b n h w c -> (b n) 1 (h w) c")
                )
        mmfs_values = jnp.concatenate(mmfs_feats, axis=2)
        ctx = rearrange(ctx, "b n l c -> (b n) l c")
        ctx_mask = rearrange(ctx_mask, "b n l -> (b n) l")
        prev_mask = rearrange(prev_mask, "b n -> (b n) 1")
        return ctx, ctx_mask, mmfs_values, prev_mask

    # ------------------------------------------------------------------ #
    # training forward                                                    #
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        text_ids: jax.Array,
        image_tensors: jax.Array,
        num_image_per_seq: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        image_tensors_dec: Optional[jax.Array] = None,
        image_loss_mask: Optional[jax.Array] = None,
        gt_text_ids: Optional[jax.Array] = None,
        ignore_prompt_token_offset=0,
        ignore_noimage_cond_loss: bool = False,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ):
        c = self.cfg
        B, L = text_ids.shape
        if attention_mask is None:
            attention_mask = (text_ids != c.special.pad_token_id).astype(
                jnp.int32
            )

        prep = self.prepare_mm_embeds(
            text_ids, image_tensors, num_image_per_seq,
            deterministic=deterministic,
        )
        hidden, _ = self.mm_decoder(
            prep["mm_embeds"],
            attention_mask=attention_mask,
            vision_hidden_states=prep["mmfs_values"],
            cross_attention_mask=prep["cross_attention_mask"],
        )

        logits = self.text_decoder(hidden)
        if gt_text_ids is not None:
            labels = gt_text_ids[:, 1:]
        else:
            labels = so.prepare_gt_text_ids(
                text_ids,
                attention_mask,
                c.special.asdict(),
                ignore_prompt_token_offset=ignore_prompt_token_offset,
                ignore_noimage_cond_loss=ignore_noimage_cond_loss,
            )
        loss_txt = so.cross_entropy_ignore(logits[:, :-1], labels)
        loss = loss_txt * c.loss_txt_weight
        output = dict(loss_txt=loss_txt)

        if self.image_decoder is not None:
            ctx, ctx_mask, mmfs_values, mmfs_mask = self._image_decoder_inputs(
                hidden, text_ids, prep["soi_pos"], prep["pyramid"],
                num_image_per_seq,
            )
            targets = (
                image_tensors_dec if image_tensors_dec is not None
                else image_tensors
            )
            targets = rearrange(targets, "b n h w c -> (b n) h w c")
            # only train on real images with enough context
            img_valid = (
                jnp.arange(image_tensors.shape[1])[None, :]
                < num_image_per_seq[:, None]
            ).astype(jnp.float32)
            ctx_len = ctx_mask.sum(axis=-1)
            img_valid = img_valid.reshape(-1) * (ctx_len > 2)
            if image_loss_mask is not None:
                img_valid = img_valid * image_loss_mask.reshape(-1)
            loss_img = self.image_decoder(
                image_tensors=targets,
                context_features=ctx,
                context_attention_mask=ctx_mask,
                image_loss_mask=img_valid,
                mmfs_features=mmfs_values,
                mmfs_mask=mmfs_mask,
                deterministic=deterministic,
                rng=rng,
            )
            loss = loss + loss_img * c.loss_img_weight
            output["loss_img"] = loss_img

        output["loss"] = loss
        return output

    # ------------------------------------------------------------------ #
    # generation-time pieces (driven by the runtime in generation/)       #
    # ------------------------------------------------------------------ #

    def lm_prefill(
        self, mm_embeds, attention_mask, mmfs_values, cross_attention_mask,
        cache: KVCache,
    ):
        hidden, cache = self.mm_decoder(
            mm_embeds,
            attention_mask=attention_mask,
            vision_hidden_states=mmfs_values,
            cross_attention_mask=cross_attention_mask,
            cache=cache,
        )
        logits = self.text_decoder(hidden)
        return logits, hidden, cache

    def lm_decode_step(
        self, token_ids, attention_mask, mmfs_values, cross_attention_mask,
        cache: KVCache, vision_value_cache=None,
    ):
        """One decode step: token_ids [B, 1].  ``vision_value_cache``
        (prefill-sown per-layer MMFS value projections) skips the per-step
        value_proj over the vision pyramid."""
        embeds = self.mm_decoder.embed(token_ids)
        embeds = so.add_soi_embeds(
            embeds, token_ids,
            self.soi_token.astype(embeds.dtype),
            self.cfg.special.soi_token_id,
        )
        hidden, cache = self.mm_decoder(
            embeds,
            attention_mask=attention_mask,
            vision_hidden_states=mmfs_values,
            cross_attention_mask=cross_attention_mask,
            cache=cache,
            vision_value_cache=vision_value_cache,
        )
        logits = self.text_decoder(hidden)
        return logits, cache

    def generate_image_inputs(
        self, text_ids, image_tensors, num_image_per_seq, attention_mask=None,
    ):
        """Full prefix forward -> (context, mmfs) inputs for SD sampling
        (reference generate_images, mm_interleaved.py:520-596).

        Inference-only entry point, so the Pallas deformable kernel is
        enabled for the encoder/prefill deformable calls."""
        from ..ops.ms_deform_attn import pallas_deform_inference

        c = self.cfg
        if attention_mask is None:
            attention_mask = (text_ids != c.special.pad_token_id).astype(
                jnp.int32
            )
        with pallas_deform_inference():
            prep = self.prepare_mm_embeds(
                text_ids, image_tensors, num_image_per_seq
            )
            hidden, _ = self.mm_decoder(
                prep["mm_embeds"],
                attention_mask=attention_mask,
                vision_hidden_states=prep["mmfs_values"],
                cross_attention_mask=prep["cross_attention_mask"],
            )
        return self._image_decoder_inputs(
            hidden, text_ids, prep["soi_pos"], prep["pyramid"],
            num_image_per_seq,
        )
