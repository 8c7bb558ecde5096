"""LLaMA decoder with interleaved MMFS cross-attention — TPU-native.

Re-design of the reference `models/decoders/modeling_llama_mmfs.py` (LlamaModel
:567-755, LlamaMMFSAttention :311-367, LlamaDecoderLayer :370-450) as flax
modules:

  * every ``cross_attention_frequency``-th layer (idx % freq == 0, reference
    :581-583) gains a zero-init tanh-gated MMFS cross-attention block reading
    the multi-scale ViT pyramids of all *preceding* images;
  * the HF dynamically-growing ``past_key_values`` concat (:239-244) is
    replaced by a preallocated functional KV cache with a length counter —
    static shapes keep XLA from recompiling per decode step;
  * attention uses fp32 softmax (the flash-attn monkey patch's semantics)
    through :mod:`mm_interleaved_tpu.ops.attention`;
  * supports GQA (``num_key_value_heads``) even though Vicuna-13B is MHA,
    since the framework targets current LLaMA-family checkpoints too.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from ..ops.attention import dot_product_attention
from ..ops.quant import QDense
from ..ops.rmsnorm import rms_norm
from ..ops.rotary import apply_rotary_embedding, rotary_cos_sin
from .mmfs import MMFS


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32002
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None  # None -> MHA
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # --- MMFS cross-attention (reference LlamaMMFSAttention :311-344)
    cross_attention_frequency: int = 4
    image_embed_dim: int = 1024
    spatial_shapes: Tuple[int, ...] = (32, 16, 8)
    mmfs_heads: int = 16
    mmfs_points: int = 8
    max_num_image_per_seq: int = 50
    # --- runtime
    dtype: str = "float32"  # compute dtype ("bfloat16" on TPU)
    remat: bool = False
    # scan the layer stack in blocks of ``cross_attention_frequency`` —
    # HLO size and compile time become depth-independent (the 40-layer
    # flagship preset compiles like a 4-layer one). Parameters gain a
    # leading n_blocks axis under 'block/layer_{j}/...'; convert between
    # layouts with `stack_llama_layers` / `unstack_llama_layers`.
    scan_layers: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def level_shapes(self) -> Tuple[Tuple[int, int], ...]:
        return tuple((s, s) for s in self.spatial_shapes)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def has_cross_attn(self, layer_idx: int) -> bool:
        return layer_idx % self.cross_attention_frequency == 0


def _shard_kv(x: jax.Array) -> jax.Array:
    """Pin the stacked KV cache layout under sharded generation: batch over
    the data axes, kv heads over `tensor` (matching the megatron k/v_proj
    column split, so cache writes need no collective).  Identity outside a
    `generation_mesh` context."""
    from ..parallel.inference import constrain

    return constrain(x, None, ("data", "fsdp"), None, "tensor", None)


@struct.dataclass
class KVCache:
    """Preallocated per-layer KV cache.

    ``k``/``v``: ``[n_layers, B, max_len, n_kv_heads, head_dim]``;
    ``valid``: ``[B, max_len]`` bool — which slots hold real (non-pad) tokens;
    ``length``: scalar int32 — number of slots written so far (pad included).
    """

    k: jax.Array
    v: jax.Array
    valid: jax.Array
    length: jax.Array

    @classmethod
    def create(cls, config: LlamaConfig, batch: int, max_len: int) -> "KVCache":
        shape = (
            config.num_hidden_layers,
            batch,
            max_len,
            config.kv_heads,
            config.head_dim,
        )
        dtype = config.compute_dtype
        return cls(
            k=_shard_kv(jnp.zeros(shape, dtype)),
            v=_shard_kv(jnp.zeros(shape, dtype)),
            valid=jnp.zeros((batch, max_len), jnp.bool_),
            length=jnp.zeros((), jnp.int32),
        )

    def reorder(self, beam_idx: jax.Array) -> "KVCache":
        """Gather along batch — the `_reorder_cache` analogue for beam search
        (reference modeling_llama_mmfs.py:912-917)."""
        return KVCache(
            k=self.k[:, beam_idx],
            v=self.v[:, beam_idx],
            valid=self.valid[beam_idx],
            length=self.length,
        )


class LlamaMLP(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = cfg.compute_dtype
        gate = QDense(cfg.intermediate_size, use_bias=False, dtype=dtype,
                      name="gate_proj")(x)
        up = QDense(cfg.intermediate_size, use_bias=False, dtype=dtype,
                    name="up_proj")(x)
        return QDense(cfg.hidden_size, use_bias=False, dtype=dtype,
                      name="down_proj")(nn.silu(gate) * up)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        return rms_norm(x, w.astype(x.dtype), self.eps)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    layer_idx: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, C]
        positions: jax.Array,  # [B, T] absolute positions for RoPE
        attn_mask: Optional[jax.Array],  # [B, 1, T, Tk] bool, True = attend
        cache_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        cache_length: Optional[jax.Array] = None,
        causal: bool = False,
        segment_ids: Optional[jax.Array] = None,  # [B, T] (no-cache path)
    ):
        cfg = self.config
        dtype = cfg.compute_dtype
        B, T, _ = x.shape
        n_q, n_kv, hd = cfg.num_attention_heads, cfg.kv_heads, cfg.head_dim

        q = QDense(n_q * hd, use_bias=False, dtype=dtype, name="q_proj")(x)
        k = QDense(n_kv * hd, use_bias=False, dtype=dtype, name="k_proj")(x)
        v = QDense(n_kv * hd, use_bias=False, dtype=dtype, name="v_proj")(x)
        q = q.reshape(B, T, n_q, hd)
        k = k.reshape(B, T, n_kv, hd)
        v = v.reshape(B, T, n_kv, hd)

        cos, sin = rotary_cos_sin(hd, cfg.max_position_embeddings,
                                  base=cfg.rope_theta)
        q, k = apply_rotary_embedding(q, k, cos, sin, positions)

        new_kv = None
        if cache_kv is not None:
            ck, cv = cache_kv  # [B, max_len, n_kv, hd]
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k.astype(ck.dtype), cache_length, axis=1
            )
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v.astype(cv.dtype), cache_length, axis=1
            )
            k, v = ck, cv
            new_kv = (ck, cv)

        if n_kv != n_q:
            rep = n_q // n_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        out = dot_product_attention(
            q, k, v, mask=attn_mask, causal=causal,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
        )
        out = out.reshape(B, T, n_q * hd)
        out = QDense(cfg.hidden_size, use_bias=False, dtype=dtype,
                     name="o_proj")(out)
        return out, new_kv


class LlamaMMFSCrossAttention(nn.Module):
    """Gated MMFS cross-attention (reference LlamaMMFSAttention :311-367).

    Queries every token against all visible image pyramids with a fixed
    (0.5, 0.5) reference point; output is scaled by a zero-init tanh gate so
    the pretrained LLM is untouched at init.
    """

    config: LlamaConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, vision_hidden_states, cross_attention_mask,
                 vision_value=None):
        cfg = self.config
        h = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="norm1")(x)
        vis = None
        if vision_value is None:
            vis = RMSNorm(cfg.image_embed_dim, cfg.rms_norm_eps,
                          name="norm2")(vision_hidden_states)
        out = MMFS(
            d_model=cfg.hidden_size,
            d_query=cfg.hidden_size,
            d_value=cfg.image_embed_dim,
            d_out=cfg.hidden_size,
            n_heads=cfg.mmfs_heads,
            n_points=cfg.mmfs_points,
            ratio=cfg.image_embed_dim / cfg.hidden_size,
            offset_init_magnitude=3.0,
            level_shapes=cfg.level_shapes,
            base_spatial_shape=cfg.spatial_shapes[0]
            if len(cfg.spatial_shapes) == 1
            else 16,
            max_num_image_per_seq=cfg.max_num_image_per_seq,
            dtype=cfg.compute_dtype,
            name="attn",
        )(h, vis, cross_attention_mask, projected_value=vision_value)
        gate = self.param("gate", nn.initializers.zeros, (1,), jnp.float32)
        return out * jnp.tanh(gate).astype(out.dtype)


class LlamaDecoderLayer(nn.Module):
    config: LlamaConfig
    layer_idx: int

    @nn.compact
    def __call__(
        self,
        x,
        positions,
        attn_mask,
        vision_hidden_states=None,
        cross_attention_mask=None,
        cache_kv=None,
        cache_length=None,
        causal=False,
        segment_ids=None,
        vision_value=None,
    ):
        cfg = self.config
        residual = x
        h = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="input_layernorm")(x)
        h, new_kv = LlamaAttention(cfg, self.layer_idx, name="self_attn")(
            h, positions, attn_mask, cache_kv, cache_length,
            causal=causal, segment_ids=segment_ids,
        )
        x = residual + h

        if cfg.has_cross_attn(self.layer_idx) and (
            vision_hidden_states is not None or vision_value is not None
        ):
            residual = x
            h = LlamaMMFSCrossAttention(
                cfg, self.layer_idx, name="llama_cross_attn"
            )(x, vision_hidden_states, cross_attention_mask,
              vision_value=vision_value)
            x = residual + h

        residual = x
        h = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                    name="post_attention_layernorm")(x)
        h = LlamaMLP(cfg, name="mlp")(h)
        return residual + h, new_kv


def _layer_cls(cfg: LlamaConfig):
    if cfg.remat:
        # `causal` is a python bool -> static under remat (index 8
        # because flax's lifted remat counts the module itself as arg 0)
        return nn.remat(
            LlamaDecoderLayer, static_argnums=(8,), prevent_cse=False
        )
    return LlamaDecoderLayer


class LlamaLayerBlock(nn.Module):
    """The repeating unit of the decoder stack: one MMFS cross-attention
    layer (``layer_0``) followed by ``cross_attention_frequency - 1`` plain
    layers.  Scanned over blocks by :class:`LlamaModel` when
    ``config.scan_layers``, so the traced/compiled program contains ONE
    block regardless of depth."""

    config: LlamaConfig

    @nn.compact
    def __call__(self, h, scanned, shared):
        cfg = self.config
        block_kv, vision_value = scanned
        (positions, attn_mask, vision_hidden_states, cross_attention_mask,
         cache_length, causal, segment_ids) = shared
        layer_cls = _layer_cls(cfg)
        new_ks, new_vs = [], []
        for j in range(cfg.cross_attention_frequency):
            cache_kv = None
            if block_kv is not None:
                cache_kv = (block_kv[0][j], block_kv[1][j])
            # has_cross_attn(j) is True exactly for j == 0, matching the
            # unrolled stack's idx % freq == 0 gate at idx = b * freq + j
            h, new_kv = layer_cls(cfg, j, name=f"layer_{j}")(
                h,
                positions,
                attn_mask,
                vision_hidden_states if j == 0 else None,
                cross_attention_mask if j == 0 else None,
                cache_kv,
                cache_length,
                causal,
                segment_ids,
                vision_value if j == 0 else None,
            )
            if new_kv is not None:
                new_ks.append(new_kv[0])
                new_vs.append(new_kv[1])
        new_block_kv = (
            (jnp.stack(new_ks), jnp.stack(new_vs)) if new_ks else None
        )
        return h, new_block_kv


def _build_positions(attention_mask: jax.Array,
                     prev_valid: Optional[jax.Array] = None) -> jax.Array:
    """Positions = number of valid tokens strictly before each slot
    (matches HF's ``cumsum(mask)-1`` convention for left-padded batches)."""
    csum = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1)
    pos = csum - attention_mask.astype(jnp.int32)
    if prev_valid is not None:
        pos = pos + prev_valid[:, None]
    return jnp.maximum(pos, 0)


class LlamaModel(nn.Module):
    """Decoder stack. Takes ``inputs_embeds`` (image queries are scattered into
    the stream by the top model), returns final hidden states."""

    config: LlamaConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=cfg.compute_dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
        )
        if cfg.scan_layers:
            assert cfg.num_hidden_layers % cfg.cross_attention_frequency == 0, (
                "scan_layers needs num_hidden_layers divisible by "
                "cross_attention_frequency",
                cfg.num_hidden_layers, cfg.cross_attention_frequency,
            )
            n_blocks = cfg.num_hidden_layers // cfg.cross_attention_frequency
            self.block = nn.scan(
                LlamaLayerBlock,
                variable_axes={"params": 0, "intermediates": 0, "qscale": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast),
                out_axes=0,
                length=n_blocks,
            )(cfg, name="block")
        else:
            layer_cls = _layer_cls(cfg)
            self.layers = [
                layer_cls(cfg, i, name=f"layers_{i}")
                for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps)

    def embed(self, text_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(text_ids)

    def __call__(
        self,
        inputs_embeds: jax.Array,  # [B, T, C]
        attention_mask: Optional[jax.Array] = None,  # [B, T] 1 = valid
        vision_hidden_states: Optional[jax.Array] = None,  # [B, n_img, hw, Cv]
        cross_attention_mask: Optional[jax.Array] = None,  # [B, T, n_img]
        cache: Optional[KVCache] = None,
        positions: Optional[jax.Array] = None,
        vision_value_cache: Optional[jax.Array] = None,  # [n_cross, B, ...]
    ):
        cfg = self.config
        B, T, _ = inputs_embeds.shape
        if self.is_initializing():
            # materialise embed_tokens even when called with inputs_embeds
            self.embed_tokens(jnp.zeros((1, 1), jnp.int32))
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), jnp.int32)

        if cache is None:
            if positions is None:
                positions = _build_positions(attention_mask)
            # causal + padding via segment ids — keeps the Pallas flash path
            # eligible on the training/scoring hot path
            attn_mask = None
            segment_ids = attention_mask.astype(jnp.int32)
            causal = True
            cache_length = None
        else:
            max_len = cache.k.shape[2]
            prev_valid = cache.valid.sum(axis=-1).astype(jnp.int32)
            if positions is None:
                positions = _build_positions(attention_mask, prev_valid)
            new_valid = jax.lax.dynamic_update_slice_in_dim(
                cache.valid, attention_mask.astype(bool), cache.length, axis=1
            )
            slot = jnp.arange(max_len)[None, None, :]  # [1, 1, max_len]
            qi = cache.length + jnp.arange(T)[None, :, None]  # [1, T, 1]
            causal_m = slot <= qi  # [1, T, max_len]
            attn_mask = causal_m[:, None] & new_valid[:, None, None, :]
            segment_ids = None
            causal = False
            cache_length = cache.length

        h = inputs_embeds.astype(cfg.compute_dtype)
        if cfg.scan_layers:
            freq = cfg.cross_attention_frequency
            n_blocks = cfg.num_hidden_layers // freq
            block_kv = None
            if cache is not None:
                block_kv = tuple(
                    x.reshape((n_blocks, freq) + x.shape[1:])
                    for x in (cache.k, cache.v)
                )
            shared = (positions, attn_mask, vision_hidden_states,
                      cross_attention_mask, cache_length, causal,
                      segment_ids)
            h, stacked_kv = self.block(
                h, (block_kv, vision_value_cache), shared
            )
            if stacked_kv is not None:
                # [n_blocks, freq, ...] -> [n_layers, ...]
                new_ks, new_vs = (
                    x.reshape((cfg.num_hidden_layers,) + x.shape[2:])
                    for x in stacked_kv
                )
        else:
            new_ks, new_vs = [], []
            for i, layer in enumerate(self.layers):
                cache_kv = None
                if cache is not None:
                    cache_kv = (cache.k[i], cache.v[i])
                vision_value = None
                if vision_value_cache is not None and cfg.has_cross_attn(i):
                    vision_value = vision_value_cache[
                        i // cfg.cross_attention_frequency
                    ]
                h, new_kv = layer(
                    h,
                    positions,
                    attn_mask,
                    vision_hidden_states,
                    cross_attention_mask,
                    cache_kv,
                    cache_length,
                    causal,
                    segment_ids,
                    vision_value,
                )
                if new_kv is not None:
                    new_ks.append(new_kv[0])
                    new_vs.append(new_kv[1])
            if cache is not None:
                new_ks, new_vs = jnp.stack(new_ks), jnp.stack(new_vs)

        h = self.norm(h)

        new_cache = None
        if cache is not None:
            new_cache = KVCache(
                k=_shard_kv(new_ks),
                v=_shard_kv(new_vs),
                valid=new_valid,
                length=cache.length + T,
            )
        return h, new_cache


def stack_llama_layers(params: dict, num_layers: int, freq: int) -> dict:
    """Convert an unrolled LlamaModel param (sub)tree — ``layers_{i}/...`` —
    to the ``scan_layers`` layout: ``block/layer_{j}/...`` with a leading
    ``n_blocks`` axis on every leaf (layer ``i = b * freq + j`` maps to
    block ``b``, slot ``j``).  Non-layer entries pass through unchanged."""
    import numpy as np

    p = dict(params)
    n_blocks = num_layers // freq
    assert n_blocks * freq == num_layers, (num_layers, freq)
    block = {}
    for j in range(freq):
        per_block = [p.pop(f"layers_{b * freq + j}") for b in range(n_blocks)]
        block[f"layer_{j}"] = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *per_block
        )
    p["block"] = block
    return p


def unstack_llama_layers(params: dict, num_layers: int, freq: int) -> dict:
    """Inverse of :func:`stack_llama_layers`."""
    p = dict(params)
    block = p.pop("block")
    n_blocks = num_layers // freq
    for j in range(freq):
        for b in range(n_blocks):
            p[f"layers_{b * freq + j}"] = jax.tree.map(
                lambda x: x[b], block[f"layer_{j}"]
            )
    return p


class TextDecoder(nn.Module):
    """Dual-head text decoder (reference `decoders/decoder_text.py:28-163`):
    a frozen ``head`` copied from the LLM's lm_head (new-vocab rows zero,
    bias -100) plus a trainable ``head_new`` delta over the new special-token
    slots (zero weight, bias 95 -> net -5 at init)."""

    config: LlamaConfig
    orig_vocab_size: int = 32000

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        cfg = self.config
        n_new = cfg.vocab_size - self.orig_vocab_size

        def head_bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[self.orig_vocab_size:].set(-100.0)

        logits = QDense(
            cfg.vocab_size,
            dtype=cfg.compute_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=head_bias_init,
            name="head",
        )(hidden_states)
        logits_new = QDense(
            n_new,
            dtype=cfg.compute_dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.constant(100.0 - 5.0),
            name="head_new",
        )(hidden_states)
        return logits.at[..., self.orig_vocab_size:].add(logits_new)
