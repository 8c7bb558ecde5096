"""HF checkpoint -> mm_interleaved_tpu parameter conversion.

Replaces the reference's `load_model_weights` (`utils/misc.py:13-63`) and the
various `from_pretrained` calls: maps PyTorch state dicts (LLaMA, CLIP ViT,
SD UNet/VAE) onto our flax parameter trees.  All dense kernels transpose
([out, in] -> [in, out]); convs go OIHW -> HWIO.

Inputs are plain ``{name: np.ndarray}`` dicts so the converter works from
safetensors / torch .bin shards / in-memory modules alike.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):  # torch linear weight -> flax kernel
    return np.asarray(w).T


def _conv(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_mmfs(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Reference `MMFS` module state dict -> our flax `MMFS` params
    (reference models/utils/ops/modules/mmfs.py:86-99: sampling_offsets,
    ignore_token [1,1,1,dv], dynamic_offset_mask, attention_weights,
    value_proj, output_proj, query_relpos)."""
    p: Dict = {}
    for name in ("sampling_offsets", "dynamic_offset_mask",
                 "attention_weights", "value_proj", "output_proj"):
        p[name] = {
            "kernel": _t(sd[f"{prefix}{name}.weight"]),
            "bias": np.asarray(sd[f"{prefix}{name}.bias"]),
        }
    p["ignore_token"] = np.asarray(sd[f"{prefix}ignore_token"]).reshape(-1)
    p["query_relpos"] = {
        "embedding": np.asarray(sd[f"{prefix}query_relpos.weight"])
    }
    return p


def convert_llama(sd: Dict[str, np.ndarray], num_layers: int,
                  prefix: str = "model.") -> Dict:
    """HF `LlamaModel` state dict -> our `LlamaModel` params
    (embed_tokens, layers_N/{self_attn,mlp,norms}, norm).  Layers carrying the
    reference's `llama_cross_attn` MMFS block (modeling_llama_mmfs.py:311-367)
    are converted too: gate, norm1/norm2 RMSNorms and the inner MMFS module."""
    p: Dict = {}
    p["embed_tokens"] = {
        "embedding": np.asarray(sd[f"{prefix}embed_tokens.weight"])
    }
    for i in range(num_layers):
        lp = f"{prefix}layers.{i}."
        layer = {
            "self_attn": {
                name: {"kernel": _t(sd[f"{lp}self_attn.{name}.weight"])}
                for name in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "mlp": {
                name: {"kernel": _t(sd[f"{lp}mlp.{name}.weight"])}
                for name in ("gate_proj", "up_proj", "down_proj")
            },
            "input_layernorm": {
                "weight": np.asarray(sd[f"{lp}input_layernorm.weight"])
            },
            "post_attention_layernorm": {
                "weight": np.asarray(
                    sd[f"{lp}post_attention_layernorm.weight"]
                )
            },
        }
        if f"{lp}llama_cross_attn.gate" in sd:
            layer["llama_cross_attn"] = {
                "gate": np.asarray(sd[f"{lp}llama_cross_attn.gate"]),
                "norm1": {
                    "weight": np.asarray(sd[f"{lp}llama_cross_attn.norm1.weight"])
                },
                "norm2": {
                    "weight": np.asarray(sd[f"{lp}llama_cross_attn.norm2.weight"])
                },
                "attn": convert_mmfs(sd, f"{lp}llama_cross_attn.attn."),
            }
        p[f"layers_{i}"] = layer
    p["norm"] = {"weight": np.asarray(sd[f"{prefix}norm.weight"])}
    return p


def convert_text_decoder(lm_head_weight: np.ndarray, vocab_size: int,
                         orig_vocab_size: int,
                         lm_head_bias=None) -> Dict:
    """Build the dual-head TextDecoder params from the LLM's lm_head
    (reference decoder_text.py:53-91): frozen head = lm_head rows (new rows
    zero, bias -100); head_new = zero kernel, bias 95."""
    hidden = lm_head_weight.shape[1]
    n_new = vocab_size - orig_vocab_size
    kernel = np.zeros((hidden, vocab_size), np.float32)
    kernel[:, : min(orig_vocab_size, lm_head_weight.shape[0])] = _t(
        lm_head_weight[:orig_vocab_size]
    )
    bias = np.zeros((vocab_size,), np.float32)
    if lm_head_bias is not None:
        bias[: orig_vocab_size] = np.asarray(lm_head_bias)[:orig_vocab_size]
    bias[orig_vocab_size:] = -100.0
    return {
        "head": {"kernel": kernel, "bias": bias},
        "head_new": {
            "kernel": np.zeros((hidden, n_new), np.float32),
            "bias": np.full((n_new,), 95.0, np.float32),
        },
    }


def convert_clip_vit(sd: Dict[str, np.ndarray], num_layers: int,
                     prefix: str = "vision_model.") -> Dict:
    """HF `CLIPVisionModel` -> our ViT core params (embeddings, pre_layrnorm,
    layers_N). Intended to be merged into the CLIPViTAdapter param tree
    (adapter params train from scratch, vit_adapter_hf.py:243-252)."""
    p: Dict = {
        "embeddings": {
            "patch_embedding": {
                "kernel": _conv(sd[f"{prefix}embeddings.patch_embedding.weight"])
            },
            "class_embedding": np.asarray(
                sd[f"{prefix}embeddings.class_embedding"]
            ),
            "position_embedding": np.asarray(
                sd[f"{prefix}embeddings.position_embedding.weight"]
            ),
        },
        "pre_layrnorm": {
            "scale": np.asarray(sd[f"{prefix}pre_layrnorm.weight"]),
            "bias": np.asarray(sd[f"{prefix}pre_layrnorm.bias"]),
        },
    }
    for i in range(num_layers):
        lp = f"{prefix}encoder.layers.{i}."
        layer = {}
        for ours, theirs in (
            ("q_proj", "self_attn.q_proj"),
            ("k_proj", "self_attn.k_proj"),
            ("v_proj", "self_attn.v_proj"),
            ("out_proj", "self_attn.out_proj"),
            ("fc1", "mlp.fc1"),
            ("fc2", "mlp.fc2"),
        ):
            layer[ours] = {
                "kernel": _t(sd[f"{lp}{theirs}.weight"]),
                "bias": np.asarray(sd[f"{lp}{theirs}.bias"]),
            }
        for ln in ("layer_norm1", "layer_norm2"):
            layer[ln] = {
                "scale": np.asarray(sd[f"{lp}{ln}.weight"]),
                "bias": np.asarray(sd[f"{lp}{ln}.bias"]),
            }
        p[f"layers_{i}"] = layer
    return p


def merge_params(target: Dict, updates: Dict, path: str = "") -> Dict:
    """Recursively overwrite leaves of ``target`` with ``updates``; shapes
    must match.  Returns a new tree (inputs untouched)."""
    out = dict(target)
    for k, v in updates.items():
        assert k in target, f"unknown param {path}/{k}"
        if isinstance(v, dict):
            out[k] = merge_params(target[k], v, f"{path}/{k}")
        else:
            t = np.asarray(target[k])
            v = np.asarray(v)
            assert t.shape == v.shape, (
                f"shape mismatch at {path}/{k}: {t.shape} vs {v.shape}"
            )
            out[k] = v.astype(t.dtype)
    return out
