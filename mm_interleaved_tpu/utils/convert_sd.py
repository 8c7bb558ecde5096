"""Stable Diffusion checkpoint conversion (diffusers -> our flax modules).

Covers the reference's `from_pretrained` loads of the SD 2.1-base UNet and
VAE (`decoders/sd.py:52-71`).  Keyed on diffusers' state-dict naming
(`UNet2DConditionModel` with `use_linear_projection=True` as in SD2.x, and
`AutoencoderKL`); `merge_params` asserts every target shape, so naming drift
surfaces as a hard error at load time rather than silent garbage.

Helpers below synthesise the diffusers key set for OUR configs so the mapping
is testable without diffusers installed (tests/test_convert_sd.py).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):
    return np.asarray(w).T


def _conv(w):
    w = np.asarray(w)
    return np.transpose(w, (2, 3, 1, 0))


def _maybe_linear(w):
    """diffusers proj_in/out are Linear in SD2.x, 1x1 Conv in SD1.x."""
    w = np.asarray(w)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return w.T


def _norm(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _convmod(sd, key):
    out = {"kernel": _conv(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _dense(sd, key, transpose=True):
    out = {"kernel": _t(sd[f"{key}.weight"]) if transpose
           else np.asarray(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _resnet(sd, key):
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _convmod(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _convmod(sd, f"{key}.conv2"),
    }
    if f"{key}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _dense(sd, f"{key}.time_emb_proj")
    if f"{key}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _convmod(sd, f"{key}.conv_shortcut")
    return out


def _transformer(sd, key):
    tb = f"{key}.transformer_blocks.0"
    block = {
        "norm1": _norm(sd, f"{tb}.norm1"),
        "norm2": _norm(sd, f"{tb}.norm2"),
        "norm3": _norm(sd, f"{tb}.norm3"),
        "attn1_q": {"kernel": _t(sd[f"{tb}.attn1.to_q.weight"])},
        "attn1_k": {"kernel": _t(sd[f"{tb}.attn1.to_k.weight"])},
        "attn1_v": {"kernel": _t(sd[f"{tb}.attn1.to_v.weight"])},
        "attn1_out": _dense(sd, f"{tb}.attn1.to_out.0"),
        "attn2_q": {"kernel": _t(sd[f"{tb}.attn2.to_q.weight"])},
        "attn2_k": {"kernel": _t(sd[f"{tb}.attn2.to_k.weight"])},
        "attn2_v": {"kernel": _t(sd[f"{tb}.attn2.to_v.weight"])},
        "attn2_out": _dense(sd, f"{tb}.attn2.to_out.0"),
        "ff_in": _dense(sd, f"{tb}.ff.net.0.proj"),
        "ff_out": _dense(sd, f"{tb}.ff.net.2"),
    }
    return {
        "norm": _norm(sd, f"{key}.norm"),
        "proj_in": {
            "kernel": _maybe_linear(sd[f"{key}.proj_in.weight"]),
            "bias": np.asarray(sd[f"{key}.proj_in.bias"]),
        },
        "proj_out": {
            "kernel": _maybe_linear(sd[f"{key}.proj_out.weight"]),
            "bias": np.asarray(sd[f"{key}.proj_out.bias"]),
        },
        "block": block,
    }


def convert_sd_unet(sd: Dict[str, np.ndarray], n_blocks: int,
                    layers_per_block: int) -> Dict:
    """diffusers UNet2DConditionModel -> our UNet param tree."""
    p: Dict = {
        "conv_in": _convmod(sd, "conv_in"),
        "time_fc1": _dense(sd, "time_embedding.linear_1"),
        "time_fc2": _dense(sd, "time_embedding.linear_2"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _convmod(sd, "conv_out"),
        "mid_res_0": _resnet(sd, "mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "mid_block.resnets.1"),
        "mid_attn": _transformer(sd, "mid_block.attentions.0"),
    }
    for i in range(n_blocks):
        has_attn = i != n_blocks - 1
        for j in range(layers_per_block):
            p[f"down_{i}_res_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}"
            )
            if has_attn:
                p[f"down_{i}_attn_{j}"] = _transformer(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i != n_blocks - 1:
            p[f"down_{i}_downsample"] = _convmod(
                sd, f"down_blocks.{i}.downsamplers.0.conv"
            )
    for i in range(n_blocks):
        block_idx = n_blocks - 1 - i  # up block i consumes level n-1-i
        has_attn = block_idx != n_blocks - 1
        for j in range(layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if has_attn:
                p[f"up_{i}_attn_{j}"] = _transformer(
                    sd, f"up_blocks.{i}.attentions.{j}"
                )
        if i != n_blocks - 1:
            p[f"up_{i}_upsample"] = _convmod(
                sd, f"up_blocks.{i}.upsamplers.0.conv"
            )
    return p


def _vae_attn(sd, key):
    return {
        "group_norm": _norm(sd, f"{key}.group_norm"),
        "to_q": _dense(sd, f"{key}.to_q"),
        "to_k": _dense(sd, f"{key}.to_k"),
        "to_v": _dense(sd, f"{key}.to_v"),
        "to_out": _dense(sd, f"{key}.to_out.0"),
    }


def convert_sd_vae(sd: Dict[str, np.ndarray], n_blocks: int,
                   layers_per_block: int) -> Dict:
    """diffusers AutoencoderKL -> our VAE param tree."""
    enc: Dict = {
        "conv_in": _convmod(sd, "encoder.conv_in"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _convmod(sd, "encoder.conv_out"),
        "mid_res_0": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "encoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
    }
    for i in range(n_blocks):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}"
            )
        if i != n_blocks - 1:
            enc[f"down_{i}_downsample"] = _convmod(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    dec: Dict = {
        "conv_in": _convmod(sd, "decoder.conv_in"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _convmod(sd, "decoder.conv_out"),
        "mid_res_0": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "decoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
    }
    for i in range(n_blocks):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}"
            )
        if i != n_blocks - 1:
            dec[f"up_{i}_upsample"] = _convmod(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _convmod(sd, "quant_conv"),
        "post_quant_conv": _convmod(sd, "post_quant_conv"),
    }
