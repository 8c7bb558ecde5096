"""Released MM-Interleaved checkpoint -> mm_interleaved_tpu parameter tree.

Maps the *full* reference `MMInterleaved` torch state dict (the released
weights: vicuna-13b mm_decoder + CLIP ViT-Adapter visual tokenizer + SD-2.1
image decoder + all MMFS modules) onto our flax tree, replacing the
reference's `from_pretrained` assembly (models/mm_interleaved.py:60-108) and
`load_model_weights` (utils/misc.py:13-63).

Conventions (see also convert_hf.py / convert_sd.py):
  * torch Linear [out, in] -> flax kernel [in, out];
  * torch Conv2d OIHW -> flax HWIO;
  * torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, in, out) **spatially flipped** (flax's lax.conv_transpose does
    not mirror the kernel; torch's is the gradient of conv, which does);
  * fixed sin-cos pos-embed buffers (`visual_tokenizer.pos_embed`,
    `mmfs .pos_embed`, `clip_mean/std`) are recomputed on the fly by our
    modules and skipped here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .convert_hf import convert_llama, convert_mmfs, _t, _conv


class _PrefixView:
    """Read-only dict view adding a key prefix (avoids materialising
    per-tower sub-dicts of a sharded state dict)."""

    def __init__(self, sd, prefix: str):
        self._sd = sd
        self._prefix = prefix

    def __getitem__(self, key):
        return self._sd[self._prefix + key]

    def __contains__(self, key):
        return (self._prefix + key) in self._sd


def _dense(sd, key):
    return {"kernel": _t(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]),
            "bias": np.asarray(sd[f"{key}.bias"])}


def _rms(sd, key):
    return {"weight": np.asarray(sd[f"{key}.weight"])}


def _conv2d(sd, key, bias=True):
    out = {"kernel": _conv(sd[f"{key}.weight"])}
    if bias:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


def _convtranspose2d(sd, key):
    w = np.asarray(sd[f"{key}.weight"])  # (in, out, kh, kw)
    k = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]  # flip kh, kw
    return {"kernel": np.ascontiguousarray(k),
            "bias": np.asarray(sd[f"{key}.bias"])}


def convert_perceiver(sd: Dict[str, np.ndarray], prefix: str,
                      num_layers: int, cross_attention_frequency: int = 2,
                      qk_normalization: bool = False) -> Dict:
    """Reference `PerceiverResampler` (HF Blip2QFormerModel + queries,
    decoders/perceiver.py:7-30, qknorm patch blip2_qknorm_monkey_patch.py)
    -> our PerceiverResampler params."""
    q = f"{prefix}blip2qformer."
    p: Dict = {
        "queries": np.asarray(sd[f"{prefix}queries"]),
        "input_norm": _ln(sd, f"{q}layernorm"),
    }
    for i in range(num_layers):
        lp = f"{q}encoder.layer.{i}."
        layer: Dict = {}

        def mha(src):
            out = {
                "query": _dense(sd, f"{src}.attention.query"),
                "key": _dense(sd, f"{src}.attention.key"),
                "value": _dense(sd, f"{src}.attention.value"),
                "output": _dense(sd, f"{src}.output.dense"),
            }
            if qk_normalization:
                out["q_norm"] = _ln(sd, f"{src}.attention.q_norm")
                out["k_norm"] = _ln(sd, f"{src}.attention.k_norm")
            return out

        layer["attention"] = mha(f"{lp}attention")
        layer["attention_norm"] = _ln(sd, f"{lp}attention.output.LayerNorm")
        if i % cross_attention_frequency == 0:
            layer["crossattention"] = mha(f"{lp}crossattention")
            layer["crossattention_norm"] = _ln(
                sd, f"{lp}crossattention.output.LayerNorm"
            )
        layer["intermediate"] = _dense(sd, f"{lp}intermediate_query.dense")
        layer["ffn_output"] = _dense(sd, f"{lp}output_query.dense")
        layer["output_norm"] = _ln(sd, f"{lp}output_query.LayerNorm")
        p[f"layers_{i}"] = layer
    return p


def convert_ms_deform_attn(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Plain Deformable-DETR `MSDeformAttn` (encoders/vit_adapter/ops/
    modules/ms_deform_attn.py:28-131) -> our MSDeformAttn."""
    return {
        name: _dense(sd, f"{prefix}{name}")
        for name in ("sampling_offsets", "attention_weights",
                     "value_proj", "output_proj")
    }


def _conv_ln_relu(sd, conv_key, ln_key):
    return {
        "Conv_0": _conv2d(sd, conv_key, bias=False),
        "LayerNorm_0": _ln(sd, ln_key),
    }


def convert_spm(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """SpatialPriorModule (adapter_modules.py:267-328): stem Sequential
    indices 0/3/6 = convs, 1/4/7 = LayerNorms; conv2..4 = (conv, LN);
    fc1..4 = 1x1 convs."""
    p: Dict = {}
    stem = [(0, 1), (3, 4), (6, 7)]
    for i, (ci, li) in enumerate(stem):
        p[f"_ConvLNRelu_{i}"] = _conv_ln_relu(
            sd, f"{prefix}stem.{ci}", f"{prefix}stem.{li}"
        )
    for i, name in enumerate(("conv2", "conv3", "conv4"), start=3):
        p[f"_ConvLNRelu_{i}"] = _conv_ln_relu(
            sd, f"{prefix}{name}.0", f"{prefix}{name}.1"
        )
    for name in ("fc1", "fc2", "fc3", "fc4"):
        p[name] = _conv2d(sd, f"{prefix}{name}")
    return p


def _injector(sd, prefix):
    return {
        "query_norm": _ln(sd, f"{prefix}query_norm"),
        "feat_norm": _ln(sd, f"{prefix}feat_norm"),
        "attn": convert_ms_deform_attn(sd, f"{prefix}attn."),
        "gamma": np.asarray(sd[f"{prefix}gamma"]),
    }


def _extractor(sd, prefix):
    return {
        "query_norm": _ln(sd, f"{prefix}query_norm"),
        "feat_norm": _ln(sd, f"{prefix}feat_norm"),
        "attn": convert_ms_deform_attn(sd, f"{prefix}attn."),
        "ffn_norm": _ln(sd, f"{prefix}ffn_norm"),
        "ffn": {
            "fc1": _dense(sd, f"{prefix}ffn.fc1"),
            "dwconv": _conv2d(sd, f"{prefix}ffn.dwconv.dwconv"),
            "fc2": _dense(sd, f"{prefix}ffn.fc2"),
        },
    }


def convert_vit_adapter(sd: Dict[str, np.ndarray], prefix: str,
                        num_vit_layers: int = 24,
                        num_interactions: int = 4,
                        extra_extractors: int = 2) -> Dict:
    """`CLIPVisionTransformerAdapter` (vit_adapter_hf.py:37-171) -> our
    CLIPViTAdapter params (ViT core + SPM + interaction blocks + up)."""
    from .convert_hf import convert_clip_vit

    p = convert_clip_vit(sd, num_vit_layers, prefix=prefix)
    # convert_clip_vit nests encoder layers under layers_N already
    p["adapter_level_embed"] = np.asarray(sd[f"{prefix}adapter_level_embed"])
    p["adapter_spm"] = convert_spm(sd, f"{prefix}adapter_spm.")
    for gi in range(num_interactions):
        ip = f"{prefix}adapter_interactions.{gi}."
        p[f"interactions_{gi}_injector"] = _injector(sd, f"{ip}injector.")
        p[f"interactions_{gi}_extractor"] = _extractor(sd, f"{ip}extractor.")
        if gi == num_interactions - 1:
            for ei in range(extra_extractors):
                p[f"interactions_{gi}_extra_extractor_{ei}"] = _extractor(
                    sd, f"{ip}extra_extractors.{ei}."
                )
    p["adapter_up"] = _convtranspose2d(sd, f"{prefix}adapter_up")
    return p


def convert_visual_tokenizer(sd: Dict[str, np.ndarray],
                             prefix: str = "visual_tokenizer.",
                             num_vit_layers: int = 24,
                             num_interactions: int = 4,
                             extra_extractors: int = 2,
                             perceiver_layers: int = 12,
                             qk_normalization: bool = True) -> Dict:
    """Reference `VisualTokenizer` (encoders/visual_tokenizer.py:11-101)."""
    return {
        "encoder": convert_vit_adapter(
            sd, f"{prefix}encoder.vision_model.", num_vit_layers,
            num_interactions, extra_extractors,
        ),
        "pos_proj": _dense(sd, f"{prefix}pos_proj"),
        "pos_ln": _ln(sd, f"{prefix}pos_ln"),
        "post_ln": _ln(sd, f"{prefix}post_ln"),
        "perceiver_resampler": convert_perceiver(
            sd, f"{prefix}perceiver_resampler.", perceiver_layers,
            cross_attention_frequency=2, qk_normalization=qk_normalization,
        ),
        "proj": _dense(sd, f"{prefix}proj"),
    }


def convert_mmfs_block(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """UNet-side MMFSBlock (decoders/sd_mmfs.py:44-151) -> our MMFSBlock
    (query_norm/feat_norm/mmfs/conv; fixed pos_embed recomputed)."""
    return {
        "query_norm": _ln(sd, f"{prefix}query_norm"),
        "feat_norm": _ln(sd, f"{prefix}feat_norm"),
        "mmfs": convert_mmfs(sd, f"{prefix}mmfs."),
        "conv": _conv2d(sd, f"{prefix}conv"),
    }


def convert_mmfs_net(sd: Dict[str, np.ndarray], prefix: str,
                     num_down_blocks: int = 13) -> Dict:
    """MMFSNet (sd_mmfs.py:154-272): one block per UNet down residual + mid."""
    p: Dict = {}
    for i in range(num_down_blocks):
        p[f"down_blocks_{i}"] = convert_mmfs_block(
            sd, f"{prefix}mmfs_down_blocks.{i}."
        )
    p["mid_block"] = convert_mmfs_block(sd, f"{prefix}mmfs_mid_block.")
    return p


def convert_image_decoder(sd: Dict[str, np.ndarray],
                          prefix: str = "image_decoder.",
                          n_unet_blocks: int = 4,
                          unet_layers_per_block: int = 2,
                          n_vae_blocks: int = 4,
                          vae_layers_per_block: int = 2,
                          perceiver_layers: int = 1) -> Dict:
    """Reference `ImageDecoder` (decoders/decoder_image.py:9-156) with the
    SD wrapper's unet/vae/mmfs_module (decoders/sd.py:24-120)."""
    from .convert_sd import convert_sd_unet, convert_sd_vae

    dec = f"{prefix}decoder."
    unet_sd = _PrefixView(sd, f"{dec}unet.")
    vae_sd = _PrefixView(sd, f"{dec}vae.")
    unet = convert_sd_unet(unet_sd, n_unet_blocks, unet_layers_per_block)
    n_down = 1 + n_unet_blocks * unet_layers_per_block + (n_unet_blocks - 1)
    unet["mmfs_net"] = convert_mmfs_net(
        sd, f"{dec}mmfs_module.", num_down_blocks=n_down
    )
    return {
        "perceiver_resampler": convert_perceiver(
            sd, f"{prefix}perceiver_resampler.", perceiver_layers,
            cross_attention_frequency=1,
        ),
        "neg_prompt_embeds": np.asarray(sd[f"{prefix}neg_prompt_embeds"]),
        "unet": unet,
        "vae": convert_sd_vae(vae_sd, n_vae_blocks, vae_layers_per_block),
    }


def convert_mm_interleaved(sd: Dict[str, np.ndarray], model_cfg) -> Dict:
    """Full reference `MMInterleaved` state dict -> our full param tree.

    ``model_cfg`` is our MMInterleavedConfig (supplies layer counts etc.).
    Returns a partial tree suitable for `convert_hf.merge_params` against an
    initialised variables['params'].
    """
    c = model_cfg
    mm_decoder = convert_llama(
        sd, c.llm.num_hidden_layers, prefix="mm_decoder.model."
    )
    if c.llm.scan_layers:
        from ..models.llama import stack_llama_layers

        mm_decoder = stack_llama_layers(
            mm_decoder, c.llm.num_hidden_layers,
            c.llm.cross_attention_frequency,
        )
    p: Dict = {
        "mm_decoder": mm_decoder,
        "soi_token": np.asarray(sd["soi_token"]).reshape(-1),
        "context_feat_proj": _dense(sd, "context_feat_proj"),
        "visual_tokenizer": convert_visual_tokenizer(
            sd,
            num_vit_layers=c.visual.encoder.vit.num_hidden_layers,
            num_interactions=c.visual.encoder.num_interactions,
            extra_extractors=c.visual.encoder.extra_extractors,
            perceiver_layers=c.visual.perceiver.num_hidden_layers,
            qk_normalization=c.visual.perceiver.qk_normalization,
        ),
        "text_decoder": {
            "head": _dense(sd, "text_decoder.head"),
            "head_new": _dense(sd, "text_decoder.head_new"),
        },
    }
    if c.image_decoder is not None and "image_decoder.neg_prompt_embeds" in sd:
        p["image_decoder"] = convert_image_decoder(
            sd,
            n_unet_blocks=len(c.image_decoder.unet.block_out_channels),
            unet_layers_per_block=c.image_decoder.unet.layers_per_block,
            n_vae_blocks=len(c.image_decoder.vae.block_out_channels),
            vae_layers_per_block=c.image_decoder.vae.layers_per_block,
            perceiver_layers=c.image_decoder.perceiver.num_hidden_layers,
        )
    return p
