#!/usr/bin/env python
"""Assemble a runnable orbax checkpoint from real pretrained weights.

Replaces the reference's `from_pretrained` assembly
(`models/mm_interleaved.py:60-108`) + `load_model_weights`
(`utils/misc.py:13-63`).  Two modes:

1) **Released MM-Interleaved checkpoint** (full model state dict):
     python scripts/convert_checkpoint.py --preset flagship \
         --ref-checkpoint /path/to/mm_interleaved_ckpt/ --out OUTPUT/ckpt
   Maps every reference parameter (LLM+MMFS, ViT-Adapter, perceivers,
   TextDecoder, SD UNet/VAE, MMFSNet, soi_token, ...) onto our tree via
   `utils/convert_ref.convert_mm_interleaved`.

2) **Tower assembly** (fresh pretrain init, like the reference's day-0):
     python scripts/convert_checkpoint.py --preset flagship \
         --llm assets/vicuna-13b --clip assets/clip-vit-large-patch14 \
         --sd assets/stable-diffusion-2-1-base --out OUTPUT/ckpt
   Loads each tower's HF checkpoint; adapter/MMFS/perceiver params keep
   their (random/zero) init, exactly as the reference trains them from
   scratch (vit_adapter_hf.py:243-252, mm_interleaved.py:103-108).

Output: an orbax checkpoint directory restorable by
`utils/checkpoint.load_variables` and the `--load_from` flag of the CLIs.

The full variable tree is materialised on host (fp32): the 13B flagship
needs a large-RAM host (~80 GB); tiny/small/base presets run anywhere.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _LazySafetensors:
    """Dict-like view over sharded .safetensors files that reads one tensor
    at a time (mmap-backed).  At 13B the merged eager dict alone is ~26 GB;
    lazy reads keep converter peak RAM at (init tree + converted updates)."""

    def __init__(self, files):
        from safetensors import safe_open

        self._handles = [safe_open(f, framework="np") for f in files]
        self._where = {}
        for h in self._handles:
            for k in h.keys():
                self._where[k] = h
        self._extra = {}

    def __getitem__(self, key):
        if key in self._extra:
            return self._extra[key]
        return self._where[key].get_tensor(key)

    def __setitem__(self, key, value):
        self._extra[key] = value

    def __contains__(self, key):
        return key in self._where or key in self._extra

    def __iter__(self):
        yield from self._where
        yield from self._extra

    def __len__(self):
        return len(self._where) + len(self._extra)

    def keys(self):
        return list(self)


def load_torch_state_dict(path: str):
    """Load a torch checkpoint: a file or a directory of .safetensors /
    .bin / .pth shards (merged).  Safetensors shards come back as a lazy
    per-tensor view; torch pickles load eagerly."""
    files = []
    if os.path.isdir(path):
        for pat in ("*.safetensors", "*.bin", "*.pth", "*.pt"):
            files += sorted(glob.glob(os.path.join(path, pat)))
        # HF dirs keep training_args.bin etc. around — filter obvious non-weights
        files = [f for f in files if "training_args" not in f]
    else:
        files = [path]
    assert files, f"no checkpoint files under {path}"
    if all(f.endswith(".safetensors") for f in files):
        return _LazySafetensors(files)
    sd = {}
    for f in files:
        if f.endswith(".safetensors"):
            from safetensors.numpy import load_file

            part = load_file(f)
            sd.update(part)
        else:
            import torch

            part = torch.load(f, map_location="cpu", weights_only=True)
            if "state_dict" in part and isinstance(part["state_dict"], dict):
                part = part["state_dict"]
            sd.update({
                k: v.float().numpy() if v.dtype == torch.bfloat16
                else v.numpy()
                for k, v in part.items()
                if hasattr(v, "numpy")
            })
    return sd


class _StrippedView:
    """Lazy `{key[len(prefix):]: value}` view (keeps _LazySafetensors lazy)."""

    def __init__(self, sd, prefix):
        self._sd = sd
        self._prefix = prefix

    def __getitem__(self, key):
        return self._sd[self._prefix + key]

    def __contains__(self, key):
        return (self._prefix + key) in self._sd

    def __iter__(self):
        n = len(self._prefix)
        for k in self._sd:
            yield k[n:]

    def keys(self):
        return list(self)


def _strip_prefix(sd, prefixes=("model.", "module.")):
    """Peel one wrapping prefix if every key carries it."""
    for p in prefixes:
        if len(sd.keys()) and all(k.startswith(p) for k in sd):
            return _StrippedView(sd, p)
    return sd


def _pad_rows(w: np.ndarray, rows: int) -> np.ndarray:
    """Pad an embedding matrix to `rows` rows with the mean embedding
    (HF `resize_token_embeddings` semantics, mm_interleaved.py:73)."""
    if w.shape[0] >= rows:
        return w[:rows]
    mean = w.mean(axis=0, keepdims=True)
    pad = np.repeat(mean, rows - w.shape[0], axis=0)
    return np.concatenate([w, pad], axis=0)


def build_updates(args, cfg) -> dict:
    from mm_interleaved_tpu.utils.convert_hf import (
        convert_clip_vit,
        convert_llama,
        convert_text_decoder,
    )
    from mm_interleaved_tpu.utils.convert_ref import convert_mm_interleaved
    from mm_interleaved_tpu.utils.convert_sd import (
        convert_sd_unet,
        convert_sd_vae,
    )

    if args.ref_checkpoint:
        sd = load_torch_state_dict(args.ref_checkpoint)
        sd = _strip_prefix(sd)
        return convert_mm_interleaved(sd, cfg)

    updates: dict = {}
    if args.llm:
        sd = load_torch_state_dict(args.llm)
        # keys may or may not carry the LlamaForCausalLM "model." prefix
        prefix = "model." if any(k.startswith("model.") for k in sd) else ""
        llm = convert_llama(sd, cfg.llm.num_hidden_layers, prefix=prefix)
        llm["embed_tokens"]["embedding"] = _pad_rows(
            llm["embed_tokens"]["embedding"], cfg.llm.vocab_size
        )
        if cfg.llm.scan_layers:
            from mm_interleaved_tpu.models.llama import stack_llama_layers

            llm = stack_llama_layers(
                llm, cfg.llm.num_hidden_layers,
                cfg.llm.cross_attention_frequency,
            )
        updates["mm_decoder"] = llm
        lm_head_key = "lm_head.weight"
        if lm_head_key in sd:
            updates["text_decoder"] = convert_text_decoder(
                np.asarray(sd[lm_head_key]),
                vocab_size=cfg.llm.vocab_size,
                orig_vocab_size=cfg.orig_vocab_size,
            )
    if args.clip:
        sd = load_torch_state_dict(args.clip)
        vt = convert_clip_vit(
            sd, cfg.visual.encoder.vit.num_hidden_layers,
            prefix="vision_model." if any(
                k.startswith("vision_model.") for k in sd) else "",
        )
        updates["visual_tokenizer"] = {"encoder": vt}
    if args.sd:
        unet_sd = load_torch_state_dict(os.path.join(args.sd, "unet"))
        vae_sd = load_torch_state_dict(os.path.join(args.sd, "vae"))
        updates["image_decoder"] = {
            "unet": convert_sd_unet(
                unet_sd,
                len(cfg.image_decoder.unet.block_out_channels),
                cfg.image_decoder.unet.layers_per_block,
            ),
            "vae": convert_sd_vae(
                vae_sd,
                len(cfg.image_decoder.vae.block_out_channels),
                cfg.image_decoder.vae.layers_per_block,
            ),
        }
    assert updates, "nothing to convert: pass --ref-checkpoint or towers"
    return updates


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="flagship",
                    choices=("tiny", "small", "base", "flagship"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--ref-checkpoint", default=None,
                    help="released MM-Interleaved checkpoint (file or dir)")
    ap.add_argument("--llm", default=None, help="HF LLaMA/vicuna dir")
    ap.add_argument("--clip", default=None, help="HF CLIPVisionModel dir")
    ap.add_argument("--sd", default=None,
                    help="SD dir with unet/ + vae/ subfolders")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="stored param dtype.  bfloat16 halves host RAM and "
                    "checkpoint size — the serving path runs bf16 anyway; "
                    "training warm-starts upcast to fp32 masters at load")
    args = ap.parse_args(argv)

    import jax

    # host-side tool: the full tree materialises in host RAM (13B does not
    # fit one chip's HBM); force the CPU backend regardless of platform pins
    jax.config.update("jax_platforms", "cpu")

    from mm_interleaved_tpu import configs
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
    from mm_interleaved_tpu.utils.checkpoint import init_variables
    from mm_interleaved_tpu.utils.convert_hf import merge_params

    cfg = getattr(configs, f"{args.preset}_config")()
    model = MMInterleaved(cfg)
    print(f"initialising {args.preset} variables ...", flush=True)
    variables = init_variables(model, cfg, seed=args.seed)
    if args.dtype != "float32":
        import jax.numpy as jnp

        dt = jnp.dtype(args.dtype)
        variables = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(dt)
            if np.asarray(x).dtype == np.float32 else np.asarray(x),
            variables,
        )
    updates = build_updates(args, cfg)
    n_leaves = len(jax.tree_util.tree_leaves(updates))
    print(f"merging {n_leaves} converted tensors ...", flush=True)
    params = merge_params(
        jax.tree_util.tree_map(np.asarray, variables["params"]), updates
    )
    variables = {**variables, "params": params}

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, dict(params=variables, opt_state=None, step=0),
               force=True)
    ckptr.wait_until_finished()
    print(f"saved orbax checkpoint to {out}")


if __name__ == "__main__":
    main()
