"""Zero-shot benchmark evaluation entry point.

Mirrors the reference `evaluate.py:61-98`: loop the eval datasets listed in
the config through the evaluator; metrics append to
``<output_dir>/eval_metrics.jsonl``.

Usage:
    python evaluate.py --config configs/eval.yaml [--checkpoint CKPT]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


# Reference per-task generation defaults, applied when the dataset stanza
# does not override them (ImageTextPairCollator collator.py:199-205,
# VQACollator collator.py:543-549; the model maps max_length ->
# max_new_tokens at the generate call, mm_interleaved.py:647).
REF_TASK_DEFAULTS = {
    "generate_texts": dict(max_new_tokens=20, min_new_tokens=8,
                           length_penalty=1.0, num_beams=5, top_p=0.9),
    "generate_vqa": dict(max_new_tokens=10, min_new_tokens=0,
                         length_penalty=0.0, num_beams=3, top_p=1.0),
    # release t2i protocol (mm_eval.yaml:142-145); num_validation_images
    # defaults to 1 unless the stanza raises it
    "generate_images": dict(num_inference_steps=250, guidance_scale=3.5,
                            num_candidates=1),
}

# reference generation_kwargs key -> EvalConfig field
_REF_KEY_ALIASES = {
    "max_length": "max_new_tokens",
    "min_length": "min_new_tokens",
    "num_validation_images": "num_candidates",
}


def resolve_eval_config(base_cfg, mode, ds_cfg, explicit_global=()):
    """Per-dataset EvalConfig: reference task defaults, then keys the user
    set explicitly in the global ``evaluation:`` section, then the dataset
    stanza's ``generation_kwargs`` (reference semantics: collator defaults
    overridden per-dataset, collator.py:206,369-371)."""
    import dataclasses

    values = {}
    for k, v in REF_TASK_DEFAULTS.get(mode, {}).items():
        if k not in explicit_global:
            values[k] = v
    for k, v in (ds_cfg.get("generation_kwargs") or {}).items():
        values[_REF_KEY_ALIASES.get(k, k)] = v
    known = {f.name for f in dataclasses.fields(type(base_cfg))}
    unknown = set(values) - known
    if unknown:
        raise ValueError(f"unknown generation_kwargs: {sorted(unknown)}")
    return dataclasses.replace(base_cfg, **values)


def build_eval_dataset(ds_cfg, model_cfg, tokenizer):
    from mm_interleaved_tpu.data.collators import (
        ImageTextPairCollator,
        VQACollator,
    )
    from mm_interleaved_tpu.data.datasets import (
        CocoCaptionDataset,
        ImageTextJsonlDataset,
        VQADataset,
    )
    from mm_interleaved_tpu.data.transforms import create_transform

    enc_res = model_cfg.visual.encoder.vit.image_size
    transform = create_transform(
        aug_type=ds_cfg.get("transform", "numpy"), resolution=enc_res,
    )
    name = ds_cfg["type"]
    mode = ds_cfg.get("collate_mode", "generate_texts")
    if name == "coco_caption":
        ds = CocoCaptionDataset(
            ds_cfg["annt_file"], ds_cfg["data_root"], transform,
            total_length=ds_cfg.get("total_length"),
            phase=ds_cfg.get("phase", "test"),
        )
        coll = ImageTextPairCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 256), mode=mode,
            instr_prompts=ds_cfg.get("instr_prompts"),
        )
    elif name in ("vqa", "vizwiz_vqa"):
        if name == "vizwiz_vqa":
            from mm_interleaved_tpu.data.datasets import VizWizVQADataset

            ds = VizWizVQADataset(
                ds_cfg["annt_file"], ds_cfg["data_root"], transform,
                total_length=ds_cfg.get("total_length"),
            )
        else:
            ds = VQADataset(
                ds_cfg["questions_file"], ds_cfg.get("annotations_file"),
                ds_cfg["data_root"], transform,
                image_name_format=ds_cfg.get("image_name_format"),
                total_length=ds_cfg.get("total_length"),
            )
        coll = VQACollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 320),
            instr_prompts=ds_cfg.get("instr_prompts"),
        )
        mode = "generate_vqa"
    elif name == "image_text_jsonl":
        ds = ImageTextJsonlDataset(
            ds_cfg["annt_file"], ds_cfg["data_root"], transform,
            total_length=ds_cfg.get("total_length"),
        )
        coll = ImageTextPairCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 256), mode=mode,
        )
    elif name == "visdial":
        from mm_interleaved_tpu.data.collators_extra import VisDialCollator
        from mm_interleaved_tpu.data.datasets_extra import VisDialDenseDataset

        ds = VisDialDenseDataset(
            ds_cfg["dialogs_file"], ds_cfg["dense_file"],
            ds_cfg["data_root"], transform,
            total_length=ds_cfg.get("total_length"),
        )
        coll = VisDialCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            ctx_len=ds_cfg.get("seq_len", 512),
        )
        mode = "generate_scores"
    elif name == "grounding":
        from mm_interleaved_tpu.data.collators_extra import GroundingCollator
        from mm_interleaved_tpu.data.datasets_extra import GroundingDataset

        ds = GroundingDataset(
            ds_cfg["annt_file"], ds_cfg["data_root"], transform,
            total_length=ds_cfg.get("total_length"),
        )
        coll = GroundingCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 256),
        )
        mode = "generate_grounding"
    elif name == "story":
        from mm_interleaved_tpu.data.collators_extra import StoryCollator
        from mm_interleaved_tpu.data.datasets_extra import StoryDataset

        ds = StoryDataset(
            ds_cfg["annt_file"], ds_cfg["data_root"], transform,
            task_prefix=ds_cfg.get("task_prefix", ""),
            total_length=ds_cfg.get("total_length"),
        )
        coll = StoryCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 1024),
            max_num_images=model_cfg.max_num_images,
        )
        mode = "generate_storytelling"
    elif name in ("nocaps", "flickr30k"):
        from mm_interleaved_tpu.data.datasets_bench import (
            Flickr30KDataset,
            NoCapsDataset,
        )

        cls = NoCapsDataset if name == "nocaps" else Flickr30KDataset
        ds = cls(
            ds_cfg["annt_file"], ds_cfg["data_root"], transform,
            total_length=ds_cfg.get("total_length"),
        )
        coll = ImageTextPairCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 256), mode="generate_texts",
            instr_prompts=ds_cfg.get("instr_prompts"),
        )
        mode = "generate_texts"
    elif name == "image2paragraph":
        from mm_interleaved_tpu.data.datasets_bench import (
            Image2ParagraphDataset,
        )

        ds = Image2ParagraphDataset(
            ds_cfg["annt_root"], ds_cfg["data_root"], transform,
            phase=ds_cfg.get("phase", "test"),
            total_length=ds_cfg.get("total_length"),
        )
        coll = ImageTextPairCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 256), mode="generate_texts",
            instr_prompts=ds_cfg.get("instr_prompts"),
        )
        mode = "generate_texts"
    elif name == "lncoco":
        from mm_interleaved_tpu.data.datasets_bench import LNCOCODataset

        ds = LNCOCODataset(
            ds_cfg["annt_root"], ds_cfg["data_root"], transform,
            total_length=ds_cfg.get("total_length"),
            image_only=ds_cfg.get("image_only", False),
        )
        coll = ImageTextPairCollator(
            tokenizer, tokenizer.special,
            num_img_token=model_cfg.num_img_token,
            seq_len=ds_cfg.get("seq_len", 256), mode="generate_images",
        )
        mode = "generate_images"
    elif name in ("vist", "pororo", "flintstones", "ade20k"):
        from mm_interleaved_tpu.data import datasets_bench as B
        from mm_interleaved_tpu.data.collators_extra import (
            MultiImageCollator,
            StoryCollator,
        )

        collate_mode = ds_cfg.get("collate_mode", "generate_images")
        if name == "vist":
            ds = B.VISTDataset(
                ds_cfg["data_root"], ds_cfg["annt_root"], transform,
                phase=ds_cfg.get("phase", "val"),
                collate_mode=collate_mode,
                round_range=ds_cfg.get("round_range", "last"),
                context_type=ds_cfg.get("context_type", "multi_modal"),
                total_length=ds_cfg.get("total_length"),
            )
        elif name == "pororo":
            ds = B.PororoDataset(
                ds_cfg["data_root"], ds_cfg["annt_root"], transform,
                phase=ds_cfg.get("phase", "test"),
                context_type=ds_cfg.get("context_type", "multi_modal"),
                total_length=ds_cfg.get("total_length"),
            )
        elif name == "flintstones":
            ds = B.FlintStonesDataset(
                ds_cfg["data_root"], ds_cfg["annt_root"], transform,
                phase=ds_cfg.get("phase", "test"),
                context_type=ds_cfg.get("context_type", "multi_modal"),
                total_length=ds_cfg.get("total_length"),
            )
        else:  # ade20k
            ds = B.ADE20kDataset(
                ds_cfg["data_root"], ds_cfg["annt_root"], transform,
                phase=ds_cfg.get("phase", "validation"),
                total_length=ds_cfg.get("total_length"),
            )
        if name == "vist" and collate_mode == "generate_texts":
            coll = MultiImageCollator(
                tokenizer, tokenizer.special,
                num_img_token=model_cfg.num_img_token,
                seq_len=ds_cfg.get("seq_len", 1024),
                max_num_images=model_cfg.max_num_images,
                mode="generate",
            )
            mode = "generate_texts"
        else:
            coll = StoryCollator(
                tokenizer, tokenizer.special,
                num_img_token=model_cfg.num_img_token,
                seq_len=ds_cfg.get("seq_len", 1024),
                max_num_images=model_cfg.max_num_images,
            )
            mode = ("generate_segm" if name == "ade20k"
                    else "generate_storytelling")
    else:
        raise ValueError(name)
    return ds, coll, mode


def _maybe_clip_text_features(ev_cfg, model_cfg):
    """CLIP text-feature fn for the t2i rerank, from an HF CLIP dir given as
    ``evaluation.clip_text_path`` (tokenizer files + torch state dict, the
    same ``openai/clip-vit-large-patch14`` dir `scripts/download_assets.py`
    fetches). Returns None when unset — rerank then degrades to candidate 0
    exactly like a missing rerank model in the reference."""
    path = ev_cfg.get("clip_text_path")
    if not path:
        return None
    import jax.numpy as jnp
    from transformers import CLIPTokenizer

    from mm_interleaved_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextModel,
        convert_clip_text,
    )
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from convert_checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(path)
    num_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if ".encoder.layers." in k
    )
    hidden = sd["text_model.embeddings.token_embedding.weight"].shape[1]
    cfg = CLIPTextConfig(
        hidden_size=hidden, intermediate_size=4 * hidden,
        num_hidden_layers=num_layers,
        num_attention_heads=hidden // 64,
        projection_dim=sd["text_projection.weight"].shape[0]
        if "text_projection.weight" in sd else hidden,
    )
    model = CLIPTextModel(cfg)
    params = convert_clip_text(sd, num_layers=num_layers)
    tok = CLIPTokenizer.from_pretrained(path)

    def text_features(captions):
        ids = tok(
            list(captions), padding="max_length", truncation=True,
            max_length=cfg.max_position_embeddings, return_tensors="np",
        )["input_ids"]
        return np.asarray(
            model.apply({"params": params}, jnp.asarray(ids))
        )

    return text_features


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output_dir", default=None)
    args = ap.parse_args()

    import jax

    from mm_interleaved_tpu.data.datasets import iterate_dataset
    from mm_interleaved_tpu.data.tokenizer import load_tokenizer
    from mm_interleaved_tpu.engine.evaluator import EvalConfig, Evaluator
    from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
    from mm_interleaved_tpu.utils.checkpoint import load_variables
    from mm_interleaved_tpu.utils.config import build_model_config, load_config

    cfg = load_config(args.config)
    output_dir = args.output_dir or cfg.get("output_dir", "OUTPUT/eval")
    model_cfg = build_model_config(cfg["model"])
    model = MMInterleaved(model_cfg)
    tokenizer = load_tokenizer(
        cfg.get("data", {}).get("tokenizer_path"),
        vocab_size=model_cfg.llm.vocab_size,
    )
    variables = load_variables(model, model_cfg, args.checkpoint)

    ev_cfg = cfg.get("evaluation", {})
    # mesh-aware runtime: a `mesh:` stanza (same schema as train.py's,
    # e.g. {fsdp: 4, tensor: 2}) runs the whole eval model-sharded — the
    # 13B flagship cannot decode on one chip.  `evaluation.quantize: int8`
    # additionally switches the LLM to weight-only int8 decode.
    from mm_interleaved_tpu.parallel.inference import (
        build_generation_runtime,
    )

    runtime = build_generation_runtime(
        model, variables, cfg.get("mesh"),
        quantize=ev_cfg.get("quantize"),
    )
    base_eval_cfg = EvalConfig(
        batch_size=ev_cfg.get("batch_size", 8),
        max_new_tokens=ev_cfg.get("max_new_tokens", 30),
        num_beams=ev_cfg.get("num_beams", 1),
        repetition_penalty=ev_cfg.get("repetition_penalty", 1.0),
        length_penalty=ev_cfg.get("length_penalty", 1.0),
        top_p=ev_cfg.get("top_p", 0.9),
        num_inference_steps=ev_cfg.get("num_inference_steps", 30),
        guidance_scale=ev_cfg.get("guidance_scale", 3.5),
        num_candidates=ev_cfg.get("num_candidates", 1),
        output_dir=output_dir,
        max_batches=ev_cfg.get("max_batches"),
    )
    evaluator = Evaluator(model, variables, tokenizer, base_eval_cfg,
                          runtime=runtime)

    # CLIP-feature extractor for FID / rerank / i2i similarity, built from
    # the flagship's own visual tokenizer ViT (CLIP-FID variant); an
    # InceptionV3 orbax checkpoint can be pointed to via evaluation.fid
    feature_fn = None
    if ev_cfg.get("clip_fid", False):
        from mm_interleaved_tpu.utils.fid import CLIPViTFeatures

        vit_params = variables["params"]["visual_tokenizer"]["encoder"]
        feature_fn = CLIPViTFeatures(
            model_cfg.visual.encoder.vit, {"params": vit_params},
        )

    for ds_cfg in cfg.get("data", {}).get("val", []):
        ds, coll, mode = build_eval_dataset(ds_cfg, model_cfg, tokenizer)
        evaluator.cfg = resolve_eval_config(
            base_eval_cfg, mode, ds_cfg, explicit_global=set(ev_cfg),
        )
        batches = iterate_dataset(
            ds, evaluator.cfg.batch_size, coll,
        )
        name = ds_cfg.get("dataset_name", ds_cfg["type"])
        if mode == "generate_texts":
            result = evaluator.evaluate_caption(
                batches, ds.references(), dataset_name=name
            )
        elif mode == "generate_vqa":
            result = evaluator.evaluate_vqa(batches, dataset_name=name)
        elif mode == "generate_images":
            # 8-candidate CLIP rerank (mm_eval.yaml:136 rerank_by_clip)
            # needs image features; text side falls back to the caption
            # tokens' visual-tokenizer features only when a real CLIP text
            # tower is loaded, so rerank activates iff both parts exist
            rerank_fn = None
            if ds_cfg.get("rerank_by_clip") and feature_fn is not None:
                from mm_interleaved_tpu.utils.fid import make_clip_rerank_fn

                text_fn = _maybe_clip_text_features(ev_cfg, model_cfg)
                if text_fn is not None:
                    rerank_fn = make_clip_rerank_fn(feature_fn, text_fn)
            result = evaluator.evaluate_t2i(
                batches, dataset_name=name, feature_fn=feature_fn,
                rerank_fn=rerank_fn,
            )
        elif mode == "generate_scores":
            result = evaluator.evaluate_ranking(batches, dataset_name=name)
        elif mode == "generate_grounding":
            result = evaluator.evaluate_grounding(batches, dataset_name=name)
        elif mode == "generate_storytelling":
            result = evaluator.evaluate_storytelling(
                batches, dataset_name=name, feature_fn=feature_fn,
            )
        elif mode == "generate_segm":
            from PIL import Image as PILImage

            gt = {
                i: np.asarray(PILImage.open(ds.gt_id_to_path(i)))
                for i in range(len(ds))
            }
            result = evaluator.evaluate_segm2img(
                batches, gt, segment_fn=None, dataset_name=name,
            )
        else:
            raise ValueError(mode)
        print(f"[{name}] {result}")


if __name__ == "__main__":
    main()
