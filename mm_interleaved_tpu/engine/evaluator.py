"""Evaluation harness: per-dataset generate-mode routing + metric computation.

Re-design of the reference `LMMTrainer.evaluation_loop` + inner loops
(`engine/lmm_trainer.py:1317-2120`): each eval dataset declares a
``collate_mode`` that routes to the right generation loop —

  * ``generate_texts``  -> caption decode -> CIDEr / BLEU-4
  * ``generate_vqa``    -> short-answer decode -> VQA accuracy
  * ``generate_images`` -> SD sampling -> images saved (FID downstream)

The reference's filesystem-JSON multi-rank gather (caption_collect.py) is
replaced by `multihost_utils.process_allgather` when running multi-host;
results append to ``eval_metrics.jsonl`` exactly like evaluate.py:46-56.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..generation.text import TextGenerationConfig
from ..utils import metrics as M


@dataclasses.dataclass
class EvalConfig:
    batch_size: int = 8
    max_new_tokens: int = 30
    min_new_tokens: int = 8
    # reference generate_texts defaults num_beams=5 (mm_interleaved.py:612);
    # 1 = greedy for fast smoke runs
    num_beams: int = 1
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    top_p: float = 0.9
    num_inference_steps: int = 30
    guidance_scale: float = 3.5
    # 8-candidate CLIP rerank in the release t2i protocol
    # (mm_eval.yaml:145 num_validation_images)
    num_candidates: int = 1
    output_dir: Optional[str] = None
    max_batches: Optional[int] = None


class Evaluator:
    def __init__(self, model, variables, tokenizer, cfg: EvalConfig,
                 runtime=None):
        from ..parallel.inference import LocalGenerator

        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.cfg = cfg
        # all generation goes through the runtime seam; a ShardedGenerator
        # here runs the whole eval mesh-sharded (13B flagship path)
        self.runtime = runtime or LocalGenerator(model, variables)

    # ------------------------------------------------------------------ #

    def _gen_cfg(self, **overrides) -> TextGenerationConfig:
        sp = self.model.cfg.special
        base = dict(
            max_new_tokens=self.cfg.max_new_tokens,
            # never let a small max_new_tokens invert the min/max ordering
            min_new_tokens=min(self.cfg.min_new_tokens,
                               self.cfg.max_new_tokens),
            num_beams=self.cfg.num_beams,
            repetition_penalty=self.cfg.repetition_penalty,
            length_penalty=self.cfg.length_penalty,
            top_p=self.cfg.top_p,
            eos_token_ids=(sp.eos_token_id, sp.soi_token_id),
            pad_token_id=sp.pad_token_id,
        )
        base.update(overrides)
        return TextGenerationConfig(**base)

    def _decode_batch(self, batch, gen_cfg) -> List[str]:
        tokens = self.runtime.generate_texts(
            batch["text_ids"], batch["image_tensors"],
            batch["num_image_per_seq"], batch["attention_mask"],
            gen_cfg,
        )
        sp = self.model.cfg.special
        out = []
        for row in np.asarray(tokens):
            row = [int(t) for t in row
                   if t not in (sp.pad_token_id, sp.eos_token_id,
                                sp.soi_token_id)]
            out.append(self.tokenizer.decode(row))
        return out

    # ------------------------------------------------------------------ #

    def evaluate_caption(self, batches, references: Dict[int, List[str]],
                         dataset_name: str = "caption") -> Dict[str, float]:
        preds: Dict[int, str] = {}
        gen_cfg = self._gen_cfg()
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            texts = self._decode_batch(batch, gen_cfg)
            for (index, _), text in zip(batch["meta"], texts):
                preds[index] = text
        idxs = sorted(preds.keys())
        cands = [preds[i] for i in idxs]
        refs = [references[i] for i in idxs]
        result = {
            "CIDEr": M.cider_d(cands, refs),
            "BLEU4": M.bleu(cands, refs),
            "ROUGE_L": M.rouge_l(cands, refs),
            "METEOR": M.meteor(cands, refs),
            "num_samples": len(cands),
        }
        self._sink(dataset_name, result)
        return result

    def evaluate_vqa(self, batches, dataset_name: str = "vqa"
                     ) -> Dict[str, float]:
        accs = []
        # per-task defaults (reference VQACollator max_length=10 min_length=0
        # num_beams=3, collator.py:543-549) are applied by
        # `evaluate.resolve_eval_config`; direct callers get cfg as-is
        gen_cfg = self._gen_cfg(min_new_tokens=0)
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            texts = self._decode_batch(batch, gen_cfg)
            for (index, _q, answers), text in zip(batch["meta"], texts):
                if not answers:
                    continue
                accs.append(
                    M.vqa_accuracy(M.extract_vqa_answer(text), answers)
                )
        result = {
            "vqa_accuracy": float(np.mean(accs)) if accs else 0.0,
            "num_samples": len(accs),
        }
        self._sink(dataset_name, result)
        return result

    def evaluate_t2i(self, batches, dataset_name: str = "t2i",
                     save_images: bool = True,
                     num_candidates: Optional[int] = None,
                     rerank_fn=None, feature_fn=None) -> Dict[str, float]:
        """Generate images; compute FID in-loop against the ground-truth
        images when a ``feature_fn(images [N,H,W,3] in [0,1]) -> [N,D]`` is
        given (reference computes FID on rank 0 from saved paths,
        lmm_trainer.py:1513-1533 + fid_score.py:251-275).

        With ``num_candidates > 1`` and a ``rerank_fn(images, captions) ->
        best_idx_per_caption``, reproduces the 8-candidate CLIP text-image
        rerank (clip_sim_score.py:84-120); build one with
        :func:`make_clip_rerank_fn`.
        """
        from ..utils import fid as F

        if num_candidates is None:
            num_candidates = self.cfg.num_candidates
        n = 0
        out_dir = None
        if save_images and self.cfg.output_dir:
            out_dir = os.path.join(self.cfg.output_dir, dataset_name)
            os.makedirs(out_dir, exist_ok=True)
        rng = jax.random.PRNGKey(0)
        gen_arrays, gt_arrays = [], []
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            ctx, ctx_mask, mmfs_vals, mmfs_mask = (
                self.runtime.generate_image_inputs(
                    batch["text_ids"], batch["image_tensors"],
                    batch["num_image_per_seq"], batch["attention_mask"],
                )
            )
            B = batch["text_ids"].shape[0]
            max_img = batch["image_tensors"].shape[1]
            # targets are the last image slot of each row
            tgt = (
                np.arange(B) * max_img
                + np.asarray(batch["num_image_per_seq"]) - 1
            )
            cands = []
            for c in range(num_candidates):
                imgs = self.runtime.denoise(
                    ctx[tgt], ctx_mask[tgt],
                    mmfs_vals[tgt], mmfs_mask[tgt],
                    jax.random.fold_in(jax.random.fold_in(rng, bi), c),
                    num_inference_steps=self.cfg.num_inference_steps,
                    guidance_scale=self.cfg.guidance_scale,
                )
                cands.append(np.asarray(imgs))
            if num_candidates > 1 and rerank_fn is not None:
                captions = [m[1] for m in batch["meta"]]
                stacked = np.concatenate(cands, axis=0)  # [C*B, H, W, 3]
                best = rerank_fn(stacked, captions)  # [B] candidate idx
                picked = np.stack([
                    cands[best[i]][i] for i in range(B)
                ])
            else:
                picked = cands[0]
            arr = (picked * 255).astype(np.uint8)
            if feature_fn is not None:
                gen_arrays.append(picked)
                gt_key = ("image_tensors_dec"
                          if "image_tensors_dec" in batch
                          else "image_tensors")
                gt = np.asarray(batch[gt_key]).reshape(
                    (-1,) + tuple(np.shape(batch[gt_key])[2:])
                )[tgt]
                gt_arrays.append(gt)
            if out_dir is not None:
                from PIL import Image

                for (index, _), im in zip(batch["meta"], arr):
                    Image.fromarray(im).save(
                        os.path.join(out_dir, f"{index}.png")
                    )
            n += arr.shape[0]
        result = {"num_generated": n, "image_dir": out_dir or ""}
        if feature_fn is not None and gen_arrays:
            fake = feature_fn(np.concatenate(gen_arrays, axis=0))
            real = feature_fn(np.concatenate(gt_arrays, axis=0))
            result["fid"] = F.fid_from_features(real, fake)
        self._sink(dataset_name, result)
        return result

    def evaluate_segm2img(self, batches, gt_segm_by_index: Dict[int,
                          np.ndarray], segment_fn=None,
                          dataset_name: str = "ade20k",
                          num_classes: int = 150) -> Dict[str, float]:
        """Segmentation-to-image eval (reference generate_segm route,
        lmm_trainer.py:1450-1489 + 1534-1556): generate the photo from the
        colour-rendered segm map + caption, run an off-the-shelf semantic
        segmenter over the generated photo (``segment_fn(image [H,W,3] in
        [0,1]) -> [H,W] 1-indexed class map``, the OneFormer analogue of
        segm_eval.py:9-22), then accumulate the official
        intersection-and-union mIoU against the ground-truth class maps.

        Without ``segment_fn``, images are generated/saved and only
        ``num_generated`` is reported (the reference likewise skips the
        metric off the main process)."""
        out_dir = None
        if self.cfg.output_dir:
            out_dir = os.path.join(self.cfg.output_dir, dataset_name)
            os.makedirs(out_dir, exist_ok=True)
        rng = jax.random.PRNGKey(0)
        preds, labels = [], []
        n = 0
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            ctx, ctx_mask, mmfs_vals, mmfs_mask = (
                self.runtime.generate_image_inputs(
                    batch["text_ids"], batch["image_tensors"],
                    batch["num_image_per_seq"], batch["attention_mask"],
                )
            )
            B = batch["text_ids"].shape[0]
            max_img = batch["image_tensors"].shape[1]
            slot = np.asarray(batch["target_image_slots"])[:, 0]
            tgt = np.arange(B) * max_img + np.maximum(slot, 0)
            imgs = np.asarray(self.runtime.denoise(
                ctx[tgt], ctx_mask[tgt], mmfs_vals[tgt], mmfs_mask[tgt],
                jax.random.fold_in(rng, bi),
                num_inference_steps=self.cfg.num_inference_steps,
                guidance_scale=self.cfg.guidance_scale,
            ))
            for b, (index, _sid) in enumerate(batch["meta"]):
                if out_dir is not None:
                    from PIL import Image

                    Image.fromarray(
                        (imgs[b] * 255).astype(np.uint8)
                    ).save(os.path.join(out_dir, f"{index:06d}.png"))
                n += 1
                if segment_fn is None:
                    continue
                gt = np.asarray(gt_segm_by_index[index])
                pred = np.asarray(segment_fn(imgs[b]))
                if pred.shape != gt.shape:
                    from PIL import Image

                    pred = np.asarray(Image.fromarray(
                        pred.astype(np.uint8)
                    ).resize(gt.shape[::-1], Image.NEAREST))
                preds.append(pred)
                labels.append(gt)
        result: Dict[str, float] = {"num_generated": n}
        if preds:
            result["miou"] = M.miou_from_maps(preds, labels, num_classes)
        self._sink(dataset_name, result)
        return result

    def evaluate_grounding(self, batches, dataset_name: str = "grounding"
                           ) -> Dict[str, float]:
        """Referring-expression grounding: decode '<box>(x,y)(x,y)</box>'
        strings, score acc@IoU0.5 (reference lmm_trainer.py:1580-1592)."""
        gen_cfg = self._gen_cfg(min_new_tokens=1, max_new_tokens=24)
        preds, gts = [], []
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            texts = self._decode_batch(batch, gen_cfg)
            for (index, expr, gt_box), text in zip(batch["meta"], texts):
                boxes = M.parse_box_string(text)
                preds.append(boxes[0] if boxes else [0.0, 0.0, 0.0, 0.0])
                gts.append(gt_box)
        result = {
            "grounding_acc@0.5": M.grounding_accuracy(preds, gts),
            "num_samples": len(preds),
        }
        self._sink(dataset_name, result)
        return result

    def evaluate_ranking(self, batches, dataset_name: str = "visdial"
                         ) -> Dict[str, float]:
        """Option-ranking eval -> NDCG (reference _inner_ranking_loop,
        lmm_trainer.py:1812-1912)."""
        all_scores, all_rel = [], []
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            scores = self.runtime.generate_scores(
                batch["text_ids"], batch["options_ids"],
                batch["options_mask"], batch["image_tensors"],
                batch["num_image_per_seq"], batch["attention_mask"],
            )
            all_scores.append(scores)
            all_rel.append(np.asarray(batch["relevance"]))
        scores = np.concatenate(all_scores)
        rel = np.concatenate(all_rel)
        result = {"ndcg": M.ndcg(scores, rel), "num_samples": len(scores)}
        self._sink(dataset_name, result)
        return result

    def evaluate_storytelling(self, batches, dataset_name: str = "vist",
                              feature_fn=None) -> Dict[str, float]:
        """Autoregressive image-sequence generation: each generated frame is
        re-encoded as context for the next (reference
        _inner_generation_loop_v2, lmm_trainer.py:1605-1810).

        Batches carry ``target_image_slots`` [B, n_targets] (indices into the
        padded image axis, -1 = none); frames generate in slot order.

        With ``feature_fn`` the loop also reports FID and the CLIP
        image-image similarity between generated and ground-truth frames
        (reference lmm_trainer.py:1776-1798, clip_sim_score.py:22-81).
        """
        import jax.numpy as jnp
        from PIL import Image as PILImage

        from ..utils import fid as F

        out_dir = None
        if self.cfg.output_dir:
            out_dir = os.path.join(self.cfg.output_dir, dataset_name)
            os.makedirs(out_dir, exist_ok=True)
        rng = jax.random.PRNGKey(0)
        n = 0
        gen_arrays, gt_arrays = [], []
        enc_res = self.model.cfg.visual.encoder.vit.image_size
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            image_tensors = batch["image_tensors"]
            targets = np.asarray(batch["target_image_slots"])
            n_rounds = targets.shape[1]
            B = image_tensors.shape[0]
            max_img = image_tensors.shape[1]
            for r in range(n_rounds):
                slot = targets[:, r]
                if (slot < 0).all():
                    continue
                ctx, ctx_mask, mmfs_vals, mmfs_mask = (
                    self.runtime.generate_image_inputs(
                        batch["text_ids"], image_tensors,
                        batch["num_image_per_seq"],
                        batch["attention_mask"],
                    )
                )
                flat = np.arange(B) * max_img + np.maximum(slot, 0)
                rng, rr = jax.random.split(rng)
                imgs = self.runtime.denoise(
                    ctx[flat], ctx_mask[flat],
                    mmfs_vals[flat], mmfs_mask[flat], rr,
                    num_inference_steps=self.cfg.num_inference_steps,
                    guidance_scale=self.cfg.guidance_scale,
                )
                arr = np.asarray(imgs)
                # feed generated frames back as encoder inputs
                # (reference lmm_trainer.py:1683-1703)
                resized = np.stack([
                    np.asarray(
                        PILImage.fromarray(
                            (a * 255).astype(np.uint8)
                        ).resize((enc_res, enc_res))
                    , np.float32) / 255.0
                    for a in arr
                ])
                image_tensors = np.array(image_tensors)  # writable copy
                for b in range(B):
                    if slot[b] >= 0:
                        if feature_fn is not None:
                            gen_arrays.append(arr[b])
                            # gt frame: the original (pre-overwrite) slot
                            # content, upsampled to the generated resolution
                            gt = np.asarray(PILImage.fromarray(
                                (np.asarray(
                                    batch["image_tensors"][b, slot[b]]
                                ) * 255).astype(np.uint8)
                            ).resize(arr.shape[1:3][::-1]), np.float32) / 255.0
                            gt_arrays.append(gt)
                        image_tensors[b, slot[b]] = resized[b]
                        if out_dir is not None:
                            idx = batch["meta"][b][0]
                            PILImage.fromarray(
                                (arr[b] * 255).astype(np.uint8)
                            ).save(os.path.join(
                                out_dir, f"{idx}_round{r}.png"
                            ))
                            n += 1
                image_tensors = jnp.asarray(image_tensors)
        result = {"num_generated": n, "image_dir": out_dir or ""}
        if feature_fn is not None and gen_arrays:
            fake_feats = feature_fn(np.stack(gen_arrays))
            real_feats = feature_fn(np.stack(gt_arrays))
            result["fid"] = F.fid_from_features(real_feats, fake_feats)
            result["clip_sim_i2i"] = float(
                F.clip_similarity(fake_feats, real_feats).mean()
            )
        self._sink(dataset_name, result)
        return result

    # ------------------------------------------------------------------ #

    @staticmethod
    def gather_predictions(local: Dict) -> Dict:
        """Multi-host prediction merge — replaces the reference's per-rank
        JSON files + barrier (caption_collect.py:7,
        lmm_trainer.py:1871-1891).

        Hosts hold *different* keys, so a pytree `process_allgather` would
        see mismatching treedefs.  Instead the local dict is serialised to
        JSON bytes, padded to the global max length (one scalar allgather),
        gathered as a uint8 array, and merged (later process indices win on
        key collisions, matching the reference's file-overwrite order)."""
        if jax.process_count() == 1:
            return local
        import json as _json

        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        payload = _json.dumps(
            {str(k): v for k, v in local.items()}
        ).encode("utf-8")
        n = np.frombuffer(payload, np.uint8)
        lengths = multihost_utils.process_allgather(
            jnp.asarray([len(n)], jnp.int32)
        ).reshape(-1)
        max_len = int(lengths.max())
        padded = np.zeros(max_len, np.uint8)
        padded[: len(n)] = n
        gathered = np.asarray(multihost_utils.process_allgather(
            jnp.asarray(padded)
        )).reshape(jax.process_count(), max_len)
        merged: Dict = {}
        for p in range(gathered.shape[0]):
            raw = gathered[p, : int(lengths[p])].tobytes()
            part = _json.loads(raw.decode("utf-8"))
            merged.update(part)
        # restore int keys where possible (sample indices)
        out: Dict = {}
        for k, v in merged.items():
            try:
                out[int(k)] = v
            except ValueError:
                out[k] = v
        return out

    def _sink(self, dataset_name: str, result: Dict):
        """Append to eval_metrics.jsonl (reference lmm_trainer.py:2165-2177)."""
        if not self.cfg.output_dir or jax.process_index() != 0:
            return
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        with open(
            os.path.join(self.cfg.output_dir, "eval_metrics.jsonl"), "a"
        ) as f:
            f.write(json.dumps(
                {"dataset": dataset_name, "time": time.time(), **result}
            ) + "\n")
