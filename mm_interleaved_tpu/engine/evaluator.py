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

from ..generation.diffusion import generate_images
from ..generation.text import TextGenerationConfig, generate_texts
from ..utils import metrics as M


@dataclasses.dataclass
class EvalConfig:
    batch_size: int = 8
    max_new_tokens: int = 30
    min_new_tokens: int = 8
    num_inference_steps: int = 30
    guidance_scale: float = 3.5
    output_dir: Optional[str] = None
    max_batches: Optional[int] = None


class Evaluator:
    def __init__(self, model, variables, tokenizer, cfg: EvalConfig):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.cfg = cfg

    # ------------------------------------------------------------------ #

    def _gen_cfg(self, **overrides) -> TextGenerationConfig:
        sp = self.model.cfg.special
        base = dict(
            max_new_tokens=self.cfg.max_new_tokens,
            min_new_tokens=self.cfg.min_new_tokens,
            eos_token_ids=(sp.eos_token_id, sp.soi_token_id),
            pad_token_id=sp.pad_token_id,
        )
        base.update(overrides)
        return TextGenerationConfig(**base)

    def _decode_batch(self, batch, gen_cfg) -> List[str]:
        tokens = generate_texts(
            self.model, self.variables,
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
            "num_samples": len(cands),
        }
        self._sink(dataset_name, result)
        return result

    def evaluate_vqa(self, batches, dataset_name: str = "vqa"
                     ) -> Dict[str, float]:
        accs = []
        gen_cfg = self._gen_cfg(min_new_tokens=1, max_new_tokens=10)
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
                     save_images: bool = True, num_candidates: int = 1,
                     rerank_fn=None) -> Dict[str, float]:
        """Generate images; save for FID computation downstream
        (reference _inner_generation_loop t2i branch, lmm_trainer.py:1390-1434).

        With ``num_candidates > 1`` and a ``rerank_fn(images, captions) ->
        best_idx_per_caption``, reproduces the 8-candidate CLIP text-image
        rerank (clip_sim_score.py:84-120).
        """
        n = 0
        out_dir = None
        if save_images and self.cfg.output_dir:
            out_dir = os.path.join(self.cfg.output_dir, dataset_name)
            os.makedirs(out_dir, exist_ok=True)
        rng = jax.random.PRNGKey(0)
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            ctx, ctx_mask, mmfs_vals, mmfs_mask = self.model.apply(
                self.variables,
                batch["text_ids"], batch["image_tensors"],
                batch["num_image_per_seq"], batch["attention_mask"],
                method=self.model.generate_image_inputs,
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
                imgs = generate_images(
                    self.model, self.variables,
                    ctx[tgt], ctx_mask[tgt],
                    jax.random.fold_in(jax.random.fold_in(rng, bi), c),
                    mmfs_values=mmfs_vals[tgt], mmfs_mask=mmfs_mask[tgt],
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
            if out_dir is not None:
                from PIL import Image

                for (index, _), im in zip(batch["meta"], arr):
                    Image.fromarray(im).save(
                        os.path.join(out_dir, f"{index}.png")
                    )
            n += arr.shape[0]
        result = {"num_generated": n, "image_dir": out_dir or ""}
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
        from ..generation.scores import generate_scores

        all_scores, all_rel = [], []
        for bi, batch in enumerate(batches):
            if self.cfg.max_batches and bi >= self.cfg.max_batches:
                break
            scores = generate_scores(
                self.model, self.variables,
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

    def evaluate_storytelling(self, batches, dataset_name: str = "vist"
                              ) -> Dict[str, float]:
        """Autoregressive image-sequence generation: each generated frame is
        re-encoded as context for the next (reference
        _inner_generation_loop_v2, lmm_trainer.py:1605-1810).

        Batches carry ``target_image_slots`` [B, n_targets] (indices into the
        padded image axis, -1 = none); frames generate in slot order.
        """
        import jax.numpy as jnp
        from PIL import Image as PILImage

        out_dir = None
        if self.cfg.output_dir:
            out_dir = os.path.join(self.cfg.output_dir, dataset_name)
            os.makedirs(out_dir, exist_ok=True)
        rng = jax.random.PRNGKey(0)
        n = 0
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
                ctx, ctx_mask, mmfs_vals, mmfs_mask = self.model.apply(
                    self.variables, batch["text_ids"], image_tensors,
                    batch["num_image_per_seq"], batch["attention_mask"],
                    method=self.model.generate_image_inputs,
                )
                flat = np.arange(B) * max_img + np.maximum(slot, 0)
                rng, rr = jax.random.split(rng)
                imgs = generate_images(
                    self.model, self.variables, ctx[flat], ctx_mask[flat],
                    rr, mmfs_values=mmfs_vals[flat],
                    mmfs_mask=mmfs_mask[flat],
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
        self._sink(dataset_name, result)
        return result

    # ------------------------------------------------------------------ #

    @staticmethod
    def gather_predictions(local: Dict) -> Dict:
        """Multi-host prediction merge via `process_allgather` — replaces the
        reference's per-rank JSON files + barrier (caption_collect.py:7,
        lmm_trainer.py:1871-1891)."""
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        keys = sorted(local.keys())
        gathered = multihost_utils.process_allgather(
            {k: local[k] for k in keys}
        )
        merged: Dict = {}
        for k, v in gathered.items():
            merged[k] = v
        return merged

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
