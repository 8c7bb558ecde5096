"""Multi-turn interleaved inference: alternate text and image generation.

Re-design of the reference `inference.py` (`load_annt_data` :39-115,
`inference_all` :199-279, `update_texts` :118-185, `update_image` :188-196):

  * each turn either decodes text (stopping at <eos> or <soi>) or samples an
    image conditioned on the full prefix;
  * when the text turn ends in <soi> (or an image is forced), the stream
    gains the <soi> + N x <image> block and a grey placeholder image, and the
    next turn generates that image;
  * a generated image is re-encoded (transform -> visual tokenizer) as input
    context for subsequent turns;
  * prompt lengths are bucketed to multiples of 64 so the jitted prefill
    recompiles O(log) times, not per turn.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from .generation.text import TextGenerationConfig
from .data.transforms import DualImageTransform, ImageTransform


def _bucket(n: int, mult: int = 64) -> int:
    return ((n + mult - 1) // mult) * mult


@dataclasses.dataclass
class InferenceConfig:
    num_iter: int = 2
    start_mode: str = "generate_texts"
    max_new_tokens: int = 64
    num_inference_steps: int = 30
    guidance_scale: float = 3.5
    force_image_every_turn: bool = False
    seed: int = 0


class InterleavedInferencePipeline:
    def __init__(self, model, variables, tokenizer,
                 cfg: InferenceConfig, runtime=None):
        from .parallel.inference import LocalGenerator

        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.cfg = cfg
        # generation seam: pass a ShardedGenerator to run the multi-turn
        # loop mesh-sharded (13B flagship)
        self.runtime = runtime or LocalGenerator(model, variables)
        mcfg = model.cfg
        self.sp = mcfg.special
        self.ntok = mcfg.num_img_token
        enc_res = mcfg.visual.encoder.vit.image_size
        dec_res = (mcfg.image_decoder.image_size
                   if mcfg.image_decoder is not None else enc_res)
        self.transform = ImageTransform(size=enc_res)
        self.dec_res = dec_res

    # ------------------------------------------------------------------ #
    # annt.json loading (reference inference.py:39-115)                   #
    # ------------------------------------------------------------------ #

    def load_annt_data(self, annt_path: str, image_root: str = ""):
        """annt.json: [{"sentences": [...], "images": [paths...]}] with
        sentences/images interleaved by "<|image|>" markers in sentences or
        alternating order."""
        import os

        with open(annt_path) as f:
            annts = json.load(f)
        samples = []
        for annt in annts:
            ids: List[int] = [self.sp.bos_token_id]
            images: List[np.ndarray] = []
            sentences = annt.get("sentences", [])
            image_paths = annt.get("images", [])
            img_i = 0
            for piece in sentences:
                if piece == "<|image|>":
                    ids += [self.sp.soi_token_id] + (
                        [self.sp.image_token_id] * self.ntok
                    )
                    img = Image.open(
                        os.path.join(image_root, image_paths[img_i])
                    ).convert("RGB")
                    images.append(self.transform(img))
                    img_i += 1
                else:
                    ids += self.tokenizer.encode(piece)
            samples.append(dict(
                text_ids=np.asarray(ids, np.int32),
                images=images,
                meta=annt.get("meta", {}),
            ))
        return samples

    # ------------------------------------------------------------------ #

    def _batchify(self, ids: np.ndarray, images: List[np.ndarray]):
        import jax.numpy as jnp

        L = _bucket(len(ids))
        pad = L - len(ids)
        text_ids = np.concatenate([
            np.full((pad,), self.sp.pad_token_id, np.int32), ids
        ])[None]
        att = np.concatenate([
            np.zeros((pad,), np.int32), np.ones((len(ids),), np.int32)
        ])[None]
        max_img = max(len(images), 1)
        enc_res = self.model.cfg.visual.encoder.vit.image_size
        img_arr = np.zeros((1, max_img, enc_res, enc_res, 3), np.float32)
        for i, im in enumerate(images):
            img_arr[0, i] = im
        return dict(
            text_ids=jnp.asarray(text_ids),
            attention_mask=jnp.asarray(att),
            image_tensors=jnp.asarray(img_arr),
            num_image_per_seq=jnp.asarray(
                [max(len(images), 1)], dtype=np.int32
            ),
        )

    def _grey_image(self):
        enc_res = self.model.cfg.visual.encoder.vit.image_size
        return np.full((enc_res, enc_res, 3), 0.5, np.float32)

    # ------------------------------------------------------------------ #

    def run(self, sample: Dict, rng=None) -> Dict:
        """Multi-turn loop (reference inference_all, inference.py:199-279)."""
        import jax

        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        ids = np.asarray(sample["text_ids"], np.int32).copy()
        images = list(sample["images"])
        mode = cfg.start_mode
        outputs = {"texts": [], "images": []}

        for it in range(cfg.num_iter):
            batch = self._batchify(ids, images)
            if mode == "generate_texts":
                gen_cfg = TextGenerationConfig(
                    max_new_tokens=cfg.max_new_tokens,
                    eos_token_ids=(self.sp.eos_token_id,
                                   self.sp.soi_token_id),
                    pad_token_id=self.sp.pad_token_id,
                )
                toks = np.asarray(self.runtime.generate_texts(
                    batch["text_ids"], batch["image_tensors"],
                    batch["num_image_per_seq"],
                    batch["attention_mask"], gen_cfg,
                ))[0]
                # strip padding; keep a possible trailing <soi>
                new = [int(t) for t in toks if t != self.sp.pad_token_id]
                text_part = [t for t in new
                             if t not in (self.sp.eos_token_id,
                                          self.sp.soi_token_id)]
                outputs["texts"].append(self.tokenizer.decode(text_part))
                ids = np.concatenate([ids, np.asarray(text_part, np.int32)])
                wants_image = (
                    (len(new) > 0 and new[-1] == self.sp.soi_token_id)
                    or cfg.force_image_every_turn
                )
                if wants_image and self.model.cfg.image_decoder is not None:
                    # splice in the image block + grey placeholder
                    ids = np.concatenate([
                        ids,
                        np.asarray(
                            [self.sp.soi_token_id]
                            + [self.sp.image_token_id] * self.ntok,
                            np.int32,
                        ),
                    ])
                    images.append(self._grey_image())
                    mode = "generate_images"
                else:
                    break  # nothing more to generate
            else:  # generate_images: fill in the most recent placeholder
                ctx, ctx_mask, mmfs_vals, mmfs_mask = (
                    self.runtime.generate_image_inputs(
                        batch["text_ids"], batch["image_tensors"],
                        batch["num_image_per_seq"],
                        batch["attention_mask"],
                    )
                )
                tgt = np.asarray([len(images) - 1], np.int32)
                rng, r = jax.random.split(rng)
                img = self.runtime.denoise(
                    ctx[tgt], ctx_mask[tgt],
                    mmfs_vals[tgt], mmfs_mask[tgt], r,
                    num_inference_steps=cfg.num_inference_steps,
                    guidance_scale=cfg.guidance_scale,
                )
                arr = np.asarray(img[0])
                outputs["images"].append(arr)
                # re-encode the generated image as next-turn input
                # (reference update_image, inference.py:188-196)
                pil = Image.fromarray((arr * 255).astype(np.uint8))
                images[-1] = self.transform(pil)
                mode = "generate_texts"

        outputs["text_ids"] = ids
        return outputs
