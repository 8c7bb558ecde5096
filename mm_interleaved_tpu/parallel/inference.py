"""Sharded generation runtime — mesh-aware decode/denoise.

The reference runs every released benchmark on Vicuna-13B
(`configs/release/mm_eval.yaml`; reference `inference.py:282-302`); 13B
bf16 params are ~26 GB and cannot decode on a single v5e chip, so
inference must run model-sharded.  TPU-native design (no analogue in the
reference, which relies on single-GPU HF `.generate()`):

  * params are committed to `NamedSharding`s from the same partition rules
    the trainer uses (`parallel.partition.DEFAULT_RULES`: megatron-style TP
    over the ``tensor`` axis, weight sharding over ``fsdp``) — XLA GSPMD
    then inserts the decode-time collectives (one all-reduce per
    attention/MLP output projection, riding ICI);
  * the generation entry points are jitted as whole programs: prefill +
    the full `lax.scan` decode (or denoise) loop compile into one
    executable, so per-step host dispatch disappears and the batch stays
    sharded over ``(data, fsdp)`` throughout;
  * the KV cache and the prefill-hoisted MMFS value projections are pinned
    with ``with_sharding_constraint`` (kv heads on ``tensor``, batch on the
    data axes) via the ambient :func:`generation_mesh` context, so the
    cache stays distributed instead of whatever GSPMD propagation picks —
    at 13B the replicated cache alone would not fit.
"""

from __future__ import annotations

import contextvars
from contextlib import contextmanager
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .partition import DEFAULT_RULES, _fit_spec, params_shardings

# Ambient mesh for generation-time sharding constraints.  Context-local so
# parallel traces never observe another thread's mesh (same rationale as
# ops.ms_deform_attn._DISPATCH).
_GEN_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "mmi_generation_mesh", default=None
)


@contextmanager
def generation_mesh(mesh: Optional[Mesh]):
    """Activate ``mesh`` for :func:`constrain` calls traced inside."""
    token = _GEN_MESH.set(mesh)
    try:
        yield
    finally:
        _GEN_MESH.reset(token)


def current_generation_mesh() -> Optional[Mesh]:
    return _GEN_MESH.get()


def constrain(x: jax.Array, *axes) -> jax.Array:
    """`with_sharding_constraint(x, P(*axes))` against the ambient
    generation mesh; identity when no mesh is active.  Axes that don't
    divide the dimension are dropped (same policy as the param rules), so
    model code can state the *intended* layout unconditionally."""
    mesh = _GEN_MESH.get()
    if mesh is None or x is None:
        return x
    spec = _fit_spec(P(*axes), x.shape, mesh)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


class ShardedGenerator:
    """Mesh-committed params + jitted generation entry points.

    Replaces the reference's single-GPU eval runtime (`inference.py:237-272`)
    for models that need more than one chip.  Usage::

        gen = ShardedGenerator(model, variables, mesh)
        tokens = gen.generate_texts(text_ids, image_tensors, n_img, mask, cfg)
        images = gen.generate_images(text_ids, image_tensors, n_img, mask,
                                     rng=rng, num_inference_steps=30)
    """

    def __init__(self, model, variables, mesh: Mesh, rules=DEFAULT_RULES,
                 quantize: Optional[str] = None):
        self.model = model
        self.mesh = mesh
        self.rules = rules
        if quantize == "int8":
            from ..ops.quant import quantize_llm_weights

            variables = quantize_llm_weights(variables)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.variables = jax.device_put(
            variables, params_shardings(variables, mesh, rules)
        )
        self._jit_text = {}
        self._jit_image = {}
        self._jit_image_inputs = None
        self._jit_scores = None

    # -------------------------------------------------------------- #

    def _shard_batch(self, tree):
        def put(x):
            x = jnp.asarray(x)
            # same drop-nondividing policy as `constrain`: odd eval batch
            # sizes (dataset tails) fall back to replicated
            spec = _fit_spec(P(("data", "fsdp")), x.shape, self.mesh)
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(put, tree)

    # -------------------------------------------------------------- #

    def generate_texts(self, text_ids, image_tensors, num_image_per_seq,
                       attention_mask=None, cfg=None, rng=None):
        from ..generation.text import TextGenerationConfig, generate_texts

        cfg = cfg or TextGenerationConfig()
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if attention_mask is None:
            attention_mask = (
                text_ids != self.model.cfg.special.pad_token_id
            ).astype(jnp.int32)
        if cfg not in self._jit_text:
            model = self.model

            def fn(variables, text_ids, image_tensors, num_image_per_seq,
                   attention_mask, rng):
                return generate_texts(
                    model, variables, text_ids, image_tensors,
                    num_image_per_seq, attention_mask, cfg, rng,
                )

            self._jit_text[cfg] = jax.jit(fn)
        batch = self._shard_batch(
            (text_ids, image_tensors, num_image_per_seq, attention_mask)
        )
        with generation_mesh(self.mesh):
            return self._jit_text[cfg](self.variables, *batch, rng)

    # -------------------------------------------------------------- #

    def generate_image_inputs(self, text_ids, image_tensors,
                              num_image_per_seq, attention_mask):
        """Sharded context/mmfs prep for image generation (the encoder +
        LLM prefix forward of `generate_image_inputs`)."""
        if self._jit_image_inputs is None:
            model = self.model

            def fn(variables, *args):
                return model.apply(
                    variables, *args, method=model.generate_image_inputs
                )

            self._jit_image_inputs = jax.jit(fn)
        batch = self._shard_batch(
            (text_ids, image_tensors, num_image_per_seq, attention_mask)
        )
        with generation_mesh(self.mesh):
            return self._jit_image_inputs(self.variables, *batch)

    def denoise(self, ctx, ctx_mask, mmfs_values, mmfs_mask, rng=None,
                num_inference_steps: int = 30,
                guidance_scale: float = 3.5, sampler: str = "ddpm"):
        """Sharded denoise+VAE-decode from precomputed context/mmfs slices
        (the evaluator selects per-target rows between input prep and
        sampling, engine/evaluator.py)."""
        from ..generation.diffusion import generate_images

        if rng is None:
            rng = jax.random.PRNGKey(0)
        key = (num_inference_steps, guidance_scale, sampler)
        if key not in self._jit_image:
            model = self.model

            def fn(variables, ctx, ctx_mask, mmfs_vals, mmfs_mask, rng):
                return generate_images(
                    model, variables, ctx, ctx_mask, rng,
                    mmfs_values=mmfs_vals, mmfs_mask=mmfs_mask,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale, sampler=sampler,
                )

            self._jit_image[key] = jax.jit(fn)
        with generation_mesh(self.mesh):
            return self._jit_image[key](
                self.variables, ctx, ctx_mask, mmfs_values, mmfs_mask, rng
            )

    def generate_images(self, text_ids, image_tensors, num_image_per_seq,
                        attention_mask=None, rng=None,
                        num_inference_steps: int = 30,
                        guidance_scale: float = 3.5, sampler: str = "ddpm"):
        if attention_mask is None:
            attention_mask = (
                text_ids != self.model.cfg.special.pad_token_id
            ).astype(jnp.int32)
        ctx, ctx_mask, mmfs_vals, mmfs_mask = self.generate_image_inputs(
            text_ids, image_tensors, num_image_per_seq, attention_mask
        )
        return self.denoise(
            ctx, ctx_mask, mmfs_vals, mmfs_mask, rng,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, sampler=sampler,
        )

    # -------------------------------------------------------------- #

    def generate_scores(self, text_ids, options_ids, options_mask,
                        image_tensors, num_image_per_seq, attention_mask):
        """Sharded option-ranking scores (reference generate_scores,
        mm_interleaved.py:666-743)."""
        from ..generation.scores import generate_scores

        if self._jit_scores is None:
            model = self.model

            def fn(variables, *args):
                return generate_scores(model, variables, *args)

            self._jit_scores = jax.jit(fn)
        batch = self._shard_batch(
            (text_ids, options_ids, options_mask, image_tensors,
             num_image_per_seq, attention_mask)
        )
        with generation_mesh(self.mesh):
            return self._jit_scores(self.variables, *batch)


class LocalGenerator:
    """Unsharded runtime with the same surface as :class:`ShardedGenerator`
    — the default `Evaluator` backend on a single chip.  Keeps the
    evaluator's generation calls behind one seam so a ``mesh:`` stanza in
    the eval/inference config swaps the whole runtime (the reference has no
    such seam; its eval is single-GPU HF `.generate()`,
    `lmm_trainer.py:1379`)."""

    def __init__(self, model, variables, quantize: Optional[str] = None):
        self.model = model
        if quantize == "int8":
            from ..ops.quant import quantize_llm_weights

            variables = quantize_llm_weights(variables)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.variables = variables

    def generate_texts(self, text_ids, image_tensors, num_image_per_seq,
                       attention_mask=None, cfg=None, rng=None):
        from ..generation.text import TextGenerationConfig, generate_texts

        return generate_texts(
            self.model, self.variables, text_ids, image_tensors,
            num_image_per_seq, attention_mask,
            cfg or TextGenerationConfig(), rng,
        )

    def generate_image_inputs(self, text_ids, image_tensors,
                              num_image_per_seq, attention_mask):
        return self.model.apply(
            self.variables, text_ids, image_tensors, num_image_per_seq,
            attention_mask, method=self.model.generate_image_inputs,
        )

    def denoise(self, ctx, ctx_mask, mmfs_values, mmfs_mask, rng=None,
                num_inference_steps: int = 30,
                guidance_scale: float = 3.5, sampler: str = "ddpm"):
        from ..generation.diffusion import generate_images

        if rng is None:
            rng = jax.random.PRNGKey(0)
        return generate_images(
            self.model, self.variables, ctx, ctx_mask, rng,
            mmfs_values=mmfs_values, mmfs_mask=mmfs_mask,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, sampler=sampler,
        )

    def generate_images(self, text_ids, image_tensors, num_image_per_seq,
                        attention_mask=None, rng=None,
                        num_inference_steps: int = 30,
                        guidance_scale: float = 3.5, sampler: str = "ddpm"):
        if attention_mask is None:
            attention_mask = (
                text_ids != self.model.cfg.special.pad_token_id
            ).astype(jnp.int32)
        ctx, ctx_mask, mmfs_vals, mmfs_mask = self.generate_image_inputs(
            text_ids, image_tensors, num_image_per_seq, attention_mask
        )
        return self.denoise(
            ctx, ctx_mask, mmfs_vals, mmfs_mask, rng,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, sampler=sampler,
        )

    def generate_scores(self, text_ids, options_ids, options_mask,
                        image_tensors, num_image_per_seq, attention_mask):
        from ..generation.scores import generate_scores

        return generate_scores(
            self.model, self.variables, text_ids, options_ids, options_mask,
            image_tensors, num_image_per_seq, attention_mask,
        )


def build_generation_runtime(model, variables, mesh_cfg=None,
                             quantize: Optional[str] = None,
                             rules=DEFAULT_RULES):
    """CLI-facing factory: a ``mesh:`` config stanza (same schema as
    train.py's, e.g. ``{fsdp: 4, tensor: 2}``) with total size > 1 selects
    the sharded runtime; otherwise the local one."""
    from .partition import make_mesh

    mesh_cfg = dict(mesh_cfg or {})
    if mesh_cfg:
        mesh = make_mesh(
            data=mesh_cfg.get("data", 1),
            fsdp=mesh_cfg.get("fsdp", 1),
            tensor=mesh_cfg.get("tensor", 1),
        )
        if mesh.size > 1:
            return ShardedGenerator(
                model, variables, mesh, rules=rules, quantize=quantize
            )
    return LocalGenerator(model, variables, quantize=quantize)
