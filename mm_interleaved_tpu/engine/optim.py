"""Optimizer construction: per-substring param groups + freeze masks.

Re-design of the reference's `LMMTrainer.create_optimizer`
(`engine/lmm_trainer.py:236-364`): the reference walks named_parameters and
buckets them by substring into groups with separate lr/wd
(`random_params_list`, mm_pretrain.yaml:19-21); frozen modules are excluded by
``requires_grad``.  Here both become optax transforms: a label function over
the param path drives `optax.multi_transform`; frozen paths get
`optax.set_to_zero`.

Reference trainability (SURVEY.md §3.4): the ViT core, the LLM (minus
``llama_cross_attn``), ``text_decoder.head`` and the VAE are frozen; adapters,
perceivers, MMFS, ``head_new``, soi token, context proj and the UNet train.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Sequence, Tuple

import jax
import optax


# (first match wins) reference defaults: mm_pretrain.yaml:14-21
DEFAULT_PARAM_GROUPS: Tuple[Tuple[str, float, Optional[float]], ...] = (
    # (substring-regex, lr scale vs base, weight decay override)
    (r"llama_cross_attn/gate", 1.0, 0.0),
    (r"sampling_offsets", 0.1, 0.0),
    (r"llama_cross_attn", 1.0, None),
    (r"image_decoder/unet", 0.1, None),
)

DEFAULT_FROZEN_PATTERNS: Tuple[str, ...] = (
    # CLIP ViT core (vit_adapter_hf.py:243-252 freezes all but adapter_*)
    r"visual_tokenizer/encoder/(embeddings|pre_layrnorm|layers_\d+)/",
    # LLM minus cross-attn (mm_interleaved.py:74-78)
    r"mm_decoder/(?!.*llama_cross_attn)",
    # frozen copied lm_head (decoder_text.py:50-51)
    r"text_decoder/head/",
    # VAE (sd.py:56)
    r"image_decoder/vae/",
    # MMFS ignore token (mmfs.py:87-89)
    r".*/ignore_token$",
)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    beta1: float = 0.9
    beta2: float = 0.995
    eps: float = 1e-6
    grad_clip: float = 1.0
    warmup_steps: int = 1000
    total_steps: int = 15000
    schedule: str = "cosine"  # or "constant"
    min_lr_ratio: float = 0.0
    param_groups: Tuple[Tuple[str, float, Optional[float]], ...] = (
        DEFAULT_PARAM_GROUPS
    )
    frozen_patterns: Tuple[str, ...] = DEFAULT_FROZEN_PATTERNS
    freeze: bool = True


def path_strings(params):
    """Pytree of '/'-joined path strings matching ``params``."""

    def path_str(kp):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    return jax.tree_util.tree_map_with_path(
        lambda kp, _: path_str(kp), params
    )


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.schedule == "constant":
        return optax.warmup_constant_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps
        ) if hasattr(optax, "warmup_constant_schedule") else (
            lambda step: cfg.learning_rate
        )
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.total_steps,
        end_value=cfg.learning_rate * cfg.min_lr_ratio,
    )


def label_for_path(path: str, cfg: OptimConfig) -> str:
    if cfg.freeze:
        for pat in cfg.frozen_patterns:
            if re.search(pat, path):
                return "frozen"
    for i, (pat, _, _) in enumerate(cfg.param_groups):
        if re.search(pat, path):
            return f"group_{i}"
    return "default"


def make_optimizer(cfg: OptimConfig, params) -> optax.GradientTransformation:
    base_sched = make_schedule(cfg)

    def adamw(lr_scale: float, wd: Optional[float]):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
            optax.add_decayed_weights(
                cfg.weight_decay if wd is None else wd
            ),
            optax.scale_by_schedule(
                lambda s: -lr_scale * base_sched(s)
            ),
        )

    transforms = {"default": adamw(1.0, None), "frozen": optax.set_to_zero()}
    for i, (_, lr_scale, wd) in enumerate(cfg.param_groups):
        transforms[f"group_{i}"] = adamw(lr_scale, wd)

    labels = jax.tree_util.tree_map(
        lambda p: label_for_path(p, cfg), path_strings(params)
    )
    tx = optax.multi_transform(transforms, labels)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def trainable_mask(cfg: OptimConfig, params):
    """Bool pytree: True where the optimizer actually updates."""
    return jax.tree_util.tree_map(
        lambda p: label_for_path(p, cfg) != "frozen", path_strings(params)
    )
