"""Weight-only int8 quantization for the decode-bound LLM path.

The reference has no quantized inference (its 13B eval runs fp16 on A100s);
on TPU the B=8 decode regime is HBM-bandwidth-bound on weight reads
(PERF.md "Decode ceilings"), so halving weight bytes nearly halves the
per-token floor.  Design:

* :class:`QDense` is a drop-in for ``nn.Dense`` — identical param tree
  (``kernel`` [+ ``bias``]), so converters/checkpoints are untouched.  At
  apply time it looks for a ``qscale`` collection side-car; if present the
  kernel leaf is expected to be int8 and is dequantized (bf16 multiply by
  the per-output-channel scale) right at the use site, where XLA fuses the
  convert+scale into the dot's operand read instead of materializing a
  dequantized copy in HBM.  Without the side-car it is exactly ``nn.Dense``.
* :func:`quantize_llm_weights` walks a variables dict and rewrites the
  big LLM matmul kernels (q/k/v/o, gate/up/down, dual lm heads) to
  symmetric per-channel int8, emitting the matching ``qscale`` tree.
  Works on both the unrolled (``layers_{i}``) and ``scan_layers``
  (``block/layer_{j}`` with a leading n_blocks axis) layouts — scales are
  taken over the reduction axis only, so stacked kernels quantize
  per-block for free.

Quantization is symmetric absmax per output channel (the standard
weight-only recipe: negligible perplexity delta at 8 bits), computed once
before generation; activations stay bf16.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# dense-kernel leaf names eligible for weight-only quantization
_LLM_PROJ_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
    "head", "head_new",
)


def quantize_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 over the reduction axis (second-to-last).

    ``w``: ``[..., d_in, d_out]`` -> ``(int8 [..., d_in, d_out],
    f32 [..., 1, d_out])``.  Leading axes (e.g. the scan_layers n_blocks
    axis) quantize independently.
    """
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_int8(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return q.astype(dtype) * scale.astype(dtype)


class QDense(nn.Module):
    """``nn.Dense`` with an optional int8 kernel + ``qscale`` side-car.

    Param tree is byte-identical to ``nn.Dense`` (same names, shapes,
    init).  When the applied variables carry
    ``{"qscale": {...this module's path...: {"scale": s}}}`` the kernel
    leaf holds int8 codes and is dequantized inline.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), jnp.float32
            )
        dtype = self.dtype or x.dtype
        if self.has_variable("qscale", "scale"):
            scale = self.get_variable("qscale", "scale")
            w = dequantize_int8(kernel, scale.reshape(1, -1), dtype)
        else:
            w = kernel.astype(dtype)
        y = jnp.matmul(x.astype(dtype), w)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


_LLM_ROOTS = re.compile(r"^(mm_decoder|text_decoder|block|layers_\d+)$")


def _is_quant_path(path: Tuple[str, ...]) -> bool:
    """True for ``.../<proj>/kernel`` leaves of the LLM/text-decoder.

    The root gate matters: the CLIP ViT / text encoder reuse the
    ``q_proj``/``k_proj``/``v_proj`` names but run through plain
    ``nn.Dense`` (no qscale lookup) — quantizing them would silently drop
    the scales.
    """
    if len(path) < 2 or path[-1] != "kernel":
        return False
    if path[-2] not in _LLM_PROJ_NAMES:
        return False
    return bool(_LLM_ROOTS.match(path[0]))


def quantize_llm_weights(variables: dict) -> dict:
    """Rewrite eligible kernels to int8 and attach the ``qscale`` tree.

    Input/output: full flax variables dict (``{"params": ...}`` ->
    ``{"params": ..., "qscale": ...}``).  Idempotent-unsafe: do not call
    twice (int8 kernels would be re-quantized); callers transform once
    before the generation loop.
    """
    params = variables["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    new_leaves = {}
    scales = {}
    for kp, leaf in flat:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        if not _is_quant_path(path):
            continue
        assert leaf.dtype != jnp.int8, f"already quantized: {path}"
        q, s = quantize_int8(leaf)
        new_leaves[path] = q
        # scale [..., 1, d_out] -> stored without the kept dim
        scales[path[:-1] + ("scale",)] = jnp.squeeze(s, axis=-2)

    def _set(tree: dict, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def _copy(tree):
        if isinstance(tree, dict):
            return {k: _copy(v) for k, v in tree.items()}
        return tree

    new_params = _copy(params)
    qscale: dict = {}
    for path, q in new_leaves.items():
        _set(new_params, path, q)
    for path, s in scales.items():
        _set(qscale, path, s)

    out = dict(variables)
    out["params"] = new_params
    if qscale:
        out["qscale"] = qscale
    return out
