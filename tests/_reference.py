"""Helpers to load the PyTorch reference (`/root/reference`) on CPU for
cross-framework parity tests.

The reference package `__init__` chain imports xformers/diffusers-era code
that no longer imports under the in-image transformers, so we register stub
parent packages (with correct ``__path__``) and import only the standalone
modules we need (`modeling_llama_mmfs`, the MMFS op module).  The CUDA
extension is absent; we route `MSDeformAttnFunction` to the reference's own
pure-PyTorch fallback `ms_deform_attn_core_pytorch`
(functions/ms_deform_attn_func.py:47-67, "for debug and test only").
"""

from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"

_PKGS = (
    ("mm_interleaved", f"{REF}/mm_interleaved"),
    ("mm_interleaved.models", f"{REF}/mm_interleaved/models"),
    ("mm_interleaved.models.decoders", f"{REF}/mm_interleaved/models/decoders"),
    ("mm_interleaved.models.utils", f"{REF}/mm_interleaved/models/utils"),
)


def _mk_pkg(name: str, path: str) -> None:
    if name in sys.modules:
        return
    m = types.ModuleType(name)
    m.__path__ = [path]
    m.__package__ = name
    sys.modules[name] = m


def load_reference_llama():
    """Import the reference `modeling_llama_mmfs` module with the deformable
    core shimmed to the pure-PyTorch fallback. Returns the module."""
    for name, path in _PKGS:
        _mk_pkg(name, path)
    mod = importlib.import_module(
        "mm_interleaved.models.decoders.modeling_llama_mmfs"
    )
    ref_mmfs = importlib.import_module(
        "mm_interleaved.models.utils.ops.modules.mmfs"
    )
    func_mod = importlib.import_module(
        "mm_interleaved.models.utils.ops.functions.ms_deform_attn_func"
    )

    class _PurePytorchShim:
        @staticmethod
        def apply(value, shapes, start_idx, loc, weights, step):
            return func_mod.ms_deform_attn_core_pytorch(
                value, shapes, loc, weights
            )

    ref_mmfs.MSDeformAttnFunction = _PurePytorchShim
    return mod


def load_reference_text_decoder():
    for name, path in _PKGS:
        _mk_pkg(name, path)
    # decoder_text.py imports helpers removed from transformers>=4.36; the
    # reference carries identical copies in modeling_llama_mmfs — inject them.
    import transformers.models.llama.modeling_llama as hf_llama

    ref_llama = importlib.import_module(
        "mm_interleaved.models.decoders.modeling_llama_mmfs"
    )
    for sym in ("_make_causal_mask", "_expand_mask"):
        if not hasattr(hf_llama, sym):
            setattr(hf_llama, sym, getattr(ref_llama, sym))
    return importlib.import_module(
        "mm_interleaved.models.decoders.decoder_text"
    )
