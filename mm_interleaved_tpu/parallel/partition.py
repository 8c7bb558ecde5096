"""Device mesh + parameter partitioning.

Replaces the reference's NCCL/DeepSpeed distribution stack (SURVEY.md §2.6):

  * DP / ZeRO-1  -> shard the batch over the ``data`` axis and the optimizer
    state (and optionally params) over ``fsdp``;
  * TP (absent in the reference, required here for 13B on small slices) ->
    shard attention/MLP kernels over ``tensor``;
  * NCCL collectives -> XLA GSPMD inserts all-reduce/all-gather from the
    `NamedSharding`s below.

Rules are (regex over the '/'-joined param path) -> PartitionSpec, first match
wins (t5x-style).  Axes that don't divide the dimension are dropped
automatically, so the same rules work on any mesh shape.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DEFAULT_RULES: Tuple[Tuple[str, P], ...] = (
    # --- LLaMA decoder: megatron-style TP + fsdp on the other dim
    (r".*/(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$", P("fsdp", "tensor")),
    (r".*/(o_proj|down_proj)/kernel$", P("tensor", "fsdp")),
    (r".*embed_tokens/embedding$", P("tensor", "fsdp")),
    (r".*text_decoder/(head|head_new)/kernel$", P("fsdp", "tensor")),
    # --- MMFS / deformable attention projections
    (r".*/(value_proj|dynamic_offset_mask)/kernel$", P("fsdp", "tensor")),
    (r".*/output_proj/kernel$", P("tensor", "fsdp")),
    (r".*query_relpos/embedding$", P(None, "fsdp")),
    # --- ViT / perceiver / UNet dense layers: fsdp the bigger dim
    (r".*/(fc1|intermediate|ff_in)/kernel$", P("fsdp", "tensor")),
    (r".*/(fc2|ffn_output|ff_out)/kernel$", P("tensor", "fsdp")),
    (r".*/(query|key|value|to_q|to_k|to_v|attn1_q|attn1_k|attn1_v|attn2_q|"
     r"attn2_k|attn2_v)/kernel$", P("fsdp", "tensor")),
    (r".*/(output|to_out|attn1_out|attn2_out|out_proj)/kernel$",
     P("tensor", "fsdp")),
    # --- convs: shard output channels over fsdp only (small)
    (r".*/kernel$", P(None,)),
    (r".*", P()),
)


def make_mesh(
    data: int = -1, fsdp: int = 1, tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, fsdp, tensor) mesh. ``data=-1`` = all remaining."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    assert data * fsdp * tensor == n, (data, fsdp, tensor, n)
    arr = np.asarray(devices).reshape(data, fsdp, tensor)
    return Mesh(arr, ("data", "fsdp", "tensor"))


def _fit_spec(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Right-align ``spec`` to the trailing dims (a `scan_layers` stack adds
    a leading n_blocks axis that must stay replicated) and drop sharding on
    axes that don't divide the dimension."""
    lead = max(0, len(shape) - len(spec))
    out = [None] * lead
    for i, dim in enumerate(shape[lead:]):
        ax = spec[i] if i < len(spec) else None
        if ax is None:
            out.append(None)
            continue
        size = np.prod([mesh.shape[a] for a in
                        (ax if isinstance(ax, tuple) else (ax,))])
        out.append(ax if dim % size == 0 else None)
    return P(*out)


def spec_for_path(path: str, shape: Tuple[int, ...], mesh: Mesh,
                  rules=DEFAULT_RULES) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return _fit_spec(spec, shape, mesh)
    return P()


def params_shardings(params, mesh: Mesh, rules=DEFAULT_RULES):
    """Pytree of NamedShardings matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    specs = {
        path_str(kp): spec_for_path(path_str(kp), np.shape(v), mesh, rules)
        for kp, v in flat
    }

    def to_sharding(kp, v):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over (data, fsdp) — fsdp is a second data axis for
    activations (ZeRO semantics)."""
    return NamedSharding(mesh, P(("data", "fsdp")))
