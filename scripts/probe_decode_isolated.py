"""Isolated decode-loop timing: bf16 vs int8 weight-only (VERDICT r3 #6).

bench.py's `text_half` times encoder + prefill + 32-token decode together,
so fixed prefill/encode cost dilutes the int8 signal.  This probe runs the
prefill ONCE outside the timed region, then times a jitted lax.scan of
N pure `lm_decode_step` calls (same loop body as generation/text.py
without the sampling extras) — the weight-read-bound region int8 targets.

Scalar-only host pulls; relay floor subtracted via a no-op jit.
"""
import sys

sys.path.insert(0, "/root/repo")
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.configs import base_config
from mm_interleaved_tpu.generation.text import extract_vision_values
from mm_interleaved_tpu.models.llama import KVCache
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.ops.ms_deform_attn import pallas_deform_inference

B = int(os.environ.get("PROBE_B", "8"))
N_TOK = int(os.environ.get("PROBE_TOKENS", "32"))
TRIALS = 4

cfg = base_config(seq_len=512, max_num_images=2, remat=False)
model = MMInterleaved(cfg)
S = cfg.special
ntok = cfg.num_img_token
rng = np.random.RandomState(0)
L = 128
row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * ntok
row += list(rng.randint(10, 30000, size=L - len(row)))
ids = jnp.asarray(np.tile(np.asarray(row[:L], np.int32), (B, 1)))
enc = cfg.visual.encoder.vit.image_size
batch = dict(
    text_ids=ids,
    image_tensors=jnp.asarray(
        rng.rand(B, cfg.max_num_images, enc, enc, 3).astype(np.float32)
    ),
    num_image_per_seq=jnp.ones((B,), jnp.int32),
    attention_mask=jnp.ones_like(ids),
)
variables = jax.jit(
    lambda r, b: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.init(r, **b),
    )
)({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
   "dropout": jax.random.PRNGKey(2)}, batch)


def prefill(variables):
    prep = model.apply(
        variables, batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"],
        method=lambda m, t, i, n: m.prepare_mm_embeds(t, i, n),
    )
    cache = KVCache.create(model.cfg.llm, B, L + N_TOK)
    with pallas_deform_inference():
        (logits, _, cache), inters = model.apply(
            variables, prep["mm_embeds"], batch["attention_mask"],
            prep["mmfs_values"], prep["cross_attention_mask"], cache,
            method=model.lm_prefill, mutable=["intermediates"],
        )
    vvc = extract_vision_values(model, inters)
    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    cross = prep["cross_attention_mask"]
    decode_cross = cross[:, -1:, :] if cross is not None else None
    return tok0, cache, vvc, decode_cross


def decode_scan(variables, tok0, cache, vvc, decode_cross):
    def body(carry, _):
        tok, cache = carry
        logits, cache = model.apply(
            variables, tok[:, None], jnp.ones((B, 1), jnp.int32),
            None, decode_cross, cache, vvc,
            method=model.lm_decode_step,
        )
        return (jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache), None

    (tok, _), _ = jax.lax.scan(body, (tok0, cache), None, length=N_TOK)
    return tok


def timeit(jitted, *args):
    def sync(r):
        return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])

    sync(jitted(*args))
    best = 1e9
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        sync(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


floor = timeit(jax.jit(lambda x: x + 1.0), jnp.float32(0))
print(f"relay floor: {floor:6.1f} ms", flush=True)

state = jax.jit(prefill)(variables)
scan_jit = jax.jit(decode_scan)
t_bf16 = timeit(scan_jit, variables, *state) - floor
print(f"decode scan alone bf16  B{B} x{N_TOK} tok: {t_bf16:7.1f} ms "
      f"({t_bf16 / N_TOK:5.2f} ms/tok, "
      f"{B * N_TOK / t_bf16 * 1e3:6.0f} tok/s)", flush=True)

from mm_interleaved_tpu.ops.quant import quantize_llm_weights

qvars = jax.jit(quantize_llm_weights)(variables)
qstate = jax.jit(prefill)(qvars)
t_int8 = timeit(scan_jit, qvars, *qstate) - floor
print(f"decode scan alone int8  B{B} x{N_TOK} tok: {t_int8:7.1f} ms "
      f"({t_int8 / N_TOK:5.2f} ms/tok, "
      f"{B * N_TOK / t_int8 * 1e3:6.0f} tok/s)  speedup "
      f"{t_bf16 / t_int8:4.2f}x", flush=True)

# weight-byte model: what fraction of the step is weight reads
n_llm = sum(
    x.size for x in jax.tree_util.tree_leaves(variables["params"])
)
print(f"(total params {n_llm/1e9:.2f}B; bf16 weight-read floor "
      f"{2 * n_llm / 400e9 * 1e3:5.2f} ms/tok at 400 GB/s sustained)",
      flush=True)
