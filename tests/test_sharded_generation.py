"""Sharded (TP/FSDP) generation on the 8-virtual-device CPU mesh.

The flagship (13B-class) presets cannot decode on one chip (VERDICT r2
item 2; reference runs all benchmarks on Vicuna-13B, `inference.py:282-302`).
These tests pin the mesh-aware generation runtime:

  * greedy decode under a (2, 2, 2) (data, fsdp, tensor) mesh produces the
    SAME tokens as the unsharded path (GSPMD collectives are exact for
    matmul partitioning up to fp reassociation; argmax over fp32 logits on
    a tiny model is stable);
  * the KV cache honours the tensor/data constraints;
  * diffusion sampling runs sharded end-to-end and matches unsharded
    within fp tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.generation.text import (
    TextGenerationConfig,
    generate_texts,
)
from mm_interleaved_tpu.parallel.partition import make_mesh
from mm_interleaved_tpu.parallel.inference import (
    ShardedGenerator,
    constrain,
    generation_mesh,
)

CFG = tiny_config(with_image_decoder=True)
S = CFG.special
NTOK = CFG.num_img_token


def _batch(B=4, L=16):
    rng = np.random.RandomState(0)
    row = [S.bos_token_id, 5, S.soi_token_id] + [S.image_token_id] * NTOK + [
        7, 8,
    ]
    pad = L - len(row)
    ids = np.tile(
        np.asarray([S.pad_token_id] * pad + row, np.int32), (B, 1)
    )
    ids[1:, pad + 1] = 9  # de-duplicate rows a bit
    att = (ids != S.pad_token_id).astype(np.int32)
    att[:, :pad] = 0
    return dict(
        text_ids=jnp.asarray(ids),
        image_tensors=jnp.asarray(
            rng.rand(B, CFG.max_num_images, 56, 56, 3).astype(np.float32)
        ),
        num_image_per_seq=jnp.ones((B,), jnp.int32),
        attention_mask=jnp.asarray(att),
    )


@pytest.fixture(scope="module")
def setup():
    model = MMInterleaved(CFG)
    batch = _batch()
    variables = jax.jit(model.init)(
        {
            "params": jax.random.PRNGKey(0),
            "noise": jax.random.PRNGKey(1),
        },
        **batch,
        image_tensors_dec=jnp.zeros(
            (4, CFG.max_num_images, 16, 16, 3), jnp.float32
        ),
    )
    return model, variables, batch


def test_constrain_noop_without_mesh():
    x = jnp.ones((4, 8))
    y = constrain(x, ("data", "fsdp"), "tensor")
    assert y is x


def test_constrain_drops_nondividing_axes():
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    x = jnp.ones((3, 8))  # 3 not divisible by 4 -> data/fsdp dropped
    with generation_mesh(mesh):
        y = constrain(x, ("data", "fsdp"), "tensor")
    assert y.shape == x.shape


def test_sharded_greedy_matches_unsharded(setup):
    model, variables, batch = setup
    cfg = TextGenerationConfig(
        max_new_tokens=5,
        eos_token_ids=(S.eos_token_id, S.soi_token_id),
        pad_token_id=S.pad_token_id,
    )
    want = np.asarray(generate_texts(
        model, variables, batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"], batch["attention_mask"], cfg,
    ))

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    gen = ShardedGenerator(model, variables, mesh)
    got = gen.generate_texts(
        batch["text_ids"], batch["image_tensors"],
        batch["num_image_per_seq"], batch["attention_mask"], cfg,
    )
    # outputs live on the mesh; every shard must agree after gather
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sharded_params_actually_sharded(setup):
    model, variables, _ = setup
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    gen = ShardedGenerator(model, variables, mesh)
    flat = jax.tree_util.tree_flatten_with_path(gen.variables)[0]
    n_sharded = sum(
        1 for _, v in flat
        if hasattr(v, "sharding") and not v.sharding.is_fully_replicated
    )
    assert n_sharded > 10, f"only {n_sharded} sharded params"


def test_sharded_diffusion_matches_unsharded(setup):
    """Sharded end-to-end image generation parity.

    Root-caused in round 4: the former 5e-2/5e-3 flakiness was NOT in the
    sharded denoise loop (pre-VAE latents match unsharded to ~2e-6) but
    entirely in the **bf16 VAE decode** (`vae_decode_dtype="bfloat16"`,
    image_decoder.py): the sharded and unsharded programs fuse/reassociate
    the bf16 conv chain differently, and with bit-identical latent inputs
    the decoded images already differ by ~1.4e-2 max-abs — ordinary bf16
    resolution (~0.4% ulp) through ~10 conv+GroupNorm layers, identical
    whether the latents came from the sharded or unsharded loop.

    So the parity pin runs the same variables through an fp32-decode config
    (dtype is compute-only; the param tree is unchanged) where GSPMD
    reassociation is ~1e-6 — a TIGHT end-to-end assertion on the sharded
    runtime itself — plus a documented bf16-resolution tolerance on the
    product-default bf16 path.
    """
    import dataclasses

    from mm_interleaved_tpu.generation.diffusion import generate_images

    model, variables, batch = setup
    args = (batch["text_ids"], batch["image_tensors"],
            batch["num_image_per_seq"], batch["attention_mask"])
    cfg32 = dataclasses.replace(
        CFG, image_decoder=dataclasses.replace(
            CFG.image_decoder, vae_decode_dtype="float32"
        )
    )
    model32 = MMInterleaved(cfg32)

    def unsharded(m):
        ctx, ctx_mask, mmfs_vals, mmfs_mask = m.apply(
            variables, *args, method=m.generate_image_inputs,
        )
        return np.asarray(generate_images(
            m, variables, ctx, ctx_mask, jax.random.PRNGKey(7),
            mmfs_values=mmfs_vals, mmfs_mask=mmfs_mask,
            num_inference_steps=2, guidance_scale=3.0,
        ))

    mesh = make_mesh(data=2, fsdp=2, tensor=2)

    # tight pin: fp32 VAE decode isolates the sharded runtime from bf16
    # fusion-order noise
    want32 = unsharded(model32)
    got32 = np.asarray(ShardedGenerator(model32, variables, mesh)
                       .generate_images(
        *args, rng=jax.random.PRNGKey(7),
        num_inference_steps=2, guidance_scale=3.0,
    ))
    assert got32.shape == want32.shape
    np.testing.assert_allclose(got32, want32, rtol=1e-4, atol=1e-5)

    # product path (bf16 VAE decode): atol = bf16 reassociation envelope on
    # [0,1] images, measured 1.4e-2 max-abs with identical latents
    want = unsharded(model)
    got = np.asarray(ShardedGenerator(model, variables, mesh)
                     .generate_images(
        *args, rng=jax.random.PRNGKey(7),
        num_inference_steps=2, guidance_scale=3.0,
    ))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-2)
