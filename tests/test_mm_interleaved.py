import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

CFG = tiny_config()
S = CFG.special
NTOK = CFG.num_img_token  # 4


def build_row(L, docs):
    row = []
    for doc in docs:
        row.append(S.bos_token_id)
        for t in doc:
            if t == "I":
                row.extend([S.soi_token_id] + [S.image_token_id] * NTOK)
            else:
                row.append(t)
        row.append(S.eos_token_id)
    assert len(row) <= L
    return row + [S.pad_token_id] * (L - len(row))


def example_batch(L=40, max_img=3, seed=0):
    rng = np.random.RandomState(seed)
    rows = [
        build_row(L, [[5, 6, "I", 7], [8, "I", 9, 10]]),
        build_row(L, [[11, "I", 12, 13, 14]]),
    ]
    ids = np.array(rows, dtype=np.int32)
    n_img = np.array([2, 1], dtype=np.int32)
    imgs = rng.rand(2, max_img, 56, 56, 3).astype(np.float32)
    imgs_dec = rng.rand(2, max_img, 16, 16, 3).astype(np.float32)
    att = (ids != S.pad_token_id).astype(np.int32)
    return dict(
        text_ids=jnp.array(ids),
        image_tensors=jnp.array(imgs),
        num_image_per_seq=jnp.array(n_img),
        attention_mask=jnp.array(att),
        image_tensors_dec=jnp.array(imgs_dec),
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = MMInterleaved(CFG)
    batch = example_batch()
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        **batch,
    )
    return model, params, batch


def test_forward_losses(model_and_params):
    model, params, batch = model_and_params
    out = model.apply(
        params, **batch, deterministic=False,
        rngs={"noise": jax.random.PRNGKey(3),
              "dropout": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["loss_txt"]))
    assert np.isfinite(float(out["loss_img"]))
    assert float(out["loss_txt"]) > 0
    # joint loss = txt*w_txt + img*w_img
    np.testing.assert_allclose(
        float(out["loss"]),
        float(out["loss_txt"]) * CFG.loss_txt_weight
        + float(out["loss_img"]) * CFG.loss_img_weight,
        rtol=1e-5,
    )


def test_forward_jits_and_grads(model_and_params):
    model, params, batch = model_and_params

    @jax.jit
    def loss_fn(p, batch):
        out = model.apply(
            p, **batch, deterministic=False,
            rngs={"noise": jax.random.PRNGKey(3),
                  "dropout": jax.random.PRNGKey(4)},
        )
        return out["loss"]

    g = jax.grad(loss_fn)(params, batch)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # gradient flows to the llama cross-attn gate and the soi token
    dec = g["params"]["mm_decoder"]
    # scanned layout keeps cross-attn under block/layer_0 with a leading
    # n_blocks axis; unrolled keeps layers_0
    gate = (dec["block"]["layer_0"]["llama_cross_attn"]["gate"]
            if "block" in dec
            else dec["layers_0"]["llama_cross_attn"]["gate"])
    assert np.abs(np.asarray(gate)).sum() > 0
    soi = g["params"]["soi_token"]
    assert np.abs(np.asarray(soi)).sum() > 0


def test_generate_image_inputs(model_and_params):
    model, params, batch = model_and_params
    ctx, ctx_mask, mmfs_vals, mmfs_mask = model.apply(
        params,
        batch["text_ids"],
        batch["image_tensors"],
        batch["num_image_per_seq"],
        batch["attention_mask"],
        method=model.generate_image_inputs,
    )
    B, max_img = 2, 3
    assert ctx.shape[0] == B * max_img
    assert ctx.shape[1] == CFG.max_context_len
    hw = 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2
    assert mmfs_vals.shape == (B * max_img, 1, hw, 32)
    assert mmfs_mask.shape == (B * max_img, 1)
    # row 0 has 2 images in separate docs -> no previous-image context;
    # row 1 single image -> none either
    assert np.asarray(mmfs_mask).sum() == 0


def test_diffusion_sampler_smoke(model_and_params):
    from mm_interleaved_tpu.generation.diffusion import generate_images

    model, params, batch = model_and_params
    ctx, ctx_mask, mmfs_vals, mmfs_mask = model.apply(
        params,
        batch["text_ids"],
        batch["image_tensors"],
        batch["num_image_per_seq"],
        batch["attention_mask"],
        method=model.generate_image_inputs,
    )
    # sample for the first 2 target images only (keep the test fast)
    imgs = generate_images(
        model, params, ctx[:2], ctx_mask[:2],
        rng=jax.random.PRNGKey(0),
        mmfs_values=mmfs_vals[:2], mmfs_mask=mmfs_mask[:2],
        num_inference_steps=3, guidance_scale=2.0,
    )
    assert imgs.shape == (2, 16, 16, 3)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1


def test_direct_mmfs_projections_match_capture_pass(model_and_params):
    """`compute_mmfs_projections` (direct MMFSNet pass with 1x1 dummy
    queries) must reproduce the projections a full UNet capture pass sows —
    the denoise loop hoists them assuming query-independence."""
    import jax.numpy as jnp

    from mm_interleaved_tpu.generation.diffusion import (
        _extract_mmfs_projections,
        compute_mmfs_projections,
    )

    model, params, batch = model_and_params
    _, _, mmfs_vals, mmfs_mask = model.apply(
        params,
        batch["text_ids"],
        batch["image_tensors"],
        batch["num_image_per_seq"],
        batch["attention_mask"],
        method=model.generate_image_inputs,
    )
    # mark one image valid so the mask path is non-trivial
    mmfs_mask = mmfs_mask.at[0, 0].set(1)
    dcfg = model.cfg.image_decoder

    direct = compute_mmfs_projections(
        model, params, lambda m: m.image_decoder, dcfg.unet,
        mmfs_vals, mmfs_mask,
    )
    n_down = len(dcfg.unet.down_residual_spec()[0])
    assert direct is not None and len(direct) == n_down + 1  # down + mid

    B = mmfs_vals.shape[0]
    dummy = jnp.zeros(
        (B, dcfg.latent_size, dcfg.latent_size,
         dcfg.vae.latent_channels), jnp.float32,
    )
    ctx = jnp.zeros(
        (B, dcfg.perceiver.num_queries, dcfg.unet.cross_attention_dim),
        jnp.float32,
    )
    _, inters = model.apply(
        params, dummy, jnp.zeros((B,), jnp.int32), ctx,
        mmfs_vals, mmfs_mask,
        method=lambda m, *a: m.image_decoder.unet_pred(*a),
        mutable=["intermediates"],
    )
    captured = _extract_mmfs_projections(inters["intermediates"])
    assert len(captured) == len(direct)
    for d, c in zip(direct, captured):
        np.testing.assert_allclose(
            np.asarray(d, np.float32), np.asarray(c, np.float32),
            rtol=1e-5, atol=1e-6,
        )
