import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.models.mmfs import MMFS


def make_mmfs(**kw):
    defaults = dict(
        d_model=32,
        d_query=24,
        d_value=16,
        d_out=24,
        n_heads=4,
        n_points=4,
        ratio=0.5,
        level_shapes=((8, 8), (4, 4)),
        base_spatial_shape=8,
        max_num_image_per_seq=10,
    )
    defaults.update(kw)
    return MMFS(**defaults)


def init_inputs(seed=0, B=2, Lq=6, n_img=3):
    rng = np.random.RandomState(seed)
    hw = 8 * 8 + 4 * 4
    query = rng.randn(B, Lq, 24).astype(np.float32)
    feats = rng.randn(B, n_img, hw, 16).astype(np.float32)
    mask = np.ones((B, Lq, n_img), dtype=np.int32)
    return jnp.array(query), jnp.array(feats), jnp.array(mask)


def test_shapes_and_grad():
    m = make_mmfs()
    q, f, mask = init_inputs()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), q, f, mask)
    out = m.apply(params, q, f, mask)
    assert out.shape == (2, 6, 24)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return (m.apply(p, q, f, mask) ** 2).sum()

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)
    # sampling_offsets kernel is zero-init but must receive gradient
    gk = g["params"]["sampling_offsets"]["kernel"]
    assert np.abs(np.asarray(gk)).sum() > 0


def test_masked_images_do_not_leak():
    """Garbage features behind the mask must not change the output."""
    m = make_mmfs()
    q, f, mask = init_inputs(n_img=3)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), q, f, mask)

    mask = mask.at[:, :, 2].set(0)
    out1 = m.apply(params, q, f, mask)
    f_garbage = f.at[:, 2].set(1e3)
    out2 = m.apply(params, q, f_garbage, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_2d_mask_equals_broadcast_3d():
    m = make_mmfs()
    q, f, _ = init_inputs()
    mask2 = jnp.array([[1, 1, 0], [1, 0, 0]], dtype=jnp.int32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), q, f, mask2)
    out2d = m.apply(params, q, f, mask2)
    mask3 = jnp.broadcast_to(mask2[:, None, :], (2, 6, 3))
    out3d = m.apply(params, q, f, mask3)
    np.testing.assert_allclose(np.asarray(out2d), np.asarray(out3d), atol=1e-6)


def test_ignore_slot_dominates_when_all_masked():
    """With every image masked, only the (zero) ignore token contributes,
    so the output is just the output_proj bias."""
    m = make_mmfs()
    q, f, mask = init_inputs()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), q, f, mask)
    out = m.apply(params, q, f, jnp.zeros_like(mask))
    bias = np.asarray(params["params"]["output_proj"]["bias"])
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(bias, out.shape), atol=1e-5
    )


def test_reference_points_grid():
    """Per-query reference points (UNet branch) shift sampling as expected."""
    m = make_mmfs()
    q, f, mask = init_inputs(B=1, Lq=4, n_img=1)
    ref = jnp.array(
        [[[0.1, 0.1], [0.9, 0.1], [0.1, 0.9], [0.9, 0.9]]], dtype=jnp.float32
    )
    params = jax.jit(m.init)(jax.random.PRNGKey(0), q, f, mask)
    out_center = m.apply(params, q, f, mask)
    out_grid = m.apply(params, q, f, mask, reference_points=ref)
    assert out_grid.shape == out_center.shape
    assert np.abs(np.asarray(out_grid) - np.asarray(out_center)).max() > 1e-6
