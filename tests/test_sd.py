import numpy as np
import jax
import jax.numpy as jnp

from mm_interleaved_tpu.models.sd.scheduler import DiffusionSchedule
from mm_interleaved_tpu.models.sd.vae import AutoencoderKL, VAEConfig
from mm_interleaved_tpu.models.sd.unet import (
    UNet2DConditionModel,
    UNetConfig,
    timestep_embedding,
)
from mm_interleaved_tpu.models.sd.mmfs_net import MMFSNetConfig

TINY_VAE = VAEConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                     norm_num_groups=4)
TINY_MMFS = MMFSNetConfig(
    input_channel=32, attn_dim=32, n_heads=4, n_points=2,
    feat_spatial_shapes=(16, 8, 4, 2), max_num_image_per_seq=4,
    pos_grid_size=4,
)
TINY_UNET = UNetConfig(
    sample_size=4, block_out_channels=(16, 32), layers_per_block=1,
    cross_attention_dim=16, attention_head_dim=8, norm_num_groups=4,
    mmfs=TINY_MMFS,
)


def test_schedule_math():
    s = DiffusionSchedule(num_train_timesteps=50)
    ac = np.asarray(s.alphas_cumprod())
    assert ac.shape == (50,)
    assert np.all(np.diff(ac) < 0) and ac[0] < 1.0 and ac[-1] > 0.0

    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.full((2, 4, 4, 4), 0.5)
    t = jnp.array([0, 49])
    xt = np.asarray(s.add_noise(x0, noise, t))
    want0 = np.sqrt(ac[0]) * 1.0 + np.sqrt(1 - ac[0]) * 0.5
    np.testing.assert_allclose(xt[0], want0, rtol=1e-5)

    # v-prediction roundtrip: x0 recovered from (sample, v)
    sv = DiffusionSchedule(num_train_timesteps=50,
                           prediction_type="v_prediction")
    v = sv.get_velocity(x0, noise, t)
    x0_rec, eps_rec = sv._pred_x0_eps(
        v[0], s.add_noise(x0, noise, t)[0], t[0]
    )
    np.testing.assert_allclose(np.asarray(x0_rec), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_rec), 0.5, rtol=1e-4)


def test_ddim_perfect_eps_recovers_x0():
    s = DiffusionSchedule(num_train_timesteps=100)
    x0 = jnp.array(np.random.RandomState(0).randn(1, 4, 4, 4).astype(np.float32))
    noise = jnp.array(np.random.RandomState(1).randn(1, 4, 4, 4).astype(np.float32))
    t = jnp.array([60])
    xt = s.add_noise(x0, noise, t)
    out = s.ddim_step(noise, t[0], jnp.array(-1), xt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_timestep_embedding_matches_diffusers_formula():
    import math
    t = jnp.array([0, 10, 999])
    emb = np.asarray(timestep_embedding(t, 8))
    half = 4
    exponent = np.exp(-math.log(10000.0) * np.arange(half) / half)
    for i, tv in enumerate([0, 10, 999]):
        want = np.concatenate(
            [np.cos(tv * exponent), np.sin(tv * exponent)]
        )
        np.testing.assert_allclose(emb[i], want, rtol=1e-5, atol=1e-6)


def test_vae_roundtrip_shapes():
    m = AutoencoderKL(TINY_VAE)
    x = jnp.array(np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    z = m.apply(params, x, jax.random.PRNGKey(1), method=m.encode)
    assert z.shape == (2, 4, 4, 4)
    out = m.apply(params, z, method=m.decode)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def make_unet_inputs(with_mmfs=True):
    rng = np.random.RandomState(0)
    lat = jnp.array(rng.randn(2, 4, 4, 4).astype(np.float32))
    t = jnp.array([3, 7])
    ctx = jnp.array(rng.randn(2, 5, 16).astype(np.float32))
    if not with_mmfs:
        return lat, t, ctx, None, None
    hw = 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2
    vals = jnp.array(rng.randn(2, 1, hw, 32).astype(np.float32))
    mask = jnp.ones((2, 1), jnp.int32)
    return lat, t, ctx, vals, mask


def test_unet_forward_and_zero_mmfs_at_init():
    m = UNet2DConditionModel(TINY_UNET)
    lat, t, ctx, vals, mask = make_unet_inputs()
    params = jax.jit(m.init)(jax.random.PRNGKey(0), lat, t, ctx, vals, mask)
    out = m.apply(params, lat, t, ctx, vals, mask)
    assert out.shape == lat.shape
    # zero-init MMFS output conv -> mmfs must be a no-op at init
    out_none = m.apply(params, lat, t, ctx, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_none), atol=1e-5)

    # ...but gradients must flow into the mmfs blocks
    def loss(p):
        return (m.apply(p, lat, t, ctx, vals, mask) ** 2).sum()

    g = jax.grad(loss)(params)
    conv_k = g["params"]["mmfs_net"]["mid_block"]["conv"]["kernel"]
    assert np.abs(np.asarray(conv_k)).sum() > 0
