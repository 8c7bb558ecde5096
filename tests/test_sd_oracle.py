"""Numerical parity of the SD tower against a torch oracle (VERDICT r2 #4).

`tests/_reference_sd.py` re-creates diffusers' UNet2DConditionModel /
AutoencoderKL math in torch.nn with diffusers state-dict naming; here we run
`convert_sd_unet` / `convert_sd_vae` over the oracle's ``state_dict()`` and
assert the flax forward matches the torch forward.  A transpose/flip/eps
error anywhere in `utils/convert_sd.py` or the flax modules now fails a
test instead of silently ruining image parity with released SD-2.1 weights
(reference `models/decoders/sd.py:48-71`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from mm_interleaved_tpu.models.sd.unet import UNet2DConditionModel, UNetConfig
from mm_interleaved_tpu.models.sd.vae import AutoencoderKL, VAEConfig
from mm_interleaved_tpu.utils.convert_sd import convert_sd_unet, convert_sd_vae

from _reference_sd import TorchMiniUNet, TorchMiniVAE


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_unet_forward_parity():
    torch.manual_seed(0)
    oracle = TorchMiniUNet(
        in_ch=4, out_ch=4, block_out=(16, 32), layers_per_block=1,
        ctx_dim=16, head_dim=8, groups=4,
    ).eval()
    # break the zero-init symmetry of biases/norms
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    cfg = UNetConfig(
        sample_size=8, block_out_channels=(16, 32), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=8, norm_num_groups=4,
        mmfs=None,
    )
    flax_model = UNet2DConditionModel(cfg)
    params = convert_sd_unet(_sd(oracle), n_blocks=2, layers_per_block=1)

    rng = np.random.RandomState(1)
    lat = rng.randn(2, 8, 8, 4).astype(np.float32)
    t = np.asarray([7, 400], np.int64)
    ctx = rng.randn(2, 5, 16).astype(np.float32)

    with torch.no_grad():
        want = oracle(
            torch.from_numpy(lat).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
        ).permute(0, 2, 3, 1).numpy()

    got = np.asarray(flax_model.apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray(t.astype(np.int32)),
        jnp.asarray(ctx),
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vae_roundtrip_parity():
    torch.manual_seed(1)
    oracle = TorchMiniVAE(
        block_out=(8, 16, 16), layers_per_block=1, groups=4
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    cfg = VAEConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                    norm_num_groups=4)
    flax_model = AutoencoderKL(cfg)
    params = convert_sd_vae(_sd(oracle), n_blocks=3, layers_per_block=1)

    rng = np.random.RandomState(2)
    img = rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        mean_t = oracle.encode_mean(
            torch.from_numpy(img).permute(0, 3, 1, 2)
        )
        dec_t = oracle.decode(mean_t).permute(0, 2, 3, 1).numpy()
        mean_t = mean_t.permute(0, 2, 3, 1).numpy()

    # flax encode(sample=False) returns mean * scaling_factor
    z = np.asarray(flax_model.apply(
        {"params": params}, jnp.asarray(img), sample=False,
        method=flax_model.encode,
    ))
    np.testing.assert_allclose(
        z / cfg.scaling_factor, mean_t, rtol=1e-4, atol=1e-4
    )
    got = np.asarray(flax_model.apply(
        {"params": params}, jnp.asarray(z), method=flax_model.decode,
    ))
    np.testing.assert_allclose(got, dec_t, rtol=1e-4, atol=1e-4)


def test_converter_transpose_error_is_caught():
    """Sanity: corrupting one conv kernel's layout must break parity — the
    oracle has discriminating power."""
    torch.manual_seed(2)
    oracle = TorchMiniUNet(
        in_ch=4, out_ch=4, block_out=(16, 32), layers_per_block=1,
        ctx_dim=16, head_dim=8, groups=4,
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    cfg = UNetConfig(
        sample_size=8, block_out_channels=(16, 32), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=8, norm_num_groups=4,
        mmfs=None,
    )
    flax_model = UNet2DConditionModel(cfg)
    params = convert_sd_unet(_sd(oracle), n_blocks=2, layers_per_block=1)
    # simulate a transpose bug in the mid attention out projection
    bad = np.asarray(params["mid_attn"]["block"]["attn1_out"]["kernel"]).T
    params["mid_attn"]["block"]["attn1_out"]["kernel"] = bad

    rng = np.random.RandomState(3)
    lat = rng.randn(1, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(1, 5, 16).astype(np.float32)
    with torch.no_grad():
        want = oracle(
            torch.from_numpy(lat).permute(0, 3, 1, 2),
            torch.tensor([3]), torch.from_numpy(ctx),
        ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(flax_model.apply(
        {"params": params}, jnp.asarray(lat), jnp.asarray([3], jnp.int32),
        jnp.asarray(ctx),
    ))
    assert not np.allclose(got, want, rtol=1e-3, atol=1e-3)
