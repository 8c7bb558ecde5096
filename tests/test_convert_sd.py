"""SD converter structure test: the converted tree must cover exactly the
flax UNet/VAE parameter tree (minus MMFSNet, which has no diffusers source).
Shapes are asserted by `merge_params` at real load time; this test pins the
name mapping against our modules."""

import re
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.models.sd.unet import UNet2DConditionModel, UNetConfig
from mm_interleaved_tpu.models.sd.vae import AutoencoderKL, VAEConfig
from mm_interleaved_tpu.utils.convert_sd import convert_sd_unet, convert_sd_vae


class FakeSD(dict):
    """Returns a fresh array for any requested key and records it."""

    def __missing__(self, key):
        v = np.zeros((2, 2, 2, 2), np.float32)
        self[key] = v
        return v

    def __contains__(self, key):
        # emulate optional keys: conv_shortcut/time_emb_proj always "present"
        return True


def tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out |= tree_paths(v, p)
        else:
            out.add(p)
    return out


def test_unet_converter_covers_param_tree():
    cfg = UNetConfig(
        sample_size=4, block_out_channels=(16, 32), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=8, norm_num_groups=4,
        mmfs=None,
    )
    m = UNet2DConditionModel(cfg)
    lat = jnp.zeros((1, 4, 4, 4))
    params = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 3, 16)))
    )["params"]
    ours = tree_paths(params)

    converted = convert_sd_unet(FakeSD(), n_blocks=2, layers_per_block=1)
    theirs = tree_paths(converted)

    # converter must produce a key set that covers our tree exactly, except
    # optional conv_shortcut entries on blocks where channels match
    missing = {p for p in ours - theirs}
    extra = {
        p for p in theirs - ours if "conv_shortcut" not in p
    }
    assert not missing, f"converter misses params: {sorted(missing)[:10]}"
    assert not extra, f"converter invents params: {sorted(extra)[:10]}"


def test_vae_converter_covers_param_tree():
    cfg = VAEConfig(block_out_channels=(8, 16, 16), layers_per_block=1,
                    norm_num_groups=4)
    m = AutoencoderKL(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), x, rng=jax.random.PRNGKey(1))
    )["params"]
    ours = tree_paths(params)

    converted = convert_sd_vae(FakeSD(), n_blocks=3, layers_per_block=1)
    theirs = tree_paths(converted)

    missing = ours - theirs
    extra = {p for p in theirs - ours if "conv_shortcut" not in p
             and "time_emb_proj" not in p}
    assert not missing, f"converter misses params: {sorted(missing)[:10]}"
    assert not extra, f"converter invents params: {sorted(extra)[:10]}"
