import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_interleaved_tpu.models.vit import ViTConfig
from mm_interleaved_tpu.models.vit_adapter import (
    CLIPViTAdapter,
    ViTAdapterConfig,
)
from mm_interleaved_tpu.models.perceiver import PerceiverConfig, PerceiverResampler
from mm_interleaved_tpu.models.visual_tokenizer import (
    VisualTokenizer,
    VisualTokenizerConfig,
)

TINY_VIT = ViTConfig(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    patch_size=14,
    image_size=56,  # grid 4
)
TINY_ADAPTER = ViTAdapterConfig(vit=TINY_VIT, conv_inplane=8, extra_extractors=1)
TINY_PERCEIVER = PerceiverConfig(
    num_queries=6,
    hidden_size=16,
    encoder_hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    cross_attention_frequency=2,
    qk_normalization=True,
)


def test_adapter_pyramid_shapes():
    m = CLIPViTAdapter(TINY_ADAPTER)
    x = jnp.array(np.random.RandomState(0).rand(2, 56, 56, 3).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    last, pyr = m.apply(params, x)
    g = TINY_VIT.grid_size
    assert last.shape == (2, g * g + 1, 32)
    assert [f.shape for f in pyr] == [
        (2, 4 * g, 4 * g, 32),
        (2, 2 * g, 2 * g, 32),
        (2, g, g, 32),
        (2, g // 2, g // 2, 32),
    ]
    for f in pyr:
        assert np.isfinite(np.asarray(f)).all()


def test_perceiver_resampler():
    m = PerceiverResampler(TINY_PERCEIVER)
    enc = jnp.array(np.random.RandomState(0).randn(3, 10, 32).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), enc)
    out = m.apply(params, enc)
    assert out.shape == (3, 6, 16)
    # encoder mask: masking padding must not change output given same content
    mask = jnp.ones((3, 10), jnp.int32)
    out_m = m.apply(params, enc, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_m), atol=1e-6)


def test_visual_tokenizer_end_to_end():
    cfg = VisualTokenizerConfig(
        encoder=TINY_ADAPTER,
        perceiver=TINY_PERCEIVER,
        llm_hidden_size=24,
        grid_size=TINY_VIT.grid_size,
    )
    m = VisualTokenizer(cfg)
    x = jnp.array(np.random.RandomState(0).rand(2, 56, 56, 3).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["vis_embed"].shape == (2, 6, 24)
    g = TINY_VIT.grid_size
    assert out["image_embeds"].shape == (2, g * g, 32)
    assert len(out["multiscale_features"]) == 4
    assert np.isfinite(np.asarray(out["vis_embed"])).all()
