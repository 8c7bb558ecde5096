"""Full released-checkpoint converter tests.

1) Coverage: `convert_mm_interleaved` over a synthetic reference state dict
   must produce *exactly* the paths of our initialised MMInterleaved tree
   (every param loadable, nothing unknown).
2) Numeric: our PerceiverResampler after `convert_perceiver` matches HF's
   `Blip2QFormerModel` (the module the reference wraps, decoders/perceiver.py)
   on CPU; our UNet-side MMFSBlock after `convert_mmfs_block` matches the
   reference `sd_mmfs.MMFSBlock` run with its pure-torch deformable fallback.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.models.perceiver import (
    PerceiverConfig,
    PerceiverResampler,
)
from mm_interleaved_tpu.utils.convert_hf import merge_params
from mm_interleaved_tpu.utils import convert_ref

from _reference import load_reference_llama


class FakeSD(dict):
    """Returns a fresh array for any requested key; `in` checks go through a
    key filter so layer-presence probes behave like the real state dict."""

    def __init__(self, key_filter=None):
        super().__init__()
        self._filter = key_filter or (lambda k: True)

    def __missing__(self, key):
        v = np.zeros((2, 2, 2, 2), np.float32)
        self[key] = v
        return v

    def __contains__(self, key):
        return self._filter(key)


def tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out |= tree_paths(v, p)
        else:
            out.add(p)
    return out


@pytest.mark.slow
def test_full_converter_covers_model_tree():
    cfg = tiny_config(with_image_decoder=True)
    model = MMInterleaved(cfg)
    S = cfg.special
    ids = np.full((1, 16), 5, np.int32)
    ids[0, 0] = S.bos_token_id
    ids[0, 1] = S.soi_token_id
    ids[0, 2 : 2 + cfg.num_img_token] = S.image_token_id
    enc = cfg.visual.encoder.vit.image_size
    variables = jax.eval_shape(
        lambda: model.init(
            {
                "params": jax.random.PRNGKey(0),
                "noise": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2),
            },
            text_ids=jnp.asarray(ids),
            image_tensors=jnp.zeros(
                (1, cfg.max_num_images, enc, enc, 3), jnp.float32
            ),
            num_image_per_seq=jnp.ones((1,), jnp.int32),
            attention_mask=jnp.ones_like(jnp.asarray(ids)),
            image_tensors_dec=jnp.zeros(
                (1, cfg.max_num_images, cfg.image_decoder.image_size,
                 cfg.image_decoder.image_size, 3),
                jnp.float32,
            ),
        )
    )

    freq = cfg.llm.cross_attention_frequency

    def key_filter(key):
        if ".llama_cross_attn." in key:
            layer = int(key.split("layers.")[1].split(".")[0])
            return layer % freq == 0
        return True

    sd = FakeSD(key_filter)
    converted = convert_ref.convert_mm_interleaved(sd, cfg)

    got = tree_paths(converted)
    want = tree_paths(variables["params"])
    # FakeSD answers `in` for every key, so the converter emits the *optional*
    # torch keys (resnet conv_shortcut when channels differ, time_emb_proj in
    # UNet-only resnets) everywhere; a real state dict only has them where our
    # tree does.  Everything else must match exactly.
    extra = {
        p for p in got - want
        if "/conv_shortcut/" not in p and "/time_emb_proj/" not in p
    }
    missing = want - got
    assert not missing and not extra, (
        f"missing={sorted(missing)[:10]} extra={sorted(extra)[:10]}"
    )


def test_perceiver_matches_hf_blip2_qformer():
    from transformers import Blip2QFormerConfig, Blip2QFormerModel

    hf_cfg = Blip2QFormerConfig(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        encoder_hidden_size=24,
        cross_attention_frequency=2,
    )
    torch.manual_seed(0)
    hf = Blip2QFormerModel(hf_cfg).eval()
    queries = torch.randn(1, 6, 32) * 0.02

    g = torch.Generator().manual_seed(1)
    enc = torch.randn(2, 9, 24, generator=g)
    with torch.no_grad():
        ref = hf(
            query_embeds=queries.expand(2, -1, -1),
            encoder_hidden_states=enc,
        ).last_hidden_state.numpy()

    cfg = PerceiverConfig(
        num_queries=6,
        hidden_size=32,
        encoder_hidden_size=24,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        cross_attention_frequency=2,
    )
    model = PerceiverResampler(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 9, 24), jnp.float32)
    )
    sd = {f"blip2qformer.{k}": v.detach().numpy()
          for k, v in hf.state_dict().items()}
    sd["queries"] = queries.numpy()
    converted = convert_ref.convert_perceiver(
        sd, "", num_layers=3, cross_attention_frequency=2
    )
    params = merge_params(variables["params"], converted)
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(enc.numpy()))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_mmfs_block_matches_reference():
    load_reference_llama()  # installs stub pkgs + deformable shim
    import importlib

    sd_mmfs = importlib.import_module(
        "mm_interleaved.models.decoders.sd_mmfs"
    )
    # shim the deformable core in sd_mmfs's MMFS too (module-level import)
    torch.manual_seed(0)
    ref = sd_mmfs.MMFSBlock(
        attn_dim=32,
        query_dim=16,
        feat_dim=32,
        num_heads=4,
        n_points=2,
        n_levels=2,
        grid_size=4,
        offset_init_magnitude=1,
        max_num_image_per_seq=4,
        spatial_shapes=[4, 2],
        base_spatial_shape=4,
        gradient_checkpointing=False,
    ).eval()
    with torch.no_grad():
        ref.conv.weight.normal_(std=0.1)
        ref.conv.bias.normal_(std=0.1)
        ref.mmfs.attention_weights.bias.normal_(std=0.3)

    B, n_img, Cq = 2, 3, 16
    H = W = 4
    S = 4 * 4 + 2 * 2
    g = torch.Generator().manual_seed(1)
    sample = torch.randn(B, Cq, H, W, generator=g)
    feats = torch.randn(B, n_img, S, 32, generator=g)
    mask = torch.tensor([[1, 1, 0], [1, 0, 0]], dtype=torch.long)
    with torch.no_grad():
        ref_out = ref(
            sample, feats, mask, spatial_shapes=[(4, 4), (2, 2)]
        ).numpy()  # [B, Cq, H, W] delta

    from mm_interleaved_tpu.models.sd.mmfs_net import (
        MMFSBlock,
        MMFSNetConfig,
    )

    cfg = MMFSNetConfig(
        input_channel=32,
        attn_dim=32,
        n_heads=4,
        n_points=2,
        feat_spatial_shapes=(4, 2),
        max_num_image_per_seq=4,
        pos_grid_size=4,
    )
    model = MMFSBlock(cfg, query_dim=Cq, base_spatial_shape=4)
    sample_j = jnp.asarray(np.transpose(sample.numpy(), (0, 2, 3, 1)))
    feats_j = jnp.asarray(feats.numpy())
    mask_j = jnp.asarray(mask.numpy().astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), sample_j, feats_j, mask_j)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert_ref.convert_mmfs_block(sd, "")
    params = merge_params(variables["params"], converted)
    ours = np.asarray(
        model.apply({"params": params}, sample_j, feats_j, mask_j)
    )
    ours = np.transpose(ours, (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=2e-3)
