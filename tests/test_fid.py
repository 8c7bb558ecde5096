import numpy as np
import pytest

from mm_interleaved_tpu.utils.fid import (
    clip_rerank,
    clip_similarity,
    compute_statistics,
    fid_from_features,
    frechet_distance,
)


def test_frechet_identity_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    m, s = compute_statistics(f)
    assert abs(frechet_distance(m, s, m, s)) < 1e-3  # eps regularisation


def test_fid_orders_distributions():
    rng = np.random.RandomState(0)
    real = rng.randn(800, 8)
    close = rng.randn(800, 8) * 1.05 + 0.05
    far = rng.randn(800, 8) * 3.0 + 2.0
    assert fid_from_features(real, close) < fid_from_features(real, far)


def test_clip_sim_and_rerank():
    a = np.eye(4, 8)
    sims = clip_similarity(a, a)
    np.testing.assert_allclose(sims, 1.0)
    cands = np.stack([np.ones(8), -np.ones(8), np.ones(8) * 0.5])
    assert clip_rerank(cands, np.ones(8)) in (0, 2)


def test_inception_v3_shapes():
    import jax
    from mm_interleaved_tpu.utils.inception_v3 import InceptionV3Features

    model = InceptionV3Features(resize_input=False)
    x = np.random.RandomState(0).rand(1, 299, 299, 3).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 2048)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_inception_v3_matches_torchvision():
    """Architecture parity: converted torchvision weights produce the same
    pre-aux features as the torch model (FID's pool3)."""
    import torch
    torchvision = pytest.importorskip("torchvision")

    torch_model = torchvision.models.inception_v3(
        weights=None, aux_logits=True, init_weights=True
    ).eval()

    import jax
    from mm_interleaved_tpu.utils.inception_v3 import (
        InceptionV3Features,
        convert_torchvision_inception,
    )

    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_torchvision_inception(sd)
    model = InceptionV3Features(resize_input=False, fid_final_block=False)

    x = np.random.RandomState(0).rand(1, 299, 299, 3).astype(np.float32)
    ours = np.asarray(model.apply(variables, x))

    with torch.no_grad():
        t = torch.tensor(x).permute(0, 3, 1, 2) * 2 - 1
        m = torch_model
        h = m.Conv2d_1a_3x3(t)
        h = m.Conv2d_2a_3x3(h)
        h = m.Conv2d_2b_3x3(h)
        h = m.maxpool1(h)
        h = m.Conv2d_3b_1x1(h)
        h = m.Conv2d_4a_3x3(h)
        h = m.maxpool2(h)
        for blk in (m.Mixed_5b, m.Mixed_5c, m.Mixed_5d, m.Mixed_6a,
                    m.Mixed_6b, m.Mixed_6c, m.Mixed_6d, m.Mixed_6e,
                    m.Mixed_7a, m.Mixed_7b, m.Mixed_7c):
            h = blk(h)
        want = h.mean(dim=(2, 3)).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-3)
