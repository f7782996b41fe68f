"""PDC-Net dense matcher (ops/pdcnet): hermetic synthetic-weight tests.

Architecture parity against the reference torch network is established
separately with matched random weights (tools/ref_control/compare_pdcnet.py
— all four pyramid levels agree to <1e-3 relative); these tests pin the
JAX-side contract: shapes, finiteness, resize/warp semantics, and the
matcher -> SfM consumption path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_invertible_warp_tpu.ops.pdcnet import blocks, gocor, layers, \
    pdcnet, vgg
from neural_invertible_warp_tpu.utils import matchers


@pytest.fixture(scope="module")
def params():
    return pdcnet.init_pdcnet_params(jax.random.PRNGKey(0))


def test_interp_matrices_match_torch_semantics():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 17, 23).astype(np.float32)
    for out_hw in [(8, 12), (34, 46), (5, 50)]:
        t_bil = F.interpolate(torch.tensor(x), out_hw, mode="bilinear",
                              align_corners=False).numpy()
        j_bil = np.asarray(layers.interp_bilinear(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(j_bil, t_bil, atol=1e-5)
        t_area = F.interpolate(torch.tensor(x), out_hw, mode="area").numpy()
        j_area = np.asarray(layers.interp_area(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(j_area, t_area, atol=1e-5)


def test_warp_matches_torch_grid_sample():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    x = rng.rand(1, 4, 10, 14).astype(np.float32)
    flow = (rng.rand(1, 2, 10, 14).astype(np.float32) - 0.5) * 6

    j = np.asarray(layers.warp(jnp.asarray(x), jnp.asarray(flow)))

    xx = torch.arange(14).view(1, -1).repeat(10, 1)
    yy = torch.arange(10).view(-1, 1).repeat(1, 14)
    grid = torch.stack([xx, yy]).float()[None]
    vgrid = grid + torch.tensor(flow)
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / 13 - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / 9 - 1.0
    t = F.grid_sample(torch.tensor(x), vgrid.permute(0, 2, 3, 1),
                      align_corners=True).numpy()
    np.testing.assert_allclose(j, t, atol=1e-5)


def test_vgg_pyramid_shapes():
    p = vgg.init_vgg_params(jax.random.PRNGKey(1))
    x = jnp.zeros((1, 3, 64, 96))
    outs = vgg.vgg_pyramid(p, x)
    assert [o.shape for o in outs] == [
        (1, 64, 64, 96), (1, 64, 32, 48), (1, 128, 16, 24),
        (1, 256, 8, 12), (1, 512, 4, 6)]
    e = vgg.vgg_eighth(p, x)
    assert [o.shape for o in e] == [
        (1, 64, 64, 96), (1, 128, 16, 24), (1, 256, 8, 12)]


def test_gocor_shapes_and_finiteness():
    key = jax.random.PRNGKey(2)
    gp = gocor.init_global_gocor(key)
    ref = jax.random.normal(key, (1, 512, 8, 8))
    qry = jax.random.normal(jax.random.fold_in(key, 1), (1, 512, 8, 8))
    scores = gocor.global_gocor(gp, ref, qry)
    assert scores.shape == (1, 64, 8, 8)
    assert np.all(np.isfinite(np.asarray(scores)))

    lp = gocor.init_local_gocor(key)
    ref2 = jax.random.normal(key, (1, 64, 10, 12))
    qry2 = jax.random.normal(jax.random.fold_in(key, 2), (1, 64, 10, 12))
    s2 = gocor.local_gocor(lp, ref2, qry2)
    assert s2.shape == (1, 81, 10, 12)
    assert np.all(np.isfinite(np.asarray(s2)))


def test_full_forward_and_confidence(params):
    """End-to-end inference on synthetic weights: flow + P_R maps with the
    right shapes, finite, P_R in [0,1]."""
    rng = np.random.RandomState(0)
    src = (rng.rand(1, 3, 64, 80) * 255).astype(np.float32)
    tgt = (rng.rand(1, 3, 64, 80) * 255).astype(np.float32)
    flow, p_r = pdcnet.estimate_flow_and_confidence_map(
        params, jnp.asarray(src), jnp.asarray(tgt), scaling=0.25)
    assert flow.shape == (1, 2, 16, 20)
    assert p_r.shape == (1, 1, 16, 20)
    flow = np.asarray(flow)
    p_r = np.asarray(p_r)
    assert np.all(np.isfinite(flow)) and np.all(np.isfinite(p_r))
    assert p_r.min() >= 0.0 and p_r.max() <= 1.0


def test_matches_consumed_by_sfm(params):
    """VERDICT r2 #4 done-criterion: the full network's matches feed
    compute_sfm_poses (shapes/exclusion handling; random weights give junk
    geometry, which must be handled gracefully)."""
    from neural_invertible_warp_tpu.utils import colmap_init

    rng = np.random.RandomState(3)
    imgs = (rng.rand(3, 48, 64, 3)).astype(np.float32)
    intr = np.tile(np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]],
                            np.float32), (3, 1, 1))

    base = matchers.PdcNetMatcher(params, min_confidence=0.0)

    calls = []

    def capped(i, j, img_i, img_j):
        k1, k2 = base(i, j, img_i, img_j)
        calls.append((i, j, len(k1)))
        assert k1.shape == k2.shape and k1.shape[1] == 2
        assert np.all(np.isfinite(k1)) and np.all(np.isfinite(k2))
        return k1[:80], k2[:80]

    poses, valid, excluded = colmap_init.compute_sfm_poses(
        imgs, intr, matcher=capped)
    assert len(calls) >= 1
    assert poses.shape == (3, 3, 4)
    assert sorted(valid + excluded) == [0, 1, 2]
    assert np.all(np.isfinite(poses))


def test_pdcnet_gate_needs_weights():
    with pytest.raises(RuntimeError):
        matchers.pdcnet()


def test_confidence_interval_math():
    """P_R of the Laplace mixture: tiny variance -> ~1, huge -> ~0."""
    w = jnp.zeros((1, 2, 4, 4))
    small = jnp.full((1, 2, 4, 4), -6.0)
    big = jnp.full((1, 2, 4, 4), 14.0)
    p_hi = blocks.estimate_probability_of_confidence_interval_of_mixture_density(
        w, small, R=1.0)
    p_lo = blocks.estimate_probability_of_confidence_interval_of_mixture_density(
        w, big, R=1.0)
    assert float(jnp.min(p_hi)) > 0.9
    assert float(jnp.max(p_lo)) < 0.01
