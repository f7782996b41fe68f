"""Depth sampling and alpha-compositing tests."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_invertible_warp_tpu.ops import render, sampling

rng = np.random.RandomState(3)


def test_stratified_samples_in_bins():
    key = jax.random.PRNGKey(0)
    d = np.asarray(sampling.sample_depth(key, 2, 16, 32, (2.0, 6.0)))
    assert d.shape == (2, 16, 32, 1)
    edges = np.linspace(2.0, 6.0, 33)
    assert np.all(d[..., 0] >= edges[None, None, :-1])
    assert np.all(d[..., 0] <= edges[None, None, 1:] + 1e-6)
    # deterministic midpoint mode
    d_mid = np.asarray(sampling.sample_depth(key, 1, 4, 8, (0.0, 1.0), stratified=False))
    np.testing.assert_allclose(d_mid[0, 0, :, 0], (np.arange(8) + 0.5) / 8, atol=1e-6)


def test_inverse_depth_param():
    key = jax.random.PRNGKey(1)
    d = np.asarray(sampling.sample_depth(key, 1, 4, 8, (1.0, 0.0), param="inverse",
                                         stratified=False))
    raw = (np.arange(8) + 0.5) / 8 * (0.0 - 1.0) + 1.0
    np.testing.assert_allclose(d[0, 0, :, 0], 1.0 / (raw + 1e-8), rtol=1e-5)


def _np_sample_pdf(pdf, N, Nf, depth_range):
    """Independent numpy reimplementation of inverse-CDF sampling."""
    dmin, dmax = depth_range
    B, R, _ = pdf.shape
    cdf = np.concatenate([np.zeros((B, R, 1)), np.cumsum(pdf, -1)], -1)
    grid = np.linspace(0, 1, Nf + 1)
    unif = 0.5 * (grid[:-1] + grid[1:])
    bins = np.linspace(dmin, dmax, N + 1)
    out = np.zeros((B, R, Nf))
    for b in range(B):
        for r in range(R):
            idx = np.searchsorted(cdf[b, r], unif, side="right")
            lo, hi = np.clip(idx - 1, 0, None), np.clip(idx, None, N)
            dl, dh = bins[lo], bins[hi]
            cl, ch = cdf[b, r][lo], cdf[b, r][hi]
            t = (unif - cl) / (ch - cl + 1e-8)
            out[b, r] = dl + t * (dh - dl)
    return out[..., None]


def test_pdf_sampling_matches_numpy_searchsorted():
    N, Nf = 16, 8
    pdf = rng.rand(2, 5, N).astype(np.float32)
    pdf /= pdf.sum(-1, keepdims=True)
    ours = np.asarray(sampling.sample_depth_from_pdf(jnp.array(pdf), N, Nf, (2.0, 6.0)))
    ref = _np_sample_pdf(pdf.astype(np.float64), N, Nf, (2.0, 6.0))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_pdf_sampling_concentrates_on_peak():
    N, Nf = 32, 16
    pdf = np.full((1, 1, N), 1e-6, np.float32)
    pdf[0, 0, 20] = 1.0
    d = np.asarray(sampling.sample_depth_from_pdf(jnp.array(pdf), N, Nf, (0.0, 1.0)))
    bin_lo, bin_hi = 20 / N, 21 / N
    frac_in_bin = np.mean((d >= bin_lo - 1e-3) & (d <= bin_hi + 1e-3))
    assert frac_in_bin > 0.9


def _np_composite(ray, rgb, sigma, depth):
    """Independent numpy compositor."""
    B, R, N, _ = rgb.shape
    ray_len = np.linalg.norm(ray, axis=-1)
    out_rgb = np.zeros((B, R, 3))
    out_d = np.zeros((B, R, 1))
    out_op = np.zeros((B, R, 1))
    for b in range(B):
        for r in range(R):
            T = 1.0
            for i in range(N):
                delta = (depth[b, r, i + 1, 0] - depth[b, r, i, 0]) if i < N - 1 else 1e10
                a = 1 - np.exp(-sigma[b, r, i] * delta * ray_len[b, r])
                w = T * a
                out_rgb[b, r] += w * rgb[b, r, i]
                out_d[b, r] += w * depth[b, r, i]
                out_op[b, r] += w
                T *= np.exp(-sigma[b, r, i] * delta * ray_len[b, r])
    return out_rgb, out_d, out_op


def test_composite_matches_numpy_loop():
    B, R, N = 2, 3, 12
    ray = rng.randn(B, R, 3).astype(np.float32)
    rgb = rng.rand(B, R, N, 3).astype(np.float32)
    sigma = rng.rand(B, R, N).astype(np.float32) * 2
    depth = np.sort(rng.rand(B, R, N, 1).astype(np.float32) * 4 + 1, axis=2)
    out = render.composite(jnp.array(ray), jnp.array(rgb), jnp.array(sigma), jnp.array(depth))
    ref_rgb, ref_d, ref_op = _np_composite(ray, rgb, sigma, depth)
    np.testing.assert_allclose(np.asarray(out[0]), ref_rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), ref_d, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[2]), ref_op, atol=1e-4)


def test_composite_opaque_first_sample():
    ray = jnp.ones((1, 1, 3)) / np.sqrt(3)  # unit length
    rgb = jnp.array([[[[0.2, 0.4, 0.6], [0.9, 0.9, 0.9]]]])
    sigma = jnp.array([[[1e8, 1e8]]])
    depth = jnp.array([[[[1.0], [2.0]]]])
    out_rgb, out_d, op, _ = render.composite(ray, rgb, sigma, depth)
    np.testing.assert_allclose(np.asarray(out_rgb[0, 0]), [0.2, 0.4, 0.6], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d[0, 0]), [1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(op[0, 0]), [1.0], atol=1e-5)


def test_composite_background_color():
    ray = jnp.ones((1, 1, 3))
    rgb = jnp.zeros((1, 1, 2, 3))
    sigma = jnp.zeros((1, 1, 2))  # fully transparent
    depth = jnp.array([[[[1.0], [2.0]]]])
    out_rgb, _, op, _ = render.composite(ray, rgb, sigma, depth,
                                         setbg_opaque=True, bgcolor=1.0)
    np.testing.assert_allclose(np.asarray(op[0, 0]), [0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_rgb[0, 0]), [1, 1, 1], atol=1e-6)


def test_ray_subset_distinct_and_uniform():
    """tpu.ray_sample=topk draws a distinct uniform subset with the same
    law as randperm(HW)[:n] (the reference's ray sampling), in one O(HW)
    pass instead of a full sort."""
    n_total, n_pick = 120, 16
    key = jax.random.PRNGKey(0)
    counts = np.zeros(n_total)
    n_draws = 400
    for d in range(n_draws):
        idx = np.asarray(sampling.sample_ray_subset(
            jax.random.fold_in(key, d), n_total, n_pick, mode="topk"))
        assert idx.shape == (n_pick,)
        assert len(set(idx.tolist())) == n_pick          # distinct
        assert idx.min() >= 0 and idx.max() < n_total
        counts[idx] += 1
    # each index appears with p = n_pick/n_total; 400 draws -> mean 53.3,
    # sd ~6.9; bound at +-5 sd
    expect = n_draws * n_pick / n_total
    sd = np.sqrt(n_draws * (n_pick / n_total) * (1 - n_pick / n_total))
    assert np.all(np.abs(counts - expect) < 5 * sd), (
        counts.min(), counts.max())

    # permutation mode: same contract
    idx = np.asarray(sampling.sample_ray_subset(
        key, n_total, n_pick, mode="permutation"))
    assert idx.shape == (n_pick,)
    assert len(set(idx.tolist())) == n_pick


def test_ray_subset_stratified():
    """Sort-free stratified mode: distinct, one per stratum, uniform
    marginals; strata tile range(n_total) exactly even when n_pick does not
    divide n_total."""
    n_total, n_pick = 123, 16          # non-divisible on purpose
    key = jax.random.PRNGKey(3)
    bounds = (np.arange(n_pick + 1) * n_total) // n_pick
    counts = np.zeros(n_total)
    n_draws = 400
    for d in range(n_draws):
        idx = np.asarray(sampling.sample_ray_subset(
            jax.random.fold_in(key, d), n_total, n_pick, mode="stratified"))
        assert idx.shape == (n_pick,)
        assert len(set(idx.tolist())) == n_pick
        # exactly one index inside each stratum
        for i in range(n_pick):
            assert bounds[i] <= idx[i] < bounds[i + 1], (i, idx[i])
        counts[idx] += 1
    # marginal rate: index j in stratum of width w appears w.p. 1/w per draw
    widths = np.diff(bounds)
    expect = n_draws / widths[np.searchsorted(bounds, np.arange(n_total),
                                              side="right") - 1]
    sd = np.sqrt(expect)
    assert np.all(np.abs(counts - expect) < 5 * np.maximum(sd, 1.0))
