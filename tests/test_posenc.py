"""Positional encoding tests: layouts, BARF c2f mask, Nerfies annealing."""

import numpy as np
import jax.numpy as jnp

from neural_invertible_warp_tpu.ops import posenc

rng = np.random.RandomState(2)


def test_pe_layout_matches_reference_ordering():
    # per input dim: [sin f0..fL-1, cos f0..fL-1] (model/nerf.py:476-483)
    x = jnp.array([[0.3, -0.7]])
    L = 3
    enc = np.asarray(posenc.positional_encoding(x, L))
    assert enc.shape == (1, 2 * 2 * L)
    freqs = (2.0 ** np.arange(L)) * np.pi
    expected = []
    for d in range(2):
        expected += list(np.sin(float(x[0, d]) * freqs))
        expected += list(np.cos(float(x[0, d]) * freqs))
    np.testing.assert_allclose(enc[0], expected, rtol=1e-5, atol=1e-6)


def test_barf_c2f_weights_endpoints():
    L = 10
    w0 = np.asarray(posenc.barf_c2f_weights(0.1, L, (0.1, 0.5)))
    np.testing.assert_allclose(w0, np.zeros(L), atol=1e-7)
    w1 = np.asarray(posenc.barf_c2f_weights(0.5, L, (0.1, 0.5)))
    np.testing.assert_allclose(w1, np.ones(L), atol=1e-6)
    # halfway: alpha = 5 -> first 5 bands on, band 5 at 1/2 ((1-cos(pi*0.0))/2=0)
    wh = np.asarray(posenc.barf_c2f_weights(0.3, L, (0.1, 0.5)))
    np.testing.assert_allclose(wh[:5], np.ones(5), atol=1e-5)
    np.testing.assert_allclose(wh[5:], np.zeros(5), atol=1e-5)


def test_c2f_pe_masks_frequencies():
    x = jnp.array(rng.randn(4, 3).astype(np.float32))
    L = 4
    full = np.asarray(posenc.positional_encoding_c2f(x, L))
    masked = np.asarray(posenc.positional_encoding_c2f(x, L, progress=0.0, c2f=(0.0, 1.0)))
    np.testing.assert_allclose(masked, np.zeros_like(masked), atol=1e-7)
    done = np.asarray(posenc.positional_encoding_c2f(x, L, progress=1.0, c2f=(0.0, 1.0)))
    np.testing.assert_allclose(done, full, atol=1e-6)
    # weights act per-frequency along the last axis of the [...,D,2,L] layout
    half = np.asarray(posenc.positional_encoding_c2f(x, L, progress=0.5, c2f=(0.0, 1.0)))
    half_r = half.reshape(4, 3, 2, L)
    full_r = full.reshape(4, 3, 2, L)
    np.testing.assert_allclose(half_r[..., :2], full_r[..., :2], atol=1e-5)
    np.testing.assert_allclose(half_r[..., 3], np.zeros_like(half_r[..., 3]), atol=1e-6)


def test_annealed_embed_layout_and_window():
    # layout [x, sin(f0 x), cos(f0 x), ...] with window per band (embedder.py:41-50)
    x = jnp.array(rng.randn(5, 2).astype(np.float32))
    L = 6
    out = np.asarray(posenc.annealed_embed(x, L, alpha_ratio=1.0))
    assert out.shape == (5, posenc.annealed_embed_dim(L, 2))
    np.testing.assert_allclose(out[:, :2], np.asarray(x), atol=1e-6)
    freqs = (2.0 ** np.linspace(0, L - 1, L)) * np.pi
    xs = np.asarray(x)
    for i, f in enumerate(freqs):
        base = 2 + i * 4
        np.testing.assert_allclose(out[:, base:base + 2], np.sin(xs * f), atol=1e-4)
        np.testing.assert_allclose(out[:, base + 2:base + 4], np.cos(xs * f), atol=1e-4)


def test_annealed_embed_alpha_zero_kills_bands():
    x = jnp.array(rng.randn(5, 3).astype(np.float32))
    out = np.asarray(posenc.annealed_embed(x, 6, alpha_ratio=0.0))
    np.testing.assert_allclose(out[:, :3], np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(out[:, 3:], 0, atol=1e-7)


def test_annealed_embed_partial_alpha_monotone():
    x = jnp.array(rng.randn(5, 1).astype(np.float32))
    lo = np.abs(np.asarray(posenc.annealed_embed(x, 6, 0.3))[:, 1:]).sum()
    hi = np.abs(np.asarray(posenc.annealed_embed(x, 6, 0.8))[:, 1:]).sum()
    assert lo < hi
