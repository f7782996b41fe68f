"""Invertible deformation network tests: identity at init, exact invertibility,
annealing behavior, and gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_invertible_warp_tpu.ops import inn

rng = np.random.RandomState(4)


def _params(key=0, d_feature=16, d_hidden=32, multires=6):
    return inn.init_deform_params(jax.random.PRNGKey(key), d_feature,
                                  d_hidden=d_hidden, multires=multires)


def _randomize(params, scale=0.1, seed=5):
    """Make the warp non-trivial by filling the zero-initialized layers."""
    r = np.random.RandomState(seed)
    def fill(x):
        return jnp.array(r.randn(*x.shape).astype(np.float32) * scale)
    return jax.tree_util.tree_map(fill, params)


def test_identity_at_init():
    params = _params()
    code = jnp.array(rng.randn(3, 16).astype(np.float32))
    pts = jnp.array(rng.randn(3, 20, 3).astype(np.float32))
    out = inn.deform_forward(params, code, pts, alpha_ratio=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)


def test_forward_inverse_roundtrip():
    params = _randomize(_params())
    code = jnp.array(rng.randn(2, 16).astype(np.float32))
    pts = jnp.array(rng.randn(2, 50, 3).astype(np.float32))
    for alpha in [0.0, 0.37, 1.0]:
        warped = inn.deform_forward(params, code, pts, alpha)
        back = inn.deform_inverse(params, code, warped, alpha)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=2e-4)
        # and the other direction
        unwarped = inn.deform_inverse(params, code, pts, alpha)
        fwd = inn.deform_forward(params, code, unwarped, alpha)
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(pts), atol=2e-4)


def test_warp_is_nontrivial_after_randomization():
    params = _randomize(_params())
    code = jnp.array(rng.randn(2, 16).astype(np.float32))
    pts = jnp.array(rng.randn(2, 20, 3).astype(np.float32))
    out = inn.deform_forward(params, code, pts, 1.0)
    assert np.abs(np.asarray(out) - np.asarray(pts)).max() > 1e-3


def test_alpha_ratio_changes_warp():
    params = _randomize(_params())
    code = jnp.array(rng.randn(1, 16).astype(np.float32))
    pts = jnp.array(rng.randn(1, 20, 3).astype(np.float32))
    out0 = np.asarray(inn.deform_forward(params, code, pts, 0.0))
    out1 = np.asarray(inn.deform_forward(params, code, pts, 1.0))
    assert np.abs(out0 - out1).max() > 1e-4


def test_per_image_codes_give_per_image_warps():
    params = _randomize(_params())
    code = jnp.array(rng.randn(2, 16).astype(np.float32))
    pts = jnp.array(np.tile(rng.randn(1, 20, 3), (2, 1, 1)).astype(np.float32))
    out = np.asarray(inn.deform_forward(params, code, pts, 1.0))
    assert np.abs(out[0] - out[1]).max() > 1e-4


def test_gradients_flow_to_all_leaves():
    params = _randomize(_params())
    code = jnp.array(rng.randn(2, 16).astype(np.float32))
    pts = jnp.array(rng.randn(2, 30, 3).astype(np.float32))

    def loss(p, c):
        return jnp.sum(inn.deform_forward(p, c, pts, 0.7) ** 2)

    g_params, g_code = jax.grad(loss, argnums=(0, 1))(params, code)
    leaves = jax.tree_util.tree_leaves(g_params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
    assert np.abs(np.asarray(g_code)).max() > 0


def test_weight_norm_preserves_init_weight():
    # at init W_eff == v (g = ||v||), so the first-layer output equals x @ v + b
    params = _params()
    layer = params["blocks"][0]["a"][0]
    W = np.asarray(inn._wn_weight(layer))
    np.testing.assert_allclose(W, np.asarray(layer["v"]), atol=1e-6)
    # only raw-coordinate input columns are non-zero at init
    assert np.abs(W[2:]).max() == 0
    assert np.abs(W[:2]).max() > 0
