"""Fused Pallas field kernel: value + gradient parity vs the jnp reference
path, in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.ops import nerf_mlp
from neural_invertible_warp_tpu.ops.pallas import fused_field

ARCH = DotDict(dict(
    layers_feat=[None, 256, 256, 256, 256, 256, 256, 256, 256],
    layers_rgb=[None, 128, 3],
    skip=[4],
    posenc=dict(L_3D=10, L_view=4),
    density_activ="softplus",
    tf_init=True,
))


@pytest.fixture(scope="module")
def setup():
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), ARCH)
    rng = np.random.RandomState(0)
    B, R, K = 2, 4, 32   # 256 points = 1 block
    center = jnp.array(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.array(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.array(np.sort(rng.rand(B, R, K, 1), axis=2).astype(np.float32)
                      * 3 + 1)
    return params, center, ray, depth


def _reference(params, center, ray, depth, progress=None, c2f=None,
               activ="softplus"):
    return nerf_mlp.apply_nerf_samples(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ=activ, progress=progress, barf_c2f=c2f)


def _fused(params, center, ray, depth, progress=None, c2f=None,
           activ="softplus"):
    return fused_field.fused_apply_nerf_samples(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ=activ, progress=progress, barf_c2f=c2f,
        interpret=True)


def test_supports_detects_reference_arch(setup):
    assert fused_field.supports(ARCH, DotDict(dict(view_dep=True,
                                                   density_noise_reg=None)))
    assert not fused_field.supports(
        DotDict(dict(layers_feat=[None, 64], layers_rgb=[None, 3], skip=[])),
        DotDict(dict(view_dep=True)))


def test_forward_parity(setup):
    params, center, ray, depth = setup
    rgb_ref, dens_ref = _reference(params, center, ray, depth)
    rgb_f, dens_f = _fused(params, center, ray, depth)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               atol=2e-4, rtol=1e-4)


def test_forward_parity_with_c2f(setup):
    params, center, ray, depth = setup
    rgb_ref, dens_ref = _reference(params, center, ray, depth,
                                   progress=0.3, c2f=(0.1, 0.5))
    rgb_f, dens_f = _fused(params, center, ray, depth,
                           progress=0.3, c2f=(0.1, 0.5))
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               atol=2e-4, rtol=1e-4)


def test_gradient_parity(setup):
    params, center, ray, depth = setup
    rng = np.random.RandomState(1)
    t_rgb = jnp.array(rng.rand(2, 4, 32, 3).astype(np.float32))

    def loss_ref(params, center, ray):
        rgb, dens = _reference(params, center, ray, depth)
        return jnp.mean((rgb - t_rgb) ** 2) + 1e-3 * jnp.mean(dens)

    def loss_fused(params, center, ray):
        rgb, dens = _fused(params, center, ray, depth)
        return jnp.mean((rgb - t_rgb) ** 2) + 1e-3 * jnp.mean(dens)

    l_ref = float(loss_ref(params, center, ray))
    l_f = float(loss_fused(params, center, ray))
    np.testing.assert_allclose(l_f, l_ref, rtol=1e-5)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, center, ray)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(params, center, ray)
    # params grads
    leaves_ref, tree = jax.tree_util.tree_flatten(g_ref[0])
    leaves_f, tree_f = jax.tree_util.tree_flatten(g_f[0])
    assert tree == tree_f
    for a, b in zip(leaves_f, leaves_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-3)
    # center/ray grads (through PE + points)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_ref[1]),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_ref[2]),
                               atol=1e-4, rtol=1e-3)


def test_multi_block_shapes(setup):
    """N not a multiple of BLK exercises the padding path."""
    params, _, _, _ = setup
    rng = np.random.RandomState(2)
    B, R, K = 3, 5, 20   # 300 points -> pad to 512
    center = jnp.array(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.array(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.array(np.sort(rng.rand(B, R, K, 1), axis=2).astype(np.float32) + 1)
    rgb_ref, dens_ref = _reference(params, center, ray, depth)
    rgb_f, dens_f = _fused(params, center, ray, depth)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               atol=2e-4, rtol=1e-4)


def test_bfloat16_compute_dtype(setup):
    """compute_dtype=bfloat16 (explicit static plumbing, NOT a module
    global): values track the f32 path within bf16 tolerance and gradients
    stay finite and well-correlated. The f32 accumulation keeps relative
    error near bf16 epsilon (~8e-3) rather than growing with depth."""
    params, center, ray, depth = setup
    rgb32, dens32 = _fused(params, center, ray, depth)
    rgb16, dens16 = fused_field.fused_apply_nerf_samples(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ="softplus", interpret=True, compute_dtype="bfloat16")
    assert np.all(np.isfinite(np.asarray(rgb16)))
    np.testing.assert_allclose(np.asarray(rgb16), np.asarray(rgb32),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(dens16), np.asarray(dens32),
                               atol=0.1, rtol=0.1)

    def loss16(p):
        rgb, dens = fused_field.fused_apply_nerf_samples(
            p, ARCH, center, ray, depth, view_dep=True,
            density_activ="softplus", interpret=True,
            compute_dtype="bfloat16")
        return jnp.sum(rgb ** 2) + 1e-3 * jnp.sum(dens)

    def loss32(p):
        rgb, dens = _fused(p, center, ray, depth)
        return jnp.sum(rgb ** 2) + 1e-3 * jnp.sum(dens)

    g16 = jax.grad(loss16)(params)
    g32 = jax.grad(loss32)(params)
    f16 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g16)])
    f32 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g32)])
    assert np.all(np.isfinite(f16))
    denom = np.linalg.norm(f32)
    assert denom > 0
    # cosine similarity of the full gradient vector
    cos = float(np.dot(f16, f32) / (np.linalg.norm(f16) * denom + 1e-30))
    assert cos > 0.99, cos


def test_relu_density_parity(setup):
    """relu density (NeRF-paper *_repr configs): forward + gradient parity
    through the static activ switch in _forward_block/_mlp_backward."""
    params, center, ray, depth = setup
    rgb_ref, dens_ref = _reference(params, center, ray, depth, activ="relu")
    rgb_f, dens_f = _fused(params, center, ray, depth, activ="relu")
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               atol=2e-4, rtol=1e-4)
    assert float(jnp.min(dens_f)) == 0.0   # relu actually applied

    rng = np.random.RandomState(2)
    t_rgb = jnp.array(rng.rand(*rgb_ref.shape).astype(np.float32))

    def loss(fn):
        def f(params, center, ray):
            rgb, dens = fn(params, center, ray, depth, activ="relu")
            return jnp.mean((rgb - t_rgb) ** 2) + 1e-3 * jnp.mean(dens)
        return f

    g_ref = jax.grad(loss(_reference), argnums=(0, 1, 2))(params, center, ray)
    g_f = jax.grad(loss(_fused), argnums=(0, 1, 2))(params, center, ray)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-6)
