"""Fused ray-march kernel (PE+MLP+composite): value and gradient parity
against the jnp render core, interpreter mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.ops import nerf_mlp, render
from neural_invertible_warp_tpu.ops.pallas import raymarch

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
    B, R, K = 2, 3, 32
    center = jnp.array(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.array(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.array(np.sort(rng.rand(B, R, K, 1), axis=2).astype(np.float32)
                      * 3 + 1)
    return params, center, ray, depth


def _reference(params, center, ray, depth, progress=None, c2f=None):
    rgb_s, dens = nerf_mlp.apply_nerf_samples(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ="softplus", progress=progress, barf_c2f=c2f)
    return render.composite(ray, rgb_s, dens, depth)[:3]


def _fused(params, center, ray, depth, progress=None, c2f=None):
    return raymarch.fused_render_rays(params, center, ray, depth,
                                      progress=progress, barf_c2f=c2f,
                                      interpret=True)


def test_forward_parity(setup):
    params, center, ray, depth = setup
    ref = _reference(params, center, ray, depth)
    out = _fused(params, center, ray, depth)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_forward_parity_with_c2f(setup):
    params, center, ray, depth = setup
    ref = _reference(params, center, ray, depth, progress=0.3, c2f=(0.1, 0.5))
    out = _fused(params, center, ray, depth, progress=0.3, c2f=(0.1, 0.5))
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_gradient_parity(setup):
    params, center, ray, depth = setup
    rng = np.random.RandomState(1)
    t_rgb = jnp.array(rng.rand(2, 3, 3).astype(np.float32))

    def loss_ref(params, center, ray):
        rgb, d, o = _reference(params, center, ray, depth)
        return jnp.mean((rgb - t_rgb) ** 2) + 1e-2 * jnp.mean(d) \
            + 1e-2 * jnp.mean(o)

    def loss_fused(params, center, ray):
        rgb, d, o = _fused(params, center, ray, depth)
        return jnp.mean((rgb - t_rgb) ** 2) + 1e-2 * jnp.mean(d) \
            + 1e-2 * jnp.mean(o)

    np.testing.assert_allclose(float(loss_fused(params, center, ray)),
                               float(loss_ref(params, center, ray)), rtol=1e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, center, ray)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(params, center, ray)
    leaves_ref, tree_r = jax.tree_util.tree_flatten(g_ref[0])
    leaves_f, tree_f = jax.tree_util.tree_flatten(g_f[0])
    assert tree_r == tree_f
    for a, b in zip(leaves_f, leaves_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_ref[1]),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g_f[2]), np.asarray(g_ref[2]),
                               atol=2e-4, rtol=2e-3)


def test_ray_padding(setup):
    """Ray counts that don't divide the ray block exercise padding."""
    params, _, _, _ = setup
    rng = np.random.RandomState(2)
    B, R, K = 1, 5, 32   # 5 rays, rays_blk = 8 -> pad 3
    center = jnp.array(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.array(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.array(np.sort(rng.rand(B, R, K, 1), axis=2).astype(np.float32) + 1)
    ref = _reference(params, center, ray, depth)
    out = _fused(params, center, ray, depth)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)
