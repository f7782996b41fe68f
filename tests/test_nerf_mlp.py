"""NeRF field MLP tests: shapes, init statistics, c2f behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.ops import nerf_mlp

ARCH = DotDict(dict(
    layers_feat=[None, 64, 64, 64, 64, 64, 64, 64, 64],
    layers_rgb=[None, 32, 3],
    skip=[4],
    posenc=dict(L_3D=10, L_view=4),
    density_activ="softplus",
    tf_init=True,
))


def _params(seed=0, arch=ARCH):
    return nerf_mlp.init_nerf_params(jax.random.PRNGKey(seed), arch)


def test_shapes_and_finiteness():
    params = _params()
    pts = jnp.array(np.random.RandomState(0).randn(2, 5, 7, 3).astype(np.float32))
    ray = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    rgb, density = nerf_mlp.apply_nerf(params, ARCH, pts, ray)
    assert rgb.shape == (2, 5, 7, 3)
    assert density.shape == (2, 5, 7)
    assert np.all(np.isfinite(np.asarray(rgb)))
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))
    assert np.all(np.asarray(density) >= 0)  # softplus


def test_param_structure_matches_reference_dims():
    # 8 trunk layers, skip at 4, +1 density channel on the last trunk layer
    params = _params()
    in_dim = 3 + 6 * 10
    assert params["feat"][0]["w"].shape == (in_dim, 64)
    assert params["feat"][4]["w"].shape == (64 + in_dim, 64)
    assert params["feat"][7]["w"].shape == (64, 65)
    assert params["rgb"][0]["w"].shape == (64 + 3 + 6 * 4, 32)
    assert params["rgb"][1]["w"].shape == (32, 3)


def test_tf_init_gains():
    # density row uses gain 1 with fan (1, k_in); feature rows gain sqrt(2)
    params = _params(seed=3)
    w_last = np.asarray(params["feat"][7]["w"])  # (64, 65): col 0 is density
    bound_density = 1.0 * np.sqrt(6.0 / (1 + 64))
    bound_feat = np.sqrt(2.0) * np.sqrt(6.0 / (64 + 64))
    assert np.abs(w_last[:, 0]).max() <= bound_density + 1e-6
    assert np.abs(w_last[:, 1:]).max() <= bound_feat + 1e-6
    # both blocks should nearly saturate their respective bounds
    assert np.abs(w_last[:, 0]).max() > 0.85 * bound_density
    assert np.abs(w_last[:, 1:]).max() > 0.9 * bound_feat


def test_view_independent_mode():
    arch = ARCH.copy()
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), arch, view_dep=False)
    pts = jnp.zeros((1, 4, 3))
    rgb, density = nerf_mlp.apply_nerf(params, arch, pts, None, view_dep=False)
    assert rgb.shape == (1, 4, 3)


def test_c2f_progress_zero_masks_pe():
    params = _params()
    pts = jnp.array(np.random.RandomState(1).randn(1, 6, 3).astype(np.float32))
    ray = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    out0a = nerf_mlp.apply_nerf(params, ARCH, pts, ray, progress=0.0, barf_c2f=(0.1, 0.5))
    out0b = nerf_mlp.apply_nerf(params, ARCH, pts * 1.0 + 0.0, ray, progress=0.05,
                                barf_c2f=(0.1, 0.5))
    # before c2f start, changing progress changes nothing
    np.testing.assert_allclose(np.asarray(out0a[0]), np.asarray(out0b[0]), atol=1e-6)
    out1 = nerf_mlp.apply_nerf(params, ARCH, pts, ray, progress=1.0, barf_c2f=(0.1, 0.5))
    assert np.abs(np.asarray(out1[0]) - np.asarray(out0a[0])).max() > 1e-4


def test_density_noise_reg():
    params = _params()
    pts = jnp.zeros((1, 4, 3))
    ray = jnp.ones((1, 4, 3))
    _, d1 = nerf_mlp.apply_nerf(params, ARCH, pts, ray, density_noise_reg=1.0,
                                noise_key=jax.random.PRNGKey(7))
    _, d2 = nerf_mlp.apply_nerf(params, ARCH, pts, ray)
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-3


def test_apply_nerf_samples_broadcast():
    params = _params()
    center = jnp.zeros((2, 5, 3))
    ray = jnp.array(np.random.RandomState(2).randn(2, 5, 3).astype(np.float32))
    depth = jnp.linspace(1, 4, 9).reshape(1, 1, 9, 1) * jnp.ones((2, 5, 1, 1))
    rgb, density = nerf_mlp.apply_nerf_samples(params, ARCH, center, ray, depth)
    assert rgb.shape == (2, 5, 9, 3)
    assert density.shape == (2, 5, 9)
