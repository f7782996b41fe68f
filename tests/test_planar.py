"""2D warp toolkit + planar alignment experiment tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import synth_data
from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.ops import warp2d

rng = np.random.RandomState(0)


def test_so2_roundtrip():
    theta = jnp.array(rng.randn(8, 1).astype(np.float32))
    R = warp2d.so2_to_SO2(theta)
    np.testing.assert_allclose(np.asarray(warp2d.SO2_to_so2(R)),
                               np.asarray(theta), atol=1e-5)
    RtR = np.asarray(R @ jnp.swapaxes(R, -1, -2))
    np.testing.assert_allclose(RtR, np.tile(np.eye(2), (8, 1, 1)), atol=1e-6)


def test_se2_roundtrip_and_zero_identity():
    delta = jnp.array(rng.randn(8, 3).astype(np.float32) * 0.5)
    Rt = warp2d.se2_to_SE2(delta)
    back = np.asarray(warp2d.SE2_to_se2(Rt))
    np.testing.assert_allclose(back, np.asarray(delta), atol=1e-4)
    ident = np.asarray(warp2d.se2_to_SE2(jnp.zeros((1, 3))))
    np.testing.assert_allclose(ident[0], np.eye(2, 3), atol=1e-7)


def test_se2_taylor_vs_closed_form():
    x = np.linspace(1e-4, 2.0, 30)
    np.testing.assert_allclose(warp2d.taylor_A(jnp.array(x)), np.sin(x) / x,
                               rtol=1e-5)
    np.testing.assert_allclose(warp2d.taylor_B(jnp.array(x)),
                               (1 - np.cos(x)) / x, rtol=1e-4)
    np.testing.assert_allclose(warp2d.taylor_C(jnp.array(x)),
                               (x * np.cos(x) - np.sin(x)) / x ** 2, rtol=1e-4)
    np.testing.assert_allclose(warp2d.taylor_D(jnp.array(x)),
                               (x * np.sin(x) + np.cos(x) - 1) / x ** 2,
                               rtol=1e-4, atol=1e-6)


def test_sl3_properties():
    h = jnp.array(rng.randn(6, 8).astype(np.float32) * 0.2)
    H = np.asarray(warp2d.sl3_to_SL3(h))
    # SL(3): unit determinant (traceless generator)
    np.testing.assert_allclose(np.linalg.det(H), np.ones(6), rtol=1e-4)
    # zero -> identity
    H0 = np.asarray(warp2d.sl3_to_SL3(jnp.zeros((1, 8))))
    np.testing.assert_allclose(H0[0], np.eye(3), atol=1e-6)
    # the first two components generate translation
    Ht = np.asarray(warp2d.sl3_to_SL3(
        jnp.array([[0.3, -0.2, 0, 0, 0, 0, 0, 0]], jnp.float32)))
    np.testing.assert_allclose(Ht[0], [[1, 0, 0.3], [0, 1, -0.2], [0, 0, 1]],
                               atol=1e-6)


def test_warp_grid_types():
    xy = warp2d.normalized_pixel_grid(8, 10, batch_size=2)
    assert xy.shape == (2, 80, 2)
    out_t = warp2d.warp_grid(xy, jnp.array([[0.1, 0.2], [0, 0]]), "translation")
    np.testing.assert_allclose(np.asarray(out_t[0] - xy[0]),
                               np.tile([0.1, 0.2], (80, 1)), atol=1e-6)
    out_h = warp2d.warp_grid(xy, jnp.zeros((2, 8)), "homography")
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(xy), atol=1e-5)


def test_corners_in_range_check():
    assert warp2d.check_corners_in_range(jnp.zeros((1, 8)), 36, 48, 18, 18)
    big = jnp.zeros((1, 8)).at[0, 0].set(5.0)  # huge x-translation
    assert not warp2d.check_corners_in_range(big, 36, 48, 18, 18)


def _planar_opt(n_iter=2000):
    opt = config.load_options("options/homography.yaml")
    over = config.parse_arguments([
        "--model=homography", "--yaml=homography",
        "--data.image_size=[48,64]",
        "--data.patch_crop=[24,24]",
        "--arch.layers=[null,64,64,64,3]",
        "--arch.posenc.L_2D=6",
        "--barf_c2f=[0,0.6]",
        "--warp.noise_h=0.05",
        "--warp.noise_t=0.1",
        "--batch_size=4",
        "--max_iter={}".format(n_iter),
        "--optim.lr=1.e-3",
        "--optim.lr_warp=3.e-3",
    ])
    return config.override_options(opt, over, key_stack=[], safe_check=True)


def test_planar_alignment_recovers_warps():
    from neural_invertible_warp_tpu.models.planar import PlanarSystem
    opt = _planar_opt()
    image = synth_data._toy_image(48, 64, seed=3).astype(np.float32) / 255.0
    system = PlanarSystem(opt, image=image)
    state = system.init_state(jax.random.PRNGKey(0))
    err0 = system.corner_error(state)
    key = jax.random.PRNGKey(0)
    for it in range(opt.max_iter):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
    err1 = system.corner_error(state)
    assert np.isfinite(float(metrics["loss_all"]))
    assert err0 > 0.01
    assert err1 < 0.2 * err0, "corner error {} -> {}".format(err0, err1)


def test_image_fit_learns():
    from neural_invertible_warp_tpu.models.planar import ImageFitSystem
    opt = config.load_options("options/img_relu.yaml")
    over = config.parse_arguments([
        "--model=img_relu", "--yaml=img_relu",
        "--data.image_size=[32,32]",
        "--relu.hidden_layers=3", "--relu.hidden_features=64",
        "--relu.posenc.enabled", "--relu.posenc.L_2D=6",
        "--optim.Adam.lr=3.e-3",
        "--train_samples=512",
        "--max_iter=300",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    image = synth_data._toy_image(32, 32, seed=5).astype(np.float32) / 255.0
    system = ImageFitSystem(opt, image=image)
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for it in range(opt.max_iter):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
    assert float(metrics["psnr"]) > 20
