"""Cross-view projection geometry tests."""

import numpy as np
import jax.numpy as jnp

from neural_invertible_warp_tpu.ops import epipolar


def _setup():
    rng = np.random.RandomState(0)
    B, N = 2, 10
    K = np.tile(np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    # identity relative transform with a small translation
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, 0, 3] = 0.1
    kpi = rng.rand(B, N, 2).astype(np.float32) * np.array([64, 48])
    di = (rng.rand(B, N).astype(np.float32) + 1.0) * 2
    return K, T, kpi, di


def test_identity_projection_roundtrip():
    K, T, kpi, di = _setup()
    T_id = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    kpj = epipolar.batch_project_to_other_img(
        jnp.array(kpi), jnp.array(di), jnp.array(K), jnp.array(K),
        jnp.array(T_id))
    np.testing.assert_allclose(np.asarray(kpj), kpi, atol=1e-3)


def test_translation_shifts_projection():
    K, T, kpi, di = _setup()
    kpj, dj = epipolar.batch_project_to_other_img(
        jnp.array(kpi), jnp.array(di), jnp.array(K), jnp.array(K),
        jnp.array(T), return_depth=True)
    # x-translation of the camera shifts pixels by f*tx/z
    expected_dx = 50.0 * 0.1 / di
    np.testing.assert_allclose(np.asarray(kpj[..., 0] - kpi[..., 0]),
                               expected_dx, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dj), di, atol=1e-5)


def test_depth_check():
    K, T, kpi, di = _setup()
    T_id = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    # depth map consistent with di at the projected (same) pixels
    depthj = np.zeros((2, 48, 64), np.float32)
    for b in range(2):
        for n in range(kpi.shape[1]):
            x, y = int(round(kpi[b, n, 0])), int(round(kpi[b, n, 1]))
            if 0 <= x < 64 and 0 <= y < 48:
                depthj[b, y, x] = di[b, n]
    validi = jnp.ones(di.shape, bool)
    _, visible = epipolar.batch_project_to_other_img_and_check_depth(
        jnp.array(kpi), jnp.array(di), jnp.array(depthj), jnp.array(K),
        jnp.array(K), jnp.array(T_id), validi)
    assert np.asarray(visible).mean() > 0.8
    # inconsistent depth map -> nothing visible
    _, visible2 = epipolar.batch_project_to_other_img_and_check_depth(
        jnp.array(kpi), jnp.array(di), jnp.array(depthj) * 5.0, jnp.array(K),
        jnp.array(K), jnp.array(T_id), validi)
    assert np.asarray(visible2).mean() < 0.2
