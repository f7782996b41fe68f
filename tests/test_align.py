"""Alignment tests: Kabsch registration, Procrustes sim3, Umeyama."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from neural_invertible_warp_tpu.ops import align

rng = np.random.RandomState(6)


def _random_R(n):
    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_rigid_registration_recovers_exact_transform():
    B, N = 4, 50
    R = _random_R(B)
    t = rng.randn(B, 3).astype(np.float32)
    x = rng.randn(B, N, 3).astype(np.float32)
    y = np.einsum("bij,bnj->bni", R, x) + t[:, None]
    R_est, t_est = align.rigid_points_registration(jnp.array(x), jnp.array(y))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)


def test_rigid_registration_weighted():
    B, N = 2, 40
    R = _random_R(B)
    t = rng.randn(B, 3).astype(np.float32)
    x = rng.randn(B, N, 3).astype(np.float32)
    y = np.einsum("bij,bnj->bni", R, x) + t[:, None]
    # corrupt the last 10 points but zero their weights
    y_bad = y.copy()
    y_bad[:, -10:] += 100.0
    w = np.ones((B, N), np.float32)
    w[:, -10:] = 0.0
    R_est, t_est = align.rigid_points_registration(jnp.array(x), jnp.array(y_bad),
                                                   weights=jnp.array(w))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)


def test_rigid_registration_is_differentiable():
    x = jnp.array(rng.randn(2, 20, 3).astype(np.float32))
    y = jnp.array(rng.randn(2, 20, 3).astype(np.float32))

    def loss(y_):
        R, t = align.rigid_points_registration(x, y_)
        pred = jnp.einsum("bij,bnj->bni", R, x) + t[:, None]
        return jnp.mean((pred - y_) ** 2)

    g = jax.grad(loss)(y)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_procrustes_recovers_sim3():
    N = 30
    R = _random_R(1)[0]
    s, t = 2.5, np.array([1.0, -2.0, 0.5], np.float32)
    X1 = rng.randn(N, 3).astype(np.float32)           # "pred" frame
    X0 = s * X1 @ R.T + t                              # "GT" frame
    sim3 = align.procrustes_analysis_np(X0, X1)
    aligned = (X1 - sim3["t1"]) / sim3["s1"] @ sim3["R"].T * sim3["s0"] + sim3["t0"]
    np.testing.assert_allclose(aligned, X0, atol=1e-3)
    # jnp fp32 version agrees with the float64 host version
    sim3_j = align.procrustes_analysis(jnp.array(X0), jnp.array(X1))
    np.testing.assert_allclose(np.asarray(sim3_j["R"]), sim3["R"], atol=1e-3)
    np.testing.assert_allclose(float(sim3_j["s0"]) / float(sim3_j["s1"]),
                               float(sim3["s0"]) / float(sim3["s1"]), rtol=1e-3)


def test_procrustes_det_flip_gives_proper_rotation():
    # mirrored point sets must still produce det(R) = +1
    N = 20
    X1 = rng.randn(N, 3).astype(np.float32)
    X0 = X1.copy()
    X0[:, 2] *= -1
    sim3 = align.procrustes_analysis_np(X0, X1)
    assert np.linalg.det(sim3["R"]) > 0


def test_umeyama_recovers_similarity():
    N = 40
    R = _random_R(1)[0].astype(np.float64)
    s, t = 0.7, np.array([0.3, 1.2, -0.4])
    data = rng.randn(N, 3)
    model = s * data @ R.T + t
    s_est, R_est, t_est = align.align_umeyama(model, data)
    np.testing.assert_allclose(s_est, s, rtol=1e-6)
    np.testing.assert_allclose(R_est, R, atol=1e-6)
    np.testing.assert_allclose(t_est, t, atol=1e-6)


def test_apply_sim3_roundtrip():
    from neural_invertible_warp_tpu.ops import lie
    pose = lie.se3_to_SE3(jnp.array(rng.randn(6, 6).astype(np.float32) * 0.3))
    sim3 = dict(t0=jnp.zeros(3), t1=jnp.zeros(3), s0=jnp.float32(1.0),
                s1=jnp.float32(1.0), R=jnp.eye(3))
    out = align.apply_sim3_to_poses(pose, sim3, "pred_to_GT")
    np.testing.assert_allclose(np.asarray(out), np.asarray(pose), atol=1e-5)
    # pred_to_GT then GT_to_pred with a real sim3 must round-trip
    R = jnp.array(_random_R(1)[0])
    sim3 = dict(t0=jnp.array([1.0, 0, 0]), t1=jnp.array([0.0, 2.0, 0]),
                s0=jnp.float32(2.0), s1=jnp.float32(0.5), R=R)
    fwd = align.apply_sim3_to_poses(pose, sim3, "pred_to_GT")
    back = align.apply_sim3_to_poses(fwd, sim3, "GT_to_pred")
    np.testing.assert_allclose(np.asarray(back), np.asarray(pose), atol=1e-4)
