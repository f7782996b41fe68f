"""Lie algebra tests: exp/log roundtrips and parity vs scipy closed forms."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from neural_invertible_warp_tpu.ops import lie

rng = np.random.RandomState(0)


def test_taylor_series_match_closed_forms():
    x = np.linspace(1e-4, 3.0, 50).astype(np.float64)
    np.testing.assert_allclose(lie.taylor_A(jnp.array(x)), np.sin(x) / x, rtol=1e-5)
    np.testing.assert_allclose(lie.taylor_B(jnp.array(x)), (1 - np.cos(x)) / x ** 2, rtol=1e-5)
    np.testing.assert_allclose(lie.taylor_C(jnp.array(x)), (x - np.sin(x)) / x ** 3, rtol=1e-4)


def test_so3_exp_matches_scipy():
    w = rng.randn(16, 3).astype(np.float32) * 0.7
    R = np.asarray(lie.so3_to_SO3(jnp.array(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip():
    w = rng.randn(8, 3).astype(np.float32) * 0.5
    R = lie.so3_to_SO3(jnp.array(w))
    w_back = np.asarray(lie.SO3_to_so3(R))
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_se3_exp_log_roundtrip():
    wu = rng.randn(8, 6).astype(np.float32) * 0.4
    Rt = lie.se3_to_SE3(jnp.array(wu))
    assert Rt.shape == (8, 3, 4)
    wu_back = np.asarray(lie.SE3_to_se3(Rt))
    np.testing.assert_allclose(wu_back, wu, atol=1e-4)
    # rotation block must be orthonormal
    R = np.asarray(Rt)[..., :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


def test_se3_zero_is_identity():
    Rt = np.asarray(lie.se3_to_SE3(jnp.zeros((1, 6))))
    np.testing.assert_allclose(Rt[0], np.eye(3, 4), atol=1e-7)


def test_quaternion_matches_scipy():
    q = rng.randn(16, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(lie.q_to_R(jnp.array(q)))
    # scipy uses (x,y,z,w) ordering
    R_ref = Rotation.from_quat(np.concatenate([q[:, 1:], q[:, :1]], axis=1)).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_quaternion_roundtrip_and_product():
    q = rng.randn(8, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = np.where(q[:, :1] < 0, -q, q)  # canonical hemisphere
    R = lie.q_to_R(jnp.array(q))
    q_back = np.asarray(lie.R_to_q(R))
    np.testing.assert_allclose(q_back, q, atol=1e-4)
    # q * q^-1 = identity quaternion
    prod = np.asarray(lie.q_product(jnp.array(q), lie.q_invert(jnp.array(q))))
    np.testing.assert_allclose(prod, np.tile([1, 0, 0, 0], (8, 1)), atol=1e-5)


def test_sixd_rotation_orthonormal():
    w = rng.randn(8, 9).astype(np.float32)
    Rt = np.asarray(lie.sixd_to_SE3(jnp.array(w)))
    R = Rt[..., :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)
    np.testing.assert_allclose(Rt[..., 3], w[:, 6:], atol=1e-6)


def test_exp_map_gradient_finite_at_zero():
    """Regression: se(3)=0 (the BARF init) must have finite gradients —
    a naive norm-based theta gives NaN grad at exactly zero."""
    import jax

    def loss(wu):
        return jnp.sum(lie.se3_to_SE3(wu) ** 2)

    g = jax.grad(loss)(jnp.zeros((4, 6)))
    assert np.all(np.isfinite(np.asarray(g)))

    def loss_r(w):
        return jnp.sum(lie.so3_to_SO3(w) ** 2)

    g = jax.grad(loss_r)(jnp.zeros((4, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
