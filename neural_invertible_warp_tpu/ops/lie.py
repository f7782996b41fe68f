"""Lie-group algebra for SO(3)/SE(3), quaternions, and 6D (Stiefel) rotations.

Pure-jnp port of the math in reference camera.py:193-328. The exp/log maps use
the same truncated Taylor expansions for sin(x)/x, (1-cos x)/x^2, (x-sin x)/x^3
(reference camera.py:249-272) so that trajectories match the reference bit-for-
bit in fp32 (the series are smooth at 0, unlike the trig closed forms).

All functions broadcast over leading batch dimensions; rotations are [...,3,3],
rigid transforms are [...,3,4] = [R|t].
"""

from __future__ import annotations

import jax.numpy as jnp


def skew_symmetric(w):
    """[...,3] -> [...,3,3] cross-product matrix."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(w0)
    return jnp.stack([
        jnp.stack([zeros, -w2, w1], axis=-1),
        jnp.stack([w2, zeros, -w0], axis=-1),
        jnp.stack([-w1, w0, zeros], axis=-1),
    ], axis=-2)


def _taylor_sq(x2, kind, nth=10):
    """Taylor series in theta^2 (reference camera.py:249-272 evaluates the same
    series in theta; using theta^2 avoids the sqrt whose gradient is NaN at 0 —
    jnp.linalg.norm(0) has undefined grad, torch defines the subgradient as 0).

    kind A: sin(x)/x        = sum (-1)^i (x^2)^i / (2i+1)!
    kind B: (1-cos x)/x^2   = sum (-1)^i (x^2)^i / (2i+2)!
    kind C: (x-sin x)/x^3   = sum (-1)^i (x^2)^i / (2i+3)!
    """
    ans = jnp.zeros_like(x2)
    denom = 1.0
    for i in range(nth + 1):
        if kind == "A":
            if i > 0:
                denom *= (2 * i) * (2 * i + 1)
        elif kind == "B":
            denom *= (2 * i + 1) * (2 * i + 2)
        else:
            denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + ((-1) ** i) * x2 ** i / denom
    return ans


def _taylor(x, kind, nth=10):
    return _taylor_sq(x ** 2, kind, nth)


def taylor_A(x, nth=10):
    return _taylor(x, "A", nth)


def taylor_B(x, nth=10):
    return _taylor(x, "B", nth)


def taylor_C(x, nth=10):
    return _taylor(x, "C", nth)


def so3_to_SO3(w):
    """Exponential map so(3) -> SO(3). [...,3] -> [...,3,3]."""
    wx = skew_symmetric(w)
    theta2 = jnp.sum(w ** 2, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    A = _taylor_sq(theta2, "A")
    B = _taylor_sq(theta2, "B")
    return I + A * wx + B * (wx @ wx)


def SO3_to_so3(R, eps=1e-7):
    """Log map SO(3) -> so(3). [...,3,3] -> [...,3]."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # ln(R) explodes at theta == pi; clamp and wrap like the reference.
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))[..., None, None] % jnp.pi
    lnR = 1 / (2 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_to_SE3(wu):
    """Exponential map se(3) -> SE(3). [...,6] -> [...,3,4]."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew_symmetric(w)
    theta2 = jnp.sum(w ** 2, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    A = _taylor_sq(theta2, "A")
    B = _taylor_sq(theta2, "B")
    C = _taylor_sq(theta2, "C")
    R = I + A * wx + B * (wx @ wx)
    V = I + B * wx + C * (wx @ wx)
    t = V @ u[..., None]
    return jnp.concatenate([R, t], axis=-1)


def SE3_to_se3(Rt, eps=1e-8):
    """Log map SE(3) -> se(3). [...,3,4] -> [...,6]."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    A = taylor_A(theta)
    B = taylor_B(theta)
    invV = I - 0.5 * wx + (1 - A / (2 * B)) / (theta ** 2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# --------------------------------------------------------------------------
# Quaternions (reference camera.py:274-323); q = (w, x, y, z)
# --------------------------------------------------------------------------

def q_to_R(q):
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (qc ** 2 + qd ** 2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], axis=-1),
        jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb ** 2 + qd ** 2), 2 * (qc * qd - qa * qb)], axis=-1),
        jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb ** 2 + qc ** 2)], axis=-1),
    ], axis=-2)


def R_to_q(R, eps=1e-8):
    """Rotation matrix -> quaternion (branchless variant of camera.py:284-308)."""
    R00, R11, R22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    t = R00 + R11 + R22
    r = jnp.sqrt(jnp.clip(1 + t, eps, None))
    qa = 0.5 * r
    qb = jnp.sign(R[..., 2, 1] - R[..., 1, 2]) * 0.5 * jnp.sqrt(jnp.clip(1 + R00 - R11 - R22, eps, None))
    qc = jnp.sign(R[..., 0, 2] - R[..., 2, 0]) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 + R11 - R22, eps, None))
    qd = jnp.sign(R[..., 1, 0] - R[..., 0, 1]) * 0.5 * jnp.sqrt(jnp.clip(1 - R00 - R11 + R22, eps, None))
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def q_invert(q):
    norm2 = jnp.sum(q ** 2, axis=-1, keepdims=True)
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype) / norm2


def q_product(q1, q2):
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
        a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
        a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
        a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
    ], axis=-1)


# --------------------------------------------------------------------------
# 6D rotation parameterization (Zhou et al., reference camera.py:115-187)
# --------------------------------------------------------------------------

def sixd_to_SE3(w, eps=1e-8):
    """[...,9] (6D rotation + translation) -> [...,3,4]."""
    r, t = w[..., :6], w[..., 6:]
    x_raw, y_raw = r[..., :3], r[..., 3:]
    x = x_raw / jnp.clip(jnp.linalg.norm(x_raw, axis=-1, keepdims=True), eps, None)
    proj = jnp.sum(x * y_raw, axis=-1, keepdims=True) * x
    y_ortho = y_raw - proj
    y = y_ortho / jnp.clip(jnp.linalg.norm(y_ortho, axis=-1, keepdims=True), eps, None)
    z = jnp.cross(x, y)
    R = jnp.stack([x, y, z], axis=-1)
    return jnp.concatenate([R, t[..., None]], axis=-1)
