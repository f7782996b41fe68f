"""Rigid camera-pose operations on [...,3,4] = [R|t] world-to-camera matrices.

jnp port of reference camera.py:64-112 (Pose) and :330-346 (coordinate
transforms). Composition convention matches the reference:
``compose([p1, p2])`` applies p1 first, then p2 (p2 ∘ p1).
"""

from __future__ import annotations

import jax.numpy as jnp


def make_pose(R=None, t=None):
    """Assemble [...,3,4] from rotation and/or translation (camera.py:70-87)."""
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t, dtype=jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), t.shape[:-1] + (3, 3))
    elif t is None:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.zeros(R.shape[:-1], dtype=R.dtype)
    else:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.asarray(t, dtype=jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def identity_pose(batch_shape=(), dtype=jnp.float32):
    eye = jnp.eye(3, 4, dtype=dtype)
    return jnp.broadcast_to(eye, tuple(batch_shape) + (3, 4))


def invert_pose(pose):
    """[R|t] -> [R^T | -R^T t]."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -2, -1)
    t_inv = (-R_inv @ t)[..., 0]
    return make_pose(R=R_inv, t=t_inv)


def compose_pair(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x))."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return make_pose(R=R_new, t=t_new)


def compose(pose_list):
    """Compose a sequence: poseN ∘ ... ∘ pose1."""
    out = pose_list[0]
    for p in pose_list[1:]:
        out = compose_pair(out, p)
    return out


def to_hom(X):
    """[...,k] -> [...,k+1] homogeneous coordinates."""
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X, pose):
    """Apply a w2c pose to points: [...,N,3], [...,3,4] -> [...,N,3]."""
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2world(X, pose):
    """Apply the inverse of a w2c pose (camera.py:343-346)."""
    return to_hom(X) @ jnp.swapaxes(invert_pose(pose), -1, -2)


def cam2img(X, intr):
    return X @ jnp.swapaxes(intr, -1, -2)


def img2cam(X, intr):
    return X @ jnp.swapaxes(jnp.linalg.inv(intr), -1, -2)


def rotation_distance(R1, R2, eps=1e-7):
    """Angle (rad) between two rotations (camera.py:542-547)."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def pose_distance(pose_a, pose_b):
    """(rotation angle, translation L2) between two pose sets."""
    R_err = rotation_distance(pose_a[..., :3], pose_b[..., :3])
    t_err = jnp.linalg.norm(pose_a[..., 3] - pose_b[..., 3], axis=-1)
    return R_err, t_err


def angle_to_rotation_matrix(a, axis):
    """Euler rotation around X/Y/Z (reference camera.py:348-357)."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    O = jnp.zeros_like(a)
    I = jnp.ones_like(a)
    M = jnp.stack([
        jnp.stack([jnp.cos(a), -jnp.sin(a), O], axis=-1),
        jnp.stack([jnp.sin(a), jnp.cos(a), O], axis=-1),
        jnp.stack([O, O, I], axis=-1),
    ], axis=-2)
    return jnp.roll(M, (roll, roll), axis=(-2, -1))


def get_novel_view_poses(pose_anchor, N=60, scale=1.0):
    """Circular novel-view trajectory around an anchor camera
    (reference camera.py:568-578)."""
    theta = jnp.arange(N) / N * 2 * jnp.pi
    R_x = angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.05), "X")
    R_y = angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.05), "Y")
    pose_rot = make_pose(R=R_y @ R_x)
    pose_shift = make_pose(t=jnp.array([0.0, 0.0, -4.0 * scale]))
    pose_shift2 = make_pose(t=jnp.array([0.0, 0.0, 3.8 * scale]))
    pose_oscil = compose([jnp.broadcast_to(pose_shift, pose_rot.shape),
                          pose_rot,
                          jnp.broadcast_to(pose_shift2, pose_rot.shape)])
    return compose([pose_oscil, jnp.broadcast_to(pose_anchor, pose_rot.shape)])
