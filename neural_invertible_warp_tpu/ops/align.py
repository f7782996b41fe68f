"""Rigid/similarity alignment: Kabsch registration (in-graph, differentiable),
Procrustes sim(3) analysis, and Umeyama trajectory alignment.

* ``rigid_points_registration`` replaces roma.rigid_points_registration
  (reference model/nerf_inn_llff.py:569): differentiable batched Kabsch via
  jnp.linalg.svd on 3x3 cross-covariances — gradients flow through the SVD
  exactly as in the reference (the pose readout itself is detached by the
  caller, the loss term is not).
* ``procrustes_analysis`` ports camera.py:549-566 (similarity transform from
  camera centers); the host variant uses float64 numpy like the reference's
  ``.double()`` SVD.
* ``align_umeyama`` ports third_party/ATE/align_trajectory.py:28-84 for the
  DTU trajectory-alignment path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


@jax.custom_vjp
def procrustes_rotation(M):
    """R = argmax_{R in SO(3)} <R, M> for [...,3,3] cross-covariances.

    Forward is the usual SVD solution with det-flip. The backward pass uses the
    orthogonal-Procrustes differential dR = U W V^T with
    W_ij = (P_ij - P_ji) / (sigma_i + sigma_j) (same-sign block), which is
    numerically stable when singular values are CLOSE — the generic SVD JVP has
    1/(sigma_i^2 - sigma_j^2) terms that produce NaNs for near-symmetric point
    clouds (e.g. the pixel grid fed to the INN warp). torch's SVD backward
    clamps those denominators, jax's does not; this custom rule removes them.
    """
    R, _ = _procrustes_fwd_impl(M)
    return R


def _procrustes_fwd_impl(M):
    U, s, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    c = jnp.concatenate([jnp.ones_like(det)[..., None],
                         jnp.ones_like(det)[..., None],
                         det[..., None]], axis=-1)           # [...,3]
    R = (U * c[..., None, :]) @ Vt
    return R, (U, s, Vt, c)


def _procrustes_fwd(M):
    R, res = _procrustes_fwd_impl(M)
    return R, res


def _procrustes_bwd(res, G):
    U, s, Vt, c = res
    eps = 1e-8
    Gp = jnp.swapaxes(U, -1, -2) @ G @ jnp.swapaxes(Vt, -1, -2)  # U^T G V
    ci = c[..., :, None]
    cj = c[..., None, :]
    si = s[..., :, None]
    sj = s[..., None, :]
    same = ci * cj > 0
    # same-sign block: Q_ij = c_j (G'_ij - G'_ji) / (s_i + s_j)
    denom_plus = si + sj + eps
    Q_same = cj * (Gp - jnp.swapaxes(Gp, -1, -2)) / denom_plus
    # mixed-sign block: Q_ij = (c_j G'_ij - c_i G'_ji) / (s_j - s_i), clamped
    diff = sj - si
    denom_mix = jnp.where(jnp.abs(diff) < eps,
                          jnp.where(diff < 0, -eps, eps), diff)
    Q_mix = (cj * Gp - ci * jnp.swapaxes(Gp, -1, -2)) / denom_mix
    Q = jnp.where(same, Q_same, Q_mix)
    # zero the diagonal (R has no dependence on the singular values)
    Q = Q * (1.0 - jnp.eye(3, dtype=Q.dtype))
    Mbar = U @ Q @ Vt
    return (Mbar,)


procrustes_rotation.defvjp(_procrustes_fwd, _procrustes_bwd)


def _horn_quat_matrix(M):
    """Horn's 4x4 symmetric N(M) with q^T N q = <R(q), M> for unit q.

    Maximizing the quadratic form over unit quaternions solves the
    orthogonal-Procrustes problem over SO(3) directly (Horn 1987) — the
    det-flip of the SVD formulation is automatic because quaternions only
    parameterize proper rotations.
    """
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    r0 = jnp.stack([m00 + m11 + m22, m21 - m12, m02 - m20, m10 - m01], -1)
    r1 = jnp.stack([m21 - m12, m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    r2 = jnp.stack([m02 - m20, m01 + m10, m11 - m00 - m22, m12 + m21], -1)
    r3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, m22 - m00 - m11], -1)
    return jnp.stack([r0, r1, r2, r3], -2)


def _quat_to_rot(q):
    """Unit quaternion (w,x,y,z) -> rotation matrix [...,3,3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                    2 * (x * z + w * y)], -1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x)], -1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], -2)


def _skew(u):
    """[...,3] -> [...,3,3] with skew(u) @ v = u x v."""
    z = jnp.zeros_like(u[..., 0])
    return jnp.stack([
        jnp.stack([z, -u[..., 2], u[..., 1]], -1),
        jnp.stack([u[..., 2], z, -u[..., 0]], -1),
        jnp.stack([-u[..., 1], u[..., 0], z], -1)], -2)


def _vee(K):
    """Inverse of _skew for (not-necessarily-exactly) skew K."""
    return jnp.stack([K[..., 2, 1], K[..., 0, 2], K[..., 1, 0]], -1)


_QUAT_SQUARINGS = 12   # B^(2^12): gap amplification for near-degenerate N
_QUAT_POLISH_ITERS = 4


@jax.custom_vjp
def procrustes_rotation_quat(M):
    """SVD-free ``procrustes_rotation``: same R, pure jittable arithmetic.

    Forward: dominant eigenvector of Horn's 4x4 N(M). The shift 2|M|_F
    makes the top eigenvalue of B = N + shift*I strictly dominant for any
    M; repeated squaring (normalized, 12 times = effective power 4096)
    amplifies even near-degenerate spectral gaps, and a few plain power
    steps with the un-squared B polish the direction. Accuracy is then
    limited by the eigenvector problem's own conditioning (~eps/gap) —
    the same bound the SVD path obeys in fp32. No SVD/eigh custom calls:
    on TPU the whole map stays inside the fused program (the
    jnp.linalg.svd path costs ~0.14 ms/step of qdwh+eigh custom calls at
    the paper config).

    Backward: the argmax map's implicit differential. Stationarity of
    R(M) = argmax <R,M> says S = R^T M is symmetric; differentiating,
    dR = R [w]x with (tr(S) I - S) w = vee(R^T dM - dM^T R), giving the
    closed-form VJP  Mbar = R [ (tr(S) I - S)^{-1} vee(R^T G - G^T R) ]x.
    The 3x3 solve uses the adjugate (no custom calls); its spectrum is
    {s_i + s_j} — the same stable denominators as the same-sign block of
    the SVD-based VJP above.
    """
    R, _ = _procrustes_quat_fwd_impl(M)
    return R


def _procrustes_quat_fwd_impl(M):
    N = _horn_quat_matrix(M)
    fro = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True))
    B = N + (2.0 * fro + 1e-30) * jnp.eye(4, dtype=M.dtype)

    def square(_, P):
        P = P @ P
        return P / jnp.sqrt(jnp.sum(P * P, axis=(-2, -1), keepdims=True))

    P = jax.lax.fori_loop(0, _QUAT_SQUARINGS, square,
                          B / (jnp.sqrt(jnp.sum(B * B, axis=(-2, -1),
                                                keepdims=True))))
    # P ~ v v^T (rank-1): the column with the largest norm is ~v
    col_norms = jnp.sum(P * P, axis=-2)
    idx = jnp.argmax(col_norms, axis=-1)
    v = jnp.take_along_axis(P, idx[..., None, None], axis=-1)[..., 0]
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def polish(_, v):
        v = (B @ v[..., None])[..., 0]
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    v = jax.lax.fori_loop(0, _QUAT_POLISH_ITERS, polish, v)
    R = _quat_to_rot(v)
    return R, (R, M)


def _procrustes_quat_bwd(res, G):
    R, M = res
    S = jnp.swapaxes(R, -1, -2) @ M
    S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
    trS = S[..., 0, 0] + S[..., 1, 1] + S[..., 2, 2]
    T = trS[..., None, None] * jnp.eye(3, dtype=S.dtype) - S
    a = _vee(jnp.swapaxes(R, -1, -2) @ G - jnp.swapaxes(G, -1, -2) @ R)
    # closed-form symmetric 3x3 solve via adjugate, clamped determinant
    t00, t01, t02 = T[..., 0, 0], T[..., 0, 1], T[..., 0, 2]
    t11, t12, t22 = T[..., 1, 1], T[..., 1, 2], T[..., 2, 2]
    c00 = t11 * t22 - t12 * t12
    c01 = t02 * t12 - t01 * t22
    c02 = t01 * t12 - t02 * t11
    c11 = t00 * t22 - t02 * t02
    c12 = t01 * t02 - t00 * t12
    c22 = t00 * t11 - t01 * t01
    det = t00 * c00 + t01 * c01 + t02 * c02
    eps = jnp.asarray(1e-12, T.dtype)
    det = jnp.where(jnp.abs(det) < eps,
                    jnp.where(det < 0, -eps, eps), det)
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], -1),
        jnp.stack([c01, c11, c12], -1),
        jnp.stack([c02, c12, c22], -1)], -2)
    u = (adj @ a[..., None])[..., 0] / det[..., None]
    return (R @ _skew(u),)


procrustes_rotation_quat.defvjp(
    lambda M: _procrustes_quat_fwd_impl(M), _procrustes_quat_bwd)


def rigid_points_registration(x, y, weights=None, method="svd"):
    """Least-squares rigid transform: finds (R, t) with R @ x_i + t ~= y_i.

    Args:
        x, y: [...,N,3] point sets.
        weights: optional [...,N] nonnegative weights.
        method: "svd" (jnp.linalg.svd forward) or "quat" (SVD-free Horn
            quaternion forward + implicit-differential VJP; identical math,
            no TPU custom calls — see ``procrustes_rotation_quat``).
    Returns:
        R: [...,3,3], t: [...,3]. Differentiable.
    """
    if weights is not None:
        w = weights[..., None]
        wsum = jnp.sum(w, axis=-2, keepdims=True)
        cx = jnp.sum(x * w, axis=-2, keepdims=True) / wsum
        cy = jnp.sum(y * w, axis=-2, keepdims=True) / wsum
        M = jnp.swapaxes((y - cy) * w, -1, -2) @ (x - cx)
    else:
        cx = jnp.mean(x, axis=-2, keepdims=True)
        cy = jnp.mean(y, axis=-2, keepdims=True)
        M = jnp.swapaxes(y - cy, -1, -2) @ (x - cx)          # [...,3,3]
    rot_fn = {"svd": procrustes_rotation,
              "quat": procrustes_rotation_quat}[method]
    R = rot_fn(M)
    t = cy[..., 0, :] - (R @ cx[..., 0, :, None])[..., 0]
    return R, t


def procrustes_analysis_np(X0, X1):
    """sim(3) aligning X1 to X0 (host-side, float64; camera.py:549-566).

    Returns dict(t0, t1, s0, s1, R) such that
    X1to0 = (X1 - t1)/s1 @ R.T * s0 + t0.
    """
    X0 = np.asarray(X0, dtype=np.float64)
    X1 = np.asarray(X1, dtype=np.float64)
    t0 = X0.mean(axis=0)
    t1 = X1.mean(axis=0)
    X0c = X0 - t0
    X1c = X1 - t1
    s0 = np.sqrt((X0c ** 2).sum(axis=-1).mean())
    s1 = np.sqrt((X1c ** 2).sum(axis=-1).mean())
    U, _, Vt = np.linalg.svd(X0c.T / s0 @ (X1c / s1))
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return dict(
        t0=t0.astype(np.float32), t1=t1.astype(np.float32),
        s0=np.float32(s0), s1=np.float32(s1), R=R.astype(np.float32),
    )


def procrustes_analysis(X0, X1):
    """jnp version of ``procrustes_analysis_np`` (fp32, jit-safe)."""
    t0 = X0.mean(axis=0)
    t1 = X1.mean(axis=0)
    X0c = X0 - t0
    X1c = X1 - t1
    s0 = jnp.sqrt((X0c ** 2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c ** 2).sum(axis=-1).mean())
    U, _, Vt = jnp.linalg.svd((X0c / s0).T @ (X1c / s1))
    R = U @ Vt
    R = jnp.where(jnp.linalg.det(R) < 0, R.at[2].multiply(-1), R)
    return dict(t0=t0, t1=t1, s0=s0, s1=s1, R=R)


def apply_sim3_to_poses(pose, sim3, direction="pred_to_GT"):
    """Align a pose set using a sim3 from ``procrustes_analysis``.

    direction="pred_to_GT" mirrors reference model/barf.py:117-121 (align the
    optimized poses into the GT frame for error computation);
    direction="GT_to_pred" mirrors model/barf.py:237-243 (move GT test poses
    into the optimized frame for rendering).
    """
    from . import pose as pose_ops
    center = jnp.zeros((pose.shape[0], 1, 3), dtype=pose.dtype)
    center = pose_ops.cam2world(center, pose)[:, 0]
    R, t0, t1, s0, s1 = sim3["R"], sim3["t0"], sim3["t1"], sim3["s0"], sim3["s1"]
    if direction == "pred_to_GT":
        center_aligned = (center - t1) / s1 @ R.T * s0 + t0
        R_aligned = pose[..., :3] @ R.T
    else:
        center_aligned = (center - t0) / s0 @ R * s1 + t1
        R_aligned = pose[..., :3] @ R
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return pose_ops.make_pose(R=R_aligned, t=t_aligned)


def align_umeyama(model, data, known_scale=False, yaw_only=False):
    """Umeyama sim(3): s, R, t with model ~= s * R @ data + t (host, float64).

    Port of the vendored ATE toolbox (third_party/ATE/align_trajectory.py:28-84)
    used by the DTU alignment path.
    """
    model = np.asarray(model, dtype=np.float64)
    data = np.asarray(data, dtype=np.float64)
    mu_M = model.mean(axis=0)
    mu_D = data.mean(axis=0)
    model_zc = model - mu_M
    data_zc = data - mu_D
    n = model.shape[0]
    C = (model_zc.T @ data_zc) / n
    sigma2 = (data_zc ** 2).sum() / n
    U, D_diag, Vt = np.linalg.svd(C)
    D = np.diag(D_diag)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt.T) < 0:
        S[2, 2] = -1
    if yaw_only:
        rot_C = data_zc.T @ model_zc
        theta = _get_best_yaw(rot_C)
        R = _rot_z(theta)
    else:
        R = U @ S @ Vt
    # Degenerate-trajectory guard (third_party/ATE/align_trajectory.py:59-66,
    # 80): a collapsed point cloud (all centers equal, e.g. identity-init
    # poses) has sigma2 ~ 0; the reference forces s=1 there instead of
    # dividing to inf/NaN. The +1e-6 in the divisor is also the reference's.
    if known_scale or sigma2 < 1e-5:
        s = 1.0
    else:
        s = float(np.trace(D @ S) / (sigma2 + 1e-6))
    t = mu_M - s * R @ mu_D
    return s, R, t


def _get_best_yaw(C):
    A = C[0, 1] - C[1, 0]
    B = C[0, 0] + C[1, 1]
    return np.pi / 2 - np.arctan2(B, A)


def _rot_z(theta):
    R = np.eye(3)
    R[0, 0] = np.cos(theta)
    R[0, 1] = -np.sin(theta)
    R[1, 0] = np.sin(theta)
    R[1, 1] = np.cos(theta)
    return R


# ---------------------------------------------------------------------------
# Trajectory alignment for the DTU path (host-side numpy, float64)
# Parity: reference align_trajectories.py + model/barf_dtu.py:196-322
# ---------------------------------------------------------------------------

def _np_invert_pose(pose):
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = np.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return np.concatenate([R_inv, t_inv[..., None]], axis=-1)


def align_ate_c2b_use_a2b(traj_a_c2w, traj_b_c2w):
    """Umeyama sim3 from trajectory a to b, applied to a.

    Returns (traj_a_aligned_c2w [N,3,4], ssim) with
    ssim = dict(R [3,3], t [3,1], s, type='traj_align') such that
    b ~= s * R @ a + t on camera positions (reference align_trajectories.py:89-138).
    """
    traj_a = np.asarray(traj_a_c2w, np.float64)
    traj_b = np.asarray(traj_b_c2w, np.float64)
    s, R, t = align_umeyama(traj_b[:, :3, 3], traj_a[:, :3, 3])
    R_a = traj_a[:, :3, :3]
    t_a = traj_a[:, :3, 3:4]
    R_aligned = R[None] @ R_a
    t_aligned = s * (R[None] @ t_a) + t.reshape(1, 3, 1)
    aligned = np.concatenate([R_aligned, t_aligned], axis=2).astype(np.float32)
    ssim = dict(R=R.astype(np.float32), t=t.reshape(3, 1).astype(np.float32),
                s=float(s), type="traj_align")
    return aligned, ssim


def apply_traj_align_ssim(pose_w2c, ssim):
    """Apply a fitted 'traj_align' sim3 to any w2c pose set (the forward
    form used inside align_ate_c2b_use_a2b / the small-system search).

    Lets the sim3 be FIT on a trusted subset (e.g. SfM-valid images) and
    then applied to the full set, so identity placeholders for excluded
    images cannot bias the fit."""
    pose_c2w = _np_invert_pose(np.asarray(pose_w2c, np.float32))
    R, t, s = ssim["R"], np.reshape(ssim["t"], (1, 3, 1)), ssim["s"]
    R_aligned = R[None] @ pose_c2w[:, :3, :3]
    t_aligned = s * (R[None] @ pose_c2w[:, :3, 3:4]) + t
    aligned = np.concatenate([R_aligned, t_aligned], axis=2).astype(np.float32)
    return _np_invert_pose(aligned)


def backtrack_from_aligning_the_trajectory(pose_GT_w2c, ssim):
    """Move GT test poses into the optimized coordinate frame
    (reference align_trajectories.py:56-62)."""
    pose_GT_w2c = np.asarray(pose_GT_w2c, np.float32)
    pose_GT_c2w = _np_invert_pose(pose_GT_w2c)
    R, t, s = ssim["R"], ssim["t"].reshape(3, 1), ssim["s"]
    R_aligned = R.T[None] @ pose_GT_c2w[:, :3, :3]
    t_aligned = (R.T / s)[None] @ (pose_GT_c2w[:, :3, 3:4] - t[None])
    pose_c2w_aligned = np.concatenate([R_aligned, t_aligned], axis=2)
    return _np_invert_pose(pose_c2w_aligned.astype(np.float32))


def align_translations(GT_poses_w2c, initial_poses_w2c):
    """Shift initial c2w camera centers to match the GT center of mass
    (reference align_trajectories.py:65-86). Both args [N,3,4] w2c."""
    GT_c2w = _np_invert_pose(np.asarray(GT_poses_w2c, np.float32))
    init_c2w = _np_invert_pose(np.asarray(initial_poses_w2c, np.float32))
    trans_error = GT_c2w[:, :3, 3].mean(0) - init_c2w[:, :3, 3].mean(0)
    init_c2w[:, :3, 3] += trans_error
    return _np_invert_pose(init_c2w)


def _pose_errors_np(pose_aligned_w2c, pose_GT_w2c):
    """Rotation (rad) + camera-center translation errors, c2w convention
    (reference model/barf_dtu.py:164-194)."""
    a_c2w = _np_invert_pose(np.asarray(pose_aligned_w2c, np.float64))
    g_c2w = _np_invert_pose(np.asarray(pose_GT_w2c, np.float64))
    R_diff = a_c2w[:, :, :3] @ np.swapaxes(g_c2w[:, :, :3], -1, -2)
    trace = np.clip((np.trace(R_diff, axis1=-2, axis2=-1) - 1) / 2,
                    -1 + 1e-7, 1 - 1e-7)
    R_err = np.arccos(trace)
    t_err = np.linalg.norm(a_c2w[:, :, 3] - g_c2w[:, :, 3], axis=-1)
    return R_err, t_err


def prealign_w2c_large_camera_systems(pose_w2c, pose_GT_w2c):
    """ATE/Umeyama sim3 alignment (>=10 cameras; model/barf_dtu.py:196-226)."""
    pose_c2w = _np_invert_pose(np.asarray(pose_w2c, np.float32))
    pose_GT_c2w = _np_invert_pose(np.asarray(pose_GT_w2c, np.float32))
    try:
        aligned_c2w, ssim = align_ate_c2b_use_a2b(pose_c2w, pose_GT_c2w)
        pose_aligned_w2c = _np_invert_pose(aligned_c2w)
    except np.linalg.LinAlgError:
        pose_aligned_w2c = np.asarray(pose_w2c, np.float32)
        ssim = dict(R=np.eye(3, dtype=np.float32),
                    t=np.zeros((3, 1), np.float32), s=1.0, type="traj_align")
    return pose_aligned_w2c, ssim


def prealign_w2c_small_camera_systems(pose_w2c, pose_GT_w2c):
    """Exhaustive pairwise alignment for <10 cameras
    (reference model/barf_dtu.py:229-322): for every camera pair, rescale by
    the pair distance ratio and align the first pose exactly; keep the
    candidate with the smallest rotation*translation error product."""
    pose_w2c = np.asarray(pose_w2c, np.float32)
    pose_GT_w2c = np.asarray(pose_GT_w2c, np.float32)
    pose_c2w = _np_invert_pose(pose_w2c)
    pose_GT_c2w = _np_invert_pose(pose_GT_w2c)
    B = pose_c2w.shape[0]

    def pad(p):
        out = np.tile(np.eye(4, dtype=np.float64), (p.shape[0], 1, 1))
        out[:, :3] = p
        return out

    from_p = pad(pose_c2w)
    to_p = pad(pose_GT_c2w)

    best = None
    for a in range(min(B, 10)):
        for b in range(min(B, 10)):
            if a == b:
                continue
            f = from_p.copy()
            dist_from = np.linalg.norm(f[a, :3, 3] - f[b, :3, 3])
            dist_to = np.linalg.norm(to_p[a, :3, 3] - to_p[b, :3, 3])
            scale = dist_to / max(dist_from, 1e-12)
            f[:, :3, 3] *= scale
            T = to_p[a] @ np.linalg.inv(f[a])
            aligned_c2w = (T[None] @ f)[:, :3].astype(np.float32)
            aligned_w2c = _np_invert_pose(aligned_c2w)
            R_err, t_err = _pose_errors_np(aligned_w2c, pose_GT_w2c)
            score = float(t_err.mean()) * float(np.rad2deg(R_err.mean()))
            ssim = dict(R=T[:3, :3].astype(np.float32),
                        t=T[:3, 3].reshape(3, 1).astype(np.float32),
                        s=float(scale), type="traj_align")
            if best is None or score < best[0]:
                best = (score, aligned_w2c, ssim)
    return best[1], best[2]
