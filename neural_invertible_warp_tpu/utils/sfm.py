"""Incremental structure-from-motion with known intrinsics (host + JAX).

TPU-native replacement for the reference's pycolmap triangulation backend
(reference utils/colmap_initialization/sfm.py:337-406 and
reconstruction_know_intrinsics_for_hloc.py:1-148): the reference dumps images
to disk, runs hloc + pycolmap as an external C++ process, and reads poses
back from images.bin. Here the same capability is an in-process pipeline —
matcher-agnostic correspondences -> track graph -> essential-matrix seed ->
DLT triangulation -> PnP registration -> bundle adjustment — where the only
iterative-heavy stage (BA) is a single jitted JAX optimizer so it runs on
the accelerator.

Conventions: poses are [3,4] w2c ([R|t], x_cam = R @ x_world + t), matching
the rest of the framework (ops/pose.py). Intrinsics are [3,3]. All geometry
below operates on NORMALIZED camera coordinates (pixels premultiplied by
K^-1); reprojection thresholds are therefore in normalized units
(≈ pixels / focal).
"""

from __future__ import annotations

import numpy as np

from . import log


# ---------------------------------------------------------------------------
# basic geometry (host, float64)
# ---------------------------------------------------------------------------

def normalize_pixels(kp, K):
    """[N,2] pixels -> normalized camera coords via K^-1."""
    kp = np.asarray(kp, np.float64)
    Kinv = np.linalg.inv(np.asarray(K, np.float64))
    h = np.concatenate([kp, np.ones_like(kp[:, :1])], axis=1)
    x = h @ Kinv.T
    return x[:, :2] / x[:, 2:]


def eight_point_essential(x1, x2):
    """Essential matrix from >=8 normalized correspondences (8-point +
    rank/singular-value projection). x1,x2: [N,2]."""
    N = x1.shape[0]
    A = np.empty((N, 9))
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    # x2^T E x1 = 0, E raveled row-major
    A[:, 0] = u2 * u1
    A[:, 1] = u2 * v1
    A[:, 2] = u2
    A[:, 3] = v2 * u1
    A[:, 4] = v2 * v1
    A[:, 5] = v2
    A[:, 6] = u1
    A[:, 7] = v1
    A[:, 8] = 1.0
    _, _, Vt = np.linalg.svd(A, full_matrices=False)
    E = Vt[-1].reshape(3, 3)
    U, _, Vt = np.linalg.svd(E)
    return U @ np.diag([1.0, 1.0, 0.0]) @ Vt


def sampson_distance(E, x1, x2):
    """First-order epipolar distance per correspondence (normalized units)."""
    h1 = np.concatenate([x1, np.ones_like(x1[:, :1])], axis=1)
    h2 = np.concatenate([x2, np.ones_like(x2[:, :1])], axis=1)
    Ex1 = h1 @ E.T          # [N,3]
    Etx2 = h2 @ E           # [N,3]
    num = np.sum(h2 * Ex1, axis=1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / np.maximum(den, 1e-12)


def ransac_essential(x1, x2, thresh=2e-3, iters=500, seed=0):
    """RANSAC 8-point essential. Returns (E, inlier_mask) or (None, None)."""
    N = x1.shape[0]
    if N < 8:
        return None, None
    rng = np.random.RandomState(seed)
    best_E, best_inl = None, None
    best_n = 0
    for _ in range(iters):
        idx = rng.choice(N, 8, replace=False)
        try:
            E = eight_point_essential(x1[idx], x2[idx])
        except np.linalg.LinAlgError:
            continue
        inl = sampson_distance(E, x1, x2) < thresh ** 2
        n = int(inl.sum())
        if n > best_n:
            best_n, best_E, best_inl = n, E, inl
    if best_E is None or best_n < 8:
        return None, None
    # refit on inliers
    E = eight_point_essential(x1[best_inl], x2[best_inl])
    inl = sampson_distance(E, x1, x2) < thresh ** 2
    return E, inl


def triangulate(P1, P2, x1, x2):
    """DLT triangulation. P: [3,4] w2c (normalized projection), x: [N,2]
    normalized. Returns [N,3] world points."""
    N = x1.shape[0]
    X = np.empty((N, 3))
    for k in range(N):
        A = np.stack([
            x1[k, 0] * P1[2] - P1[0],
            x1[k, 1] * P1[2] - P1[1],
            x2[k, 0] * P2[2] - P2[0],
            x2[k, 1] * P2[2] - P2[1],
        ])
        _, _, Vt = np.linalg.svd(A)
        Xh = Vt[-1]
        X[k] = Xh[:3] / Xh[3]
    return X


def depth_in_camera(P, X):
    """Per-point depth (z in camera frame) for w2c P=[R|t]."""
    return X @ P[:3, :3].T[:, 2] + P[2, 3]


def pose_from_essential(E, x1, x2):
    """Decompose E into the (R,t) of camera 2 w.r.t. camera 1 world frame
    (camera 1 = identity) choosing the candidate with maximal cheirality.
    Returns ([3,4] w2c pose of camera 2, inlier cheirality mask)."""
    U, _, Vt = np.linalg.svd(E)
    if np.linalg.det(U) < 0:
        U = -U
    if np.linalg.det(Vt) < 0:
        Vt = -Vt
    W = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    t = U[:, 2]
    P1 = np.eye(3, 4)
    best, best_n, best_front = None, -1, None
    for R in (U @ W @ Vt, U @ W.T @ Vt):
        for tt in (t, -t):
            P2 = np.concatenate([R, tt[:, None]], axis=1)
            X = triangulate(P1, P2, x1, x2)
            front = (depth_in_camera(P1, X) > 0) & (depth_in_camera(P2, X) > 0)
            n = int(front.sum())
            if n > best_n:
                best, best_n, best_front = P2, n, front
    return best, best_front


def pnp_dlt(X, x):
    """Linear PnP: DLT for the full projection matrix from >=6 2D-3D
    correspondences in normalized coords, then orthogonalize R via SVD.
    X: [N,3] world, x: [N,2] normalized. Returns [3,4] w2c pose."""
    N = X.shape[0]
    A = np.zeros((2 * N, 12))
    Xh = np.concatenate([X, np.ones((N, 1))], axis=1)
    A[0::2, 0:4] = Xh
    A[0::2, 8:12] = -x[:, 0:1] * Xh
    A[1::2, 4:8] = Xh
    A[1::2, 8:12] = -x[:, 1:2] * Xh
    _, _, Vt = np.linalg.svd(A, full_matrices=False)
    P = Vt[-1].reshape(3, 4)
    # fix sign: points must be in front
    if np.median(Xh @ P[2]) < 0:
        P = -P
    U, s, Vt = np.linalg.svd(P[:, :3])
    R = U @ Vt
    scale = float(np.mean(s))
    if np.linalg.det(R) < 0:
        # P[:,:3] ≈ (-scale)·(-U Vt): keep det(R)=+1 by flipping both
        R, scale = -R, -scale
    t = P[:, 3] / scale
    return np.concatenate([R, t[:, None]], axis=1)


def reprojection_error(P, X, x):
    """Normalized-coords reprojection error per point."""
    Xc = X @ P[:3, :3].T + P[:3, 3]
    proj = Xc[:, :2] / np.maximum(Xc[:, 2:], 1e-9)
    return np.linalg.norm(proj - x, axis=1), Xc[:, 2]


def ransac_pnp(X, x, thresh=2e-3, iters=300, seed=0):
    """RANSAC over pnp_dlt. Returns (pose, inlier_mask) or (None, None)."""
    N = X.shape[0]
    if N < 6:
        return None, None
    rng = np.random.RandomState(seed)
    best_P, best_inl, best_n = None, None, 0
    for _ in range(iters):
        idx = rng.choice(N, 6, replace=False)
        try:
            P = pnp_dlt(X[idx], x[idx])
        except np.linalg.LinAlgError:
            continue
        err, z = reprojection_error(P, X, x)
        inl = (err < thresh) & (z > 0)
        n = int(inl.sum())
        if n > best_n:
            best_n, best_P, best_inl = n, P, inl
    if best_P is None or best_n < 6:
        return None, None
    P = pnp_dlt(X[best_inl], x[best_inl])
    err, z = reprojection_error(P, X, x)
    inl = (err < thresh) & (z > 0)
    return P, inl


# ---------------------------------------------------------------------------
# track graph: merge pairwise matches into multi-view tracks
# ---------------------------------------------------------------------------

class TrackGraph:
    """Union-find over (image, quantized-keypoint) observations."""

    def __init__(self, quant=1.0):
        self.quant = quant
        self.parent = {}
        self.obs = {}      # node -> (img, xy)

    def _key(self, img, xy):
        return (img, int(round(xy[0] / self.quant)),
                int(round(xy[1] / self.quant)))

    def _find(self, a):
        root = a
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[a] != root:
            self.parent[a], a = root, self.parent[a]
        return root

    def add_match(self, i, j, xy_i, xy_j):
        a, b = self._key(i, xy_i), self._key(j, xy_j)
        for node, img, xy in ((a, i, xy_i), (b, j, xy_j)):
            if node not in self.parent:
                self.parent[node] = node
                self.obs[node] = (img, np.asarray(xy, np.float64))
        ra, rb = self._find(a), self._find(b)
        if ra != rb:
            self.parent[rb] = ra

    def tracks(self, min_len=2):
        """-> list of {img: xy} dicts (one observation per image per track)."""
        groups = {}
        for node in self.parent:
            groups.setdefault(self._find(node), []).append(node)
        out = []
        for nodes in groups.values():
            track = {}
            ok = True
            for node in nodes:
                img, xy = self.obs[node]
                if img in track:
                    # conflicting observations in one image -> drop ambiguity
                    if np.linalg.norm(track[img] - xy) > 2 * self.quant:
                        ok = False
                        break
                else:
                    track[img] = xy
            if ok and len(track) >= min_len:
                out.append(track)
        return out


# ---------------------------------------------------------------------------
# bundle adjustment (JAX, jitted Adam on Huber reprojection error)
# ---------------------------------------------------------------------------

def bundle_adjust(poses, points, obs_cam, obs_pt, obs_xy, fixed_cam=0,
                  iters=200, lr=1e-3, huber=5e-3):
    """Refine poses+points by minimizing Huber reprojection error.

    Args:
        poses: [M,3,4] w2c initial poses.
        points: [P,3] initial world points.
        obs_cam / obs_pt: [K] int indices into poses / points.
        obs_xy: [K,2] normalized observations.
        fixed_cam: gauge-fixing camera (its delta stays zero).
    Returns: (poses [M,3,4], points [P,3]) refined, as numpy.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from ..ops import lie, pose as pose_ops

    # SfM init is one-shot host-side preprocessing: pin the (tiny) BA to the
    # CPU backend so it never pays a multi-minute remote-TPU compile
    cpu = jax.devices("cpu")[0]
    device_ctx = jax.default_device(cpu)
    device_ctx.__enter__()

    poses0 = jnp.asarray(poses, jnp.float32)
    params = dict(delta=jnp.zeros((poses.shape[0], 6), jnp.float32),
                  points=jnp.asarray(points, jnp.float32))
    obs_cam = jnp.asarray(obs_cam, jnp.int32)
    obs_pt = jnp.asarray(obs_pt, jnp.int32)
    obs_xy = jnp.asarray(obs_xy, jnp.float32)
    fix = jnp.arange(poses.shape[0]) == fixed_cam

    def current_poses(params):
        delta = jnp.where(fix[:, None], 0.0, params["delta"])
        return pose_ops.compose([lie.se3_to_SE3(delta), poses0])

    def loss_fn(params):
        P = current_poses(params)                      # [M,3,4]
        Rc = P[obs_cam, :, :3]                         # [K,3,3]
        tc = P[obs_cam, :, 3]                          # [K,3]
        Xc = jnp.einsum("kij,kj->ki", Rc, params["points"][obs_pt]) + tc
        proj = Xc[:, :2] / jnp.maximum(Xc[:, 2:], 1e-6)
        r = proj - obs_xy
        # Huber; eps-safe norm (d|r|/dr is NaN at exactly 0, which perfect
        # synthetic observations do reach)
        n = jnp.sqrt(jnp.sum(r ** 2, axis=1) + 1e-16)
        l = jnp.where(n < huber, 0.5 * n ** 2, huber * (n - 0.5 * huber))
        # discourage points behind cameras
        behind = jax.nn.relu(1e-3 - Xc[:, 2])
        return jnp.mean(l) + 10.0 * jnp.mean(behind)

    tx = optax.adam(lr)

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def body(_, carry):
            params, opt_state = carry
            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, iters, body, (params, opt_state))
        return current_poses(params), params["points"], loss_fn(params)

    try:
        new_poses, new_points, final_loss = run(params)
        return (np.asarray(new_poses, np.float64),
                np.asarray(new_points, np.float64), float(final_loss))
    finally:
        device_ctx.__exit__(None, None, None)


# ---------------------------------------------------------------------------
# incremental reconstruction
# ---------------------------------------------------------------------------

def _native():
    """The C++ geometry core (native/sfm_core.cpp) when buildable/loadable;
    None -> numpy fallbacks above. NIW_NO_NATIVE=1 forces numpy."""
    from . import sfm_native
    return sfm_native if sfm_native.available() else None


def incremental_sfm(pair_matches, intrinsics, n_images, thresh_px=2.0,
                    min_track_len=2, ba_iters=300, seed=0, quant=1.0):
    """Incremental SfM with known intrinsics.

    Args:
        pair_matches: dict (i,j) -> (kps_i [N,2] px, kps_j [N,2] px), i<j.
        intrinsics: [n,3,3].
        n_images: number of cameras.
        thresh_px: inlier / acceptance threshold in PIXELS (converted to
            normalized units per camera via its focal length, like COLMAP's
            pixel-space max reprojection error).
    Returns:
        poses [n,3,4] w2c (identity for failures), valid list, excluded list.
        The reconstruction's global scale/frame is arbitrary (as with COLMAP).
    """
    intr = np.asarray(intrinsics, np.float64)
    focal = 0.5 * (intr[:, 0, 0] + intr[:, 1, 1])
    th = thresh_px / focal          # per-camera normalized threshold

    # 1. normalized matches + track graph
    graph = TrackGraph(quant=quant)
    norm = {}
    for (i, j), (xi, xj) in pair_matches.items():
        xi, xj = np.asarray(xi, np.float64), np.asarray(xj, np.float64)
        if len(xi) == 0:
            continue
        norm[(i, j)] = (normalize_pixels(xi, intr[i]),
                        normalize_pixels(xj, intr[j]))
        for k in range(len(xi)):
            graph.add_match(i, j, xi[k], xj[k])
    tracks = graph.tracks(min_len=min_track_len)
    if not tracks:
        log.warn("sfm: no tracks; returning identity poses")
        return (np.tile(np.eye(3, 4), (n_images, 1, 1)).astype(np.float32),
                [], list(range(n_images)))
    # per-track normalized observations
    track_obs = []
    for t in tracks:
        track_obs.append({img: normalize_pixels(xy[None], intr[img])[0]
                          for img, xy in t.items()})

    # 2. seed pair: RANSAC-verified inliers AND sufficient triangulation
    # angle (COLMAP's init criterion — a near-zero-baseline neighbor pair
    # can have the most inliers but triangulates ill-conditioned points
    # that poison every subsequent PnP registration)
    nat = _native()
    if nat is not None:
        log.info("sfm: using native geometry core (libniw_sfm.so)")
    ransac_e = nat.ransac_essential if nat else \
        (lambda a, b, thresh, seed: ransac_essential(a, b, thresh=thresh,
                                                     seed=seed))
    pose_from_e = nat.pose_from_essential if nat else pose_from_essential
    candidates = []
    for (i, j), (x1, x2) in norm.items():
        E, inl = ransac_e(x1, x2, thresh=max(th[i], th[j]), seed=seed)
        if E is not None and int(inl.sum()) >= 8:
            candidates.append((int(inl.sum()), (i, j), E, inl))
    candidates.sort(key=lambda c: -c[0])
    seed_pair = None
    best_score = 0.0
    for n_inl, (i, j), E, inl in candidates[:30]:
        x1i, x2i = norm[(i, j)][0][inl], norm[(i, j)][1][inl]
        P2, _ = pose_from_e(E, x1i, x2i)   # 2nd value differs native/python
        if P2 is None:
            continue
        X = triangulate(np.eye(3, 4), P2, x1i, x2i)
        keep = (depth_in_camera(np.eye(3, 4), X) > 0) \
            & (depth_in_camera(P2, X) > 0)
        if int(keep.sum()) < 8:
            continue
        X = X[keep]
        # median triangulation angle over the cheirality-positive points
        c2 = -P2[:, :3].T @ P2[:, 3]
        r1 = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        r2 = X - c2[None]
        r2 = r2 / np.maximum(np.linalg.norm(r2, axis=1, keepdims=True), 1e-12)
        ang = np.degrees(np.arccos(np.clip(np.sum(r1 * r2, axis=1),
                                           -1.0, 1.0)))
        med_ang = float(np.median(ang))
        score = n_inl * min(med_ang / 4.0, 1.0)   # full credit at >= 4 deg
        if score > best_score:
            best_score = score
            seed_pair, seed_P2 = (i, j), P2
    if seed_pair is None:
        log.warn("sfm: no valid seed pair; returning identity poses")
        return (np.tile(np.eye(3, 4), (n_images, 1, 1)).astype(np.float32),
                [], list(range(n_images)))
    i0, j0 = seed_pair
    log.info("sfm: seed pair {} (score {:.1f})".format(seed_pair,
                                                       best_score))
    poses = {i0: np.eye(3, 4), j0: seed_P2}

    # 3. triangulate every track observed in both seed views
    pts = {}
    for tid, t in enumerate(track_obs):
        if i0 in t and j0 in t:
            X = triangulate(poses[i0], poses[j0], t[i0][None], t[j0][None])[0]
            e1, z1 = reprojection_error(poses[i0], X[None], t[i0][None])
            e2, z2 = reprojection_error(poses[j0], X[None], t[j0][None])
            if z1[0] > 0 and z2[0] > 0 and e1[0] < 2 * th[i0] \
                    and e2[0] < 2 * th[j0]:
                pts[tid] = X

    # 4. register remaining cameras by PnP, triangulating as we go; a
    # failed PnP tries the next-best candidate camera instead of aborting
    # the whole reconstruction (a camera can fail now and register later
    # once more of its tracks are triangulated)
    remaining = [i for i in range(n_images) if i not in poses]
    for _ in range(len(remaining)):
        cand = [(sum(1 for tid in pts if c in track_obs[tid]), c)
                for c in remaining]
        cand.sort(reverse=True)
        cam, P = None, None
        for n_vis, c in cand:
            if n_vis < 6:
                break
            tids_c = [tid for tid in pts if c in track_obs[tid]]
            X = np.stack([pts[t] for t in tids_c])
            x = np.stack([track_obs[t][c] for t in tids_c])
            if nat is not None:
                P_c, inl = nat.ransac_pnp(X, x, thresh=2 * th[c], seed=seed)
            else:
                P_c, inl = ransac_pnp(X, x, thresh=2 * th[c], seed=seed)
            if P_c is not None:
                cam, P = c, P_c
                break
        if cam is None:
            break
        poses[cam] = P
        remaining.remove(cam)
        # triangulate new tracks now visible from >=2 registered cameras
        for tid, t in enumerate(track_obs):
            if tid in pts:
                continue
            reg = [c for c in t if c in poses]
            if len(reg) < 2:
                continue
            c1, c2 = reg[0], reg[-1]
            X = triangulate(poses[c1], poses[c2], t[c1][None], t[c2][None])[0]
            ok = True
            for c in reg:
                e, z = reprojection_error(poses[c], X[None], t[c][None])
                if z[0] <= 0 or e[0] > 2 * th[c]:
                    ok = False
                    break
            if ok:
                pts[tid] = X

    # 5. bundle adjust all registered cameras + points
    reg_cams = sorted(poses)
    cam_index = {c: k for k, c in enumerate(reg_cams)}
    tids = sorted(pts)
    tid_index = {t: k for k, t in enumerate(tids)}
    obs_cam, obs_pt, obs_xy = [], [], []
    for tid in tids:
        for c, xy in track_obs[tid].items():
            if c in cam_index:
                obs_cam.append(cam_index[c])
                obs_pt.append(tid_index[tid])
                obs_xy.append(xy)
    if tids and len(obs_xy) >= 8:
        P_stack = np.stack([poses[c] for c in reg_cams])
        X_stack = np.stack([pts[t] for t in tids])
        P_new, _, ba_loss = bundle_adjust(
            P_stack, X_stack, np.array(obs_cam), np.array(obs_pt),
            np.array(obs_xy), fixed_cam=0, iters=ba_iters)
        log.info("sfm: BA over {} cams / {} pts / {} obs (loss {:.3e})".format(
            len(reg_cams), len(tids), len(obs_xy), ba_loss))
        for c in reg_cams:
            poses[c] = P_new[cam_index[c]]

    out = np.tile(np.eye(3, 4), (n_images, 1, 1))
    valid, excluded = [], []
    for i in range(n_images):
        if i in poses:
            out[i] = poses[i]
            valid.append(i)
        else:
            excluded.append(i)
    if excluded:
        log.warn("sfm: excluded images (registration failed): {}".format(
            excluded))
    return out.astype(np.float32), valid, excluded
