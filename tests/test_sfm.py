"""SfM pose-initialization pipeline tests (VERDICT r1 item 3).

End-to-end: synthetic GT-projected matcher (+noise, +outliers) on a DTU-like
camera rig -> compute_sfm_poses -> recovered trajectory sim3-aligns to GT
within tight tolerances (reference behavior: compute_sfm_pdcnet,
utils/colmap_initialization/sfm.py:337-406). Plus unit coverage of the
geometry blocks and the weight-free ZNCC matcher."""

import numpy as np
import pytest

import synth_data
from neural_invertible_warp_tpu.ops import align
from neural_invertible_warp_tpu.utils import colmap_init, matchers, sfm


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    poses, intr = synth_data.make_dtu_scene(root, n_images=12)
    return root, poses, intr


# ---------------------------------------------------------------------------
# fixtures: a DTU-like inward-facing rig + a blobby point cloud
# ---------------------------------------------------------------------------

def look_at_pose(eye, target=(0, 0, 0), up=(0, 1, 0)):
    eye = np.asarray(eye, np.float64)
    f = np.asarray(target, np.float64) - eye
    f /= np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    R = np.stack([r, -u, f])          # w2c rows: x right, y down, z forward
    t = -R @ eye
    return np.concatenate([R, t[:, None]], axis=1)


def make_rig(n_cams=8, radius=4.0, seed=0):
    rng = np.random.RandomState(seed)
    poses = []
    for k in range(n_cams):
        ang = 2 * np.pi * k / n_cams
        eye = [radius * np.sin(ang), 1.0 + 0.2 * rng.randn(),
               radius * np.cos(ang)]
        poses.append(look_at_pose(eye))
    poses = np.stack(poses)
    H = W = 120
    f = 150.0
    intr = np.tile(np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                            np.float64), (n_cams, 1, 1))
    pts = rng.randn(400, 3) * np.array([0.8, 0.6, 0.8])
    return poses, intr, pts, H, W


# ---------------------------------------------------------------------------
# geometry units
# ---------------------------------------------------------------------------

def test_essential_and_pose_recovery():
    poses, intr, pts, H, W = make_rig(2)
    m = matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0.0)
    a, b = m(0, 1)
    x1 = sfm.normalize_pixels(a, intr[0])
    x2 = sfm.normalize_pixels(b, intr[1])
    E, inl = sfm.ransac_essential(x1, x2, seed=1)
    assert E is not None and inl.mean() > 0.95
    P2, front = sfm.pose_from_essential(E, x1[inl], x2[inl])
    assert front.mean() > 0.95
    # recovered relative rotation matches GT relative rotation
    R_rel_gt = poses[1, :, :3] @ poses[0, :, :3].T
    rot_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(P2[:, :3] @ R_rel_gt.T) - 1) / 2, -1, 1)))
    assert rot_err < 0.5
    # translation direction matches up to scale
    t_rel_gt = poses[1, :, 3] - (poses[1, :, :3] @ poses[0, :, :3].T) \
        @ poses[0, :, 3]
    cos = np.dot(P2[:, 3], t_rel_gt) / (
        np.linalg.norm(P2[:, 3]) * np.linalg.norm(t_rel_gt))
    assert cos > 0.999


def test_triangulate_and_pnp_roundtrip():
    poses, intr, pts, H, W = make_rig(3, seed=2)
    x0 = sfm.normalize_pixels(
        matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0)
        ._project(0)[0], intr[0])
    x1 = sfm.normalize_pixels(
        matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0)
        ._project(1)[0], intr[1])
    X = sfm.triangulate(poses[0], poses[1], x0, x1)
    np.testing.assert_allclose(X, pts, atol=1e-6)
    P = sfm.pnp_dlt(X[:40], sfm.normalize_pixels(
        matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0)
        ._project(2)[0][:40], intr[2]))
    np.testing.assert_allclose(P, poses[2], atol=1e-6)


def test_bundle_adjust_reduces_error():
    poses, intr, pts, H, W = make_rig(4, seed=3)
    rng = np.random.RandomState(0)
    noisy_poses = poses.copy()
    noisy_poses[1:, :, 3] += rng.randn(3, 3) * 0.02
    noisy_pts = pts + rng.randn(*pts.shape) * 0.02
    obs_cam, obs_pt, obs_xy = [], [], []
    for c in range(4):
        x = sfm.normalize_pixels(
            matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0)
            ._project(c)[0], intr[c])
        for p in range(0, len(pts), 4):
            obs_cam.append(c)
            obs_pt.append(p)
            obs_xy.append(x[p])

    def total_err(P_stack, X_stack):
        e = 0.0
        for k in range(len(obs_cam)):
            err, _ = sfm.reprojection_error(
                P_stack[obs_cam[k]], X_stack[obs_pt[k]][None],
                np.asarray(obs_xy[k])[None])
            e += err[0]
        return e / len(obs_cam)

    before = total_err(noisy_poses, noisy_pts)
    P_new, X_new, _ = sfm.bundle_adjust(
        noisy_poses, noisy_pts, np.array(obs_cam), np.array(obs_pt),
        np.array(obs_xy), iters=400, lr=3e-3)
    after = total_err(P_new, X_new)
    assert after < before * 0.2


def test_track_graph_merges_pairwise_matches():
    g = sfm.TrackGraph()
    g.add_match(0, 1, (10.0, 20.0), (30.0, 40.0))
    g.add_match(1, 2, (30.0, 40.0), (50.0, 60.0))
    g.add_match(0, 2, (99.0, 99.0), (77.0, 77.0))
    tracks = g.tracks(min_len=2)
    lens = sorted(len(t) for t in tracks)
    assert lens == [2, 3]


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

def test_sfm_pipeline_recovers_gt_poses():
    """Noisy GT-projected matches -> poses aligning to GT < 0.5 deg."""
    poses, intr, pts, H, W = make_rig(8, seed=4)
    m = matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0.3,
                                    seed=1)
    rec, valid, excluded = colmap_init.compute_sfm_poses(
        [np.zeros((H, W, 3))] * 8, intr, matcher=m)
    assert excluded == []
    assert valid == list(range(8))
    aligned, ssim = align.prealign_w2c_large_camera_systems(rec, poses)
    R_err, t_err = align._pose_errors_np(aligned, poses.astype(np.float32))
    assert np.rad2deg(R_err.mean()) < 0.5, np.rad2deg(R_err)
    assert t_err.mean() < 0.02


def test_sfm_pipeline_with_outliers_and_exclusion(tmp_path):
    """20% outlier matches are rejected by RANSAC; a camera with no valid
    matches is excluded with an identity pose (reference sfm.py:246-284)."""
    poses, intr, pts, H, W = make_rig(6, seed=5)
    inner = matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0.3,
                                        outlier_frac=0.2, seed=2)

    def matcher(i, j, img_i, img_j):
        if 5 in (i, j):   # sabotage camera 5 entirely
            return np.zeros((0, 2)), np.zeros((0, 2))
        return inner(i, j, img_i, img_j)

    rec, valid, excluded = colmap_init.compute_sfm_poses(
        [np.zeros((H, W, 3))] * 6, intr, matcher=matcher,
        save_dir=str(tmp_path))
    assert excluded == [5]
    assert valid == [0, 1, 2, 3, 4]
    np.testing.assert_array_equal(rec[5], np.eye(3, 4, dtype=np.float32))
    aligned, _ = align.prealign_w2c_large_camera_systems(rec[:5], poses[:5])
    R_err, t_err = align._pose_errors_np(aligned,
                                         poses[:5].astype(np.float32))
    assert np.rad2deg(R_err.mean()) < 1.0
    import os
    assert os.path.isfile(os.path.join(str(tmp_path), "matches.npz"))
    assert os.path.isfile(os.path.join(str(tmp_path), "initial_poses.npz"))


def test_zncc_matcher_on_textured_views():
    """The weight-free matcher finds mostly-correct correspondences between
    two renderings of a textured plane under a small viewpoint change."""
    rng = np.random.RandomState(0)
    H = W = 96
    tex = rng.rand(H * 2, W * 2)
    # view 1: center crop; view 2: shifted crop (pure translation homography)
    img1 = tex[48:48 + H, 48:48 + W]
    dx, dy = 6, 4
    img2 = tex[48 + dy:48 + dy + H, 48 + dx:48 + dx + W]
    m = matchers.ZnccMatcher(n_corners=150, patch_radius=5, min_score=0.8)
    k1, k2 = m(0, 1, img1, img2)
    assert len(k1) >= 20
    err = k1 - k2 - np.array([dx, dy])
    good = (np.linalg.norm(err, axis=1) < 1.5).mean()
    assert good > 0.8


def test_pdcnet_gate_raises():
    with pytest.raises(RuntimeError):
        matchers.pdcnet()


def test_barf_dtu_colmap_init_end_to_end(tmp_path, dtu_root):
    """pose.init=colmap drives the full system path on the synthetic DTU
    fixture with a GT-projected matcher."""
    import jax
    from neural_invertible_warp_tpu import config
    from neural_invertible_warp_tpu.data import dtu as dtu_data
    from neural_invertible_warp_tpu.dotdict import DotDict
    from neural_invertible_warp_tpu.models import get_system_class

    root = dtu_root[0]
    opt = config.load_options("options/barf_dtu.yaml")
    over = config.parse_arguments([
        "--model=barf_dtu", "--yaml=barf_dtu",
        "--data.root={}".format(root), "--data.scene=scan1",
        "--data.image_size=[32,40]", "--data.num_workers=2",
        "--arch.layers_feat=[null,32,32,32,32]",
        "--arch.layers_rgb=[null,16,3]", "--arch.skip=[2]",
        "--arch.posenc.L_3D=4", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=16", "--nerf.rand_rays=128",
        "--pose.init=colmap", "--max_iter=10",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 32, 40
    opt.output_path = str(tmp_path)
    ds_train = dtu_data.Dataset(opt, split="train")
    arrays = ds_train.all_arrays(opt)
    poses_gt = np.asarray(arrays["pose"], np.float64)
    intr = np.asarray(arrays["intr"], np.float64)
    rng = np.random.RandomState(0)
    pts = rng.randn(300, 3) * 0.5
    matcher = matchers.SyntheticGTMatcher(poses_gt, intr, pts,
                                          opt.H, opt.W, noise_px=0.2)
    # tiny 40x32 frames: sub-pixel track quantization avoids merging
    # distinct landmarks that land on the same integer pixel
    opt.pose.sfm = DotDict(dict(matcher=matcher, quant_px=0.25))

    cls = get_system_class(opt.model)
    system = cls(opt)
    ds_val = dtu_data.Dataset(opt, split="val")
    system.attach_data(arrays, ds_val.all_arrays(opt))
    state = system.init_state(jax.random.PRNGKey(0))
    init = np.asarray(state["aux"]["initial_poses_w2c"])
    # initial poses were aligned into the GT frame: close to GT already
    R_err, t_err = align._pose_errors_np(init, poses_gt.astype(np.float32))
    assert np.rad2deg(R_err.mean()) < 2.0
    # and one train step runs
    state, metrics = system.train_step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_all"]))


def test_nearest_pose_selection():
    """Nearest-pose pair selection (reference data/data_utils.py:267-330)."""
    poses, intr, pts, H, W = make_rig(8, seed=6)
    # c2w poses for the selector
    c2w = np.zeros_like(poses)
    c2w[:, :, :3] = np.swapaxes(poses[:, :, :3], 1, 2)
    c2w[:, :, 3] = -np.einsum("bji,bj->bi", poses[:, :, :3], poses[:, :, 3])
    ids = matchers.get_nearest_pose_ids(c2w[0], c2w, 2, tar_id=0,
                                        angular_dist_method="vector")
    # cameras sit on a ring: nearest by viewing angle are the two neighbors
    assert set(int(i) for i in ids) == {1, 7}
    ids_m = matchers.get_nearest_pose_ids(c2w[0], c2w, 2, tar_id=0,
                                          angular_dist_method="matrix")
    assert set(int(i) for i in ids_m) == {1, 7}
    ids_d = matchers.get_nearest_pose_ids(c2w[0], c2w, 2, tar_id=0,
                                          angular_dist_method="dist")
    assert set(int(i) for i in ids_d) == {1, 7}
    with pytest.raises(ValueError):
        matchers.get_nearest_pose_ids(c2w[0], c2w, 2, angular_dist_method="?")

    pairs = matchers.nearest_pose_pairs(c2w, 2)
    assert all(i < j for i, j in pairs)
    assert (0, 1) in pairs and (0, 7) in pairs
    assert len(pairs) <= len(matchers.exhaustive_pairs(8))
    # the sparse pair set still reconstructs the rig
    m = matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0.3,
                                    seed=7)
    pair_matches = {}
    for (i, j) in pairs:
        a, b = m(i, j)
        if len(a) >= 8:
            pair_matches[(i, j)] = (a, b)
    rec, valid, excluded = sfm.incremental_sfm(pair_matches, intr, 8)
    assert excluded == []
    aligned, _ = align.prealign_w2c_large_camera_systems(rec, poses)
    R_err, _ = align._pose_errors_np(aligned, poses.astype(np.float32))
    assert np.rad2deg(R_err.mean()) < 1.0


def test_geometry_np_helpers():
    """Host-side numpy geometry helpers (reference geometric_utils_numpy)."""
    from neural_invertible_warp_tpu.utils import geometry_np as gnp
    grid = gnp.get_absolute_coordinates(4, 5)
    assert grid.shape == (4, 5, 2)
    assert grid[2, 3, 0] == 3 and grid[2, 3, 1] == 2
    R = gnp.angles2rotation_matrix([0.1, -0.2, 0.3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    K = np.array([[100.0, 0, 50], [0, 120, 40], [0, 0, 1]])
    K2 = gnp.scale_intrinsics(K, (2.0, 2.0), invert_scales=False)
    assert K2[0, 0] == 200 and K2[1, 2] == 80
    # backproject + project round trip through a known relative pose
    rng = np.random.RandomState(0)
    kpi = rng.rand(20, 2) * [100, 80]
    di = 2.0 + rng.rand(20)
    T = np.eye(4)
    T[:3, :3] = gnp.angles2rotation_matrix([0.05, 0.1, -0.07])
    T[:3, 3] = [0.2, -0.1, 0.3]
    pts_j = gnp.backproject_to_3d(kpi, di, K, T_itoj=T)
    kpj = gnp.project(gnp.backproject_to_3d(kpi, di, K), T, K)
    np.testing.assert_allclose(kpj, gnp.from_homogeneous(
        pts_j @ K.T), atol=1e-6)
    # pose error metrics
    eR, et = gnp.compute_pose_error(T, T[:3, :3], T[:3, 3])
    assert eR < 1e-6 and et < 1e-6
    eR, et = gnp.compute_pose_error(T, T[:3, :3], -T[:3, 3])
    assert et < 1e-6   # direction-only, sign-symmetric
