"""Native C++ SfM geometry core (native/sfm_core.cpp): build, bindings, and
functional parity with the numpy implementations in utils/sfm.py."""

import numpy as np
import pytest

import synth_data  # noqa: F401 (path setup side effect in conftest)
from neural_invertible_warp_tpu.utils import matchers, sfm, sfm_native
from test_sfm import make_rig


@pytest.fixture(scope="module")
def native():
    sfm_native.reset_cache()
    if not sfm_native.available():
        pytest.skip("native core not buildable (no g++?)")
    return sfm_native


@pytest.fixture(scope="module")
def pair_data():
    poses, intr, pts, H, W = make_rig(2, seed=9)
    m = matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0.3,
                                    outlier_frac=0.15, seed=3)
    a, b = m(0, 1)
    x1 = sfm.normalize_pixels(a, intr[0])
    x2 = sfm.normalize_pixels(b, intr[1])
    return poses, intr, pts, x1, x2


def test_native_essential_matches_numpy(native, pair_data):
    poses, intr, pts, x1, x2 = pair_data
    thresh = 2.0 / intr[0, 0, 0]
    E_np, inl_np = sfm.ransac_essential(x1, x2, thresh=thresh, seed=1)
    E_nat, inl_nat = native.ransac_essential(x1, x2, thresh=thresh, seed=1)
    assert E_nat is not None
    # both reject the outliers and keep (nearly) the same inlier set
    agree = (inl_np == inl_nat).mean()
    assert agree > 0.95, agree
    # E defined up to scale/sign: compare normalized epipolar residuals
    d_np = sfm.sampson_distance(E_np, x1[inl_np], x2[inl_np]).mean()
    d_nat = sfm.sampson_distance(E_nat, x1[inl_nat], x2[inl_nat]).mean()
    assert d_nat < max(2 * d_np, 1e-8)


def test_native_pose_and_triangulation(native, pair_data):
    poses, intr, pts, x1, x2 = pair_data
    thresh = 2.0 / intr[0, 0, 0]
    E, inl = native.ransac_essential(x1, x2, thresh=thresh, seed=1)
    P2, n_front = native.pose_from_essential(E, x1[inl], x2[inl])
    assert n_front > 0.9 * inl.sum()
    R_rel_gt = poses[1, :, :3] @ poses[0, :, :3].T
    rot_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(P2[:, :3] @ R_rel_gt.T) - 1) / 2, -1, 1)))
    assert rot_err < 1.0
    # triangulation parity vs numpy on clean points
    X_np = sfm.triangulate(np.eye(3, 4), P2, x1[inl][:50], x2[inl][:50])
    X_nat = native.triangulate(np.eye(3, 4), P2, x1[inl][:50], x2[inl][:50])
    np.testing.assert_allclose(X_nat, X_np, rtol=1e-6, atol=1e-8)


def test_native_pnp(native):
    poses, intr, pts, H, W = make_rig(3, seed=11)
    m = matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0.0)
    uv, vis = m._project(2)
    x = sfm.normalize_pixels(uv[vis][:100], intr[2])
    X = pts[vis][:100]
    P, inl = native.ransac_pnp(X, x, thresh=1e-4, seed=2)
    assert P is not None and inl.mean() > 0.95
    np.testing.assert_allclose(P, poses[2], atol=1e-5)


def test_pipeline_native_matches_numpy(native, monkeypatch):
    """incremental_sfm with the native core recovers the same trajectory as
    the numpy path (both aligned to GT within 0.5 deg)."""
    from neural_invertible_warp_tpu.ops import align
    from neural_invertible_warp_tpu.utils import colmap_init
    poses, intr, pts, H, W = make_rig(6, seed=12)
    m = matchers.SyntheticGTMatcher(poses, intr, pts, H, W, noise_px=0.3,
                                    seed=4)

    def run():
        rec, valid, excluded = colmap_init.compute_sfm_poses(
            [np.zeros((H, W, 3))] * 6, intr, matcher=m)
        assert excluded == []
        aligned, _ = align.prealign_w2c_large_camera_systems(rec, poses)
        R_err, t_err = align._pose_errors_np(aligned,
                                             poses.astype(np.float32))
        return np.rad2deg(R_err.mean())

    err_native = run()
    monkeypatch.setenv("NIW_NO_NATIVE", "1")
    sfm_native.reset_cache()
    err_numpy = run()
    monkeypatch.delenv("NIW_NO_NATIVE")
    sfm_native.reset_cache()
    assert err_native < 0.5, err_native
    assert err_numpy < 0.5, err_numpy
