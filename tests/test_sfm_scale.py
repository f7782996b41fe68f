"""DTU-scale SfM stress (VERDICT r2 Next #5): 49 views, exhaustive-scale
pair graphs, in-process incremental SfM + gauge-fixed LM bundle adjustment.

Two tests separate the two questions:

* `test_dtu_scale_machinery` — the RECONSTRUCTION machinery at scale, fed
  unbiased matches (SyntheticGTMatcher: iid 0.3 px noise + 8% outliers on
  the same 49-camera arc). Measured 0.04 deg mean rotation error — the
  incremental registration (PnP + nonlinear refine + retry sweeps) and the
  Schur-complement LM BA are accurate at DTU scale.
* `test_dtu_scale_zncc_sfm` — the full weight-free pipeline with the REAL
  ZNCC matcher on rendered images, retrieval-pruned pairs (the default).
  Measured 1.4 deg / 0.037 (scene diameter ~8), all 49 registered.
  Retrieval pruning is load-bearing: with exhaustive pairs the same
  pipeline measures ~6 deg, because wide-baseline pairs contribute ~85%
  wrong-but-epipolar-consistent matches that poison multi-view tracks
  (utils/matchers.py::retrieval_pairs). The residual error over the
  machinery test below is the classical patch matcher's view-dependent
  corner-localization bias — the reason the reference initializes from a
  learned dense matcher (PDC-Net; implemented in ops/pdcnet, weight
  -gated).

Run directly (python tests/test_sfm_scale.py) for per-stage timing numbers
(NOTES_r3)."""

import os
import sys
import time

if __name__ == "__main__":   # direct run: repo root + CPU before jax import
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pytest

import synth_data
from neural_invertible_warp_tpu.ops import align
from neural_invertible_warp_tpu.utils import colmap_init, matchers

N_VIEWS = 49
H, W = 120, 160


def _ring_poses(n_views=N_VIEWS, seed=0):
    """DTU-like inward-facing camera arc (OpenCV convention, z forward)."""
    rng = np.random.RandomState(seed)
    poses = []
    for i in range(n_views):
        theta = np.deg2rad(-40 + 80 * i / (n_views - 1))
        phi = np.deg2rad(20 + 12 * np.sin(3.0 * theta) + 2 * rng.randn())
        r = 3.2 + 0.12 * rng.randn()
        eye = np.array([r * np.sin(theta) * np.cos(phi),
                        r * np.sin(phi),
                        -r * np.cos(theta) * np.cos(phi)])
        target = np.array([0.05 * rng.randn(), 0.05 * rng.randn(), 0.0])
        z = target - eye
        z = z / np.linalg.norm(z)
        x = np.cross(z, np.array([0.0, 1.0, 0.0]))
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])                    # rows = camera axes
        t = -R @ eye
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    poses = np.stack(poses).astype(np.float32)
    intr = np.tile(np.array([[170.0, 0, W / 2], [0, 170.0, H / 2],
                             [0, 0, 1]], np.float32), (n_views, 1, 1))
    return poses, intr


def _ring_scene(n_views=N_VIEWS, seed=0):
    """Rendered DTU-like scene for the real-matcher test: a sparse cloud of
    small opaque high-contrast dots over a corner-rich textured backdrop.

    Feature anchors must be VIEW-STABLE for any SfM to work (COLMAP's
    included): a Harris corner on a large smooth curved blob slides along
    the surface as the view rotates — a correlated, viewpoint-dependent
    localization bias that is a property of the scene, not of the
    reconstruction. Real DTU scans are opaque surfaces with sharp painted
    texture; small opaque dots + Gaussian color spots reproduce that
    regime (sinusoid stripes alone are 1-D texture -> aperture problem)."""
    poses, intr = _ring_poses(n_views, seed)
    blob = synth_data.blob_params(seed=7, n_blobs=80, radius=1.5,
                                  axis_scale=(1.3, 1.0, 1.4),
                                  s_range=(0.03, 0.07))
    blob["a"] = blob["a"] * 40.0          # opaque: first-hit anchoring
    bd = synth_data.backdrop_params(point=(0, 0, 1.8), normal=(0, 0, -1),
                                    seed=11)
    trng = np.random.RandomState(13)
    n_spots = 800
    bd["spot_uv"] = (trng.rand(n_spots, 2).astype(np.float32) - 0.5) * 14.0
    bd["spot_s"] = (0.015 + 0.025 * trng.rand(n_spots)).astype(np.float32)
    bd["spot_c"] = ((trng.rand(n_spots, 3) - 0.5) * 2.0).astype(np.float32)
    imgs = synth_data.analytic_blob_render(poses, intr, H, W, blob,
                                           depth_range=(1.5, 7.0),
                                           backdrop=bd)
    return np.asarray(imgs), intr, poses


def _aligned_errors(init, valid, poses_gt):
    va = np.asarray(valid)
    fit = align.prealign_w2c_large_camera_systems
    _, ssim = fit(init[va], poses_gt[va])
    aligned = align.apply_traj_align_ssim(init, ssim)
    R_err, t_err = align._pose_errors_np(aligned[va], poses_gt[va])
    return float(np.rad2deg(R_err.mean())), float(t_err.mean())


def test_dtu_scale_machinery():
    """49 cameras, unbiased matches: the reconstruction stack itself."""
    poses_gt, intr = _ring_poses()
    rng = np.random.RandomState(3)
    pts3d = np.concatenate([
        rng.randn(250, 3) * np.array([1.3, 1.0, 1.4]) * 0.6,
        np.concatenate([(rng.rand(350, 2) - 0.5) * 10.0,
                        np.full((350, 1), 1.8)], axis=1),
    ])
    matcher = matchers.SyntheticGTMatcher(
        poses_gt, intr, pts3d, H, W, noise_px=0.3, outlier_frac=0.08,
        seed=5)
    # sparse ring pairs keep the BA problem suite-sized (the matcher is
    # dense: exhaustive GT pairs give 14k+ observations)
    pairs = [(i, j) for i in range(N_VIEWS)
             for j in range(i + 1, min(i + 6, N_VIEWS))]
    t0 = time.time()
    init, valid, excluded = colmap_init.compute_sfm_poses(
        np.zeros((N_VIEWS, 1, 1, 3)), intr, matcher=matcher,
        quant_px=1.0, pairs=pairs)
    elapsed = time.time() - t0
    assert len(valid) == N_VIEWS, (len(valid), excluded)
    rot_deg, trans = _aligned_errors(init, valid, poses_gt)
    print("\nDTU-scale machinery: rot {:.4f} deg, trans {:.5f}, "
          "{:.1f}s".format(rot_deg, trans, elapsed))
    # measured 0.04 deg / 0.002 — bound with ~5x headroom
    assert rot_deg < 0.5, rot_deg
    assert trans < 0.02, trans


def test_dtu_scale_zncc_sfm():
    """49 rendered views, real weight-free matcher, retrieval pairs."""
    imgs, intr, poses_gt = _ring_scene()
    t0 = time.time()
    matcher = matchers.ZnccMatcher(n_corners=400, patch_radius=6,
                                   min_score=0.75)
    init, valid, excluded = colmap_init.compute_sfm_poses(
        imgs, intr, matcher=matcher, quant_px=1.0)
    elapsed = time.time() - t0

    assert init.shape == (N_VIEWS, 3, 4)
    assert sorted(valid + excluded) == list(range(N_VIEWS))
    # the matcher is classical, the scene is textured: the bulk of the rig
    # must register
    assert len(valid) >= N_VIEWS - 8, (len(valid), excluded)

    rot_deg, trans = _aligned_errors(init, valid, poses_gt)
    print("\nDTU-scale ZNCC SfM: {} valid / {} excluded, rot {:.3f} deg, "
          "trans {:.4f}, {:.1f}s total".format(
              len(valid), len(excluded), rot_deg, trans, elapsed))
    # measured 1.44 deg / 0.037 (retrieval pairs, all 49 registered);
    # bound with ~2x headroom. DTU-grade init: the reference's BARF-DTU
    # runs refine from far coarser inits (15% pose noise).
    assert rot_deg < 3.0, rot_deg
    assert trans < 0.10, trans


if __name__ == "__main__":
    imgs, intr, poses_gt = _ring_scene()
    t0 = time.time()
    matcher = matchers.ZnccMatcher(n_corners=400, patch_radius=6,
                                   min_score=0.75)
    init, valid, excluded = colmap_init.compute_sfm_poses(
        imgs, intr, matcher=matcher, quant_px=1.0)
    print("total sfm: {:.1f}s; valid {} excluded {}".format(
        time.time() - t0, len(valid), excluded))
    rot_deg, trans = _aligned_errors(init, valid, poses_gt)
    print("rot {:.3f} deg  trans {:.4f}".format(rot_deg, trans))
