"""Iteration driver for the DTU-scale SfM stress (tests/test_sfm_scale.py).

Caches the rendered scene and the pair matches on disk so pipeline changes
downstream of matching re-run in seconds instead of the test's ~30 minutes.

Usage:
  JAX_PLATFORMS=cpu python tools/sfm_scale_debug.py [--rematch] [--stage sfm]
"""

import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CACHE = "/tmp/sfm_scale_cache"


def get_scene():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, "scene.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["imgs"], z["intr"], z["poses"]
    import test_sfm_scale
    t0 = time.time()
    imgs, intr, poses = test_sfm_scale._ring_scene()
    print("scene render: {:.1f}s".format(time.time() - t0))
    np.savez(path, imgs=imgs, intr=intr, poses=poses)
    return imgs, intr, poses


def get_matches(imgs, rematch=False, tag="default", **matcher_kwargs):
    from neural_invertible_warp_tpu.utils import matchers
    path = os.path.join(CACHE, "matches_{}.npz".format(tag))
    if os.path.exists(path) and not rematch:
        z = np.load(path)
        out = {}
        for k in z.files:
            i, j = k.split("_")
            ab = z[k]
            out[(int(i), int(j))] = (ab[:, :2], ab[:, 2:])
        return out
    kw = dict(n_corners=400, patch_radius=6, min_score=0.75)
    kw.update(matcher_kwargs)
    matcher = matchers.ZnccMatcher(**kw)
    t0 = time.time()
    pair_matches = {}
    n = len(imgs)
    for (i, j) in matchers.exhaustive_pairs(n):
        kpi, kpj = matcher(i, j, imgs[i], imgs[j])
        if len(kpi) >= 8:
            pair_matches[(i, j)] = (kpi, kpj)
    print("matching: {:.1f}s, {} pairs, {} corrs".format(
        time.time() - t0, len(pair_matches),
        sum(len(a) for a, _ in pair_matches.values())))
    np.savez(path, **{"{}_{}".format(i, j): np.concatenate([a, b], axis=1)
                      for (i, j), (a, b) in pair_matches.items()})
    return pair_matches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rematch", action="store_true")
    ap.add_argument("--tag", default="default")
    ap.add_argument("--n-corners", type=int, default=250)
    ap.add_argument("--quant", type=float, default=1.0)
    ap.add_argument("--method", default="global")
    args = ap.parse_args()

    from neural_invertible_warp_tpu.ops import align
    from neural_invertible_warp_tpu.utils import sfm as sfm_mod

    imgs, intr, poses_gt = get_scene()
    n = len(imgs)
    pair_matches = get_matches(imgs, rematch=args.rematch, tag=args.tag,
                               n_corners=args.n_corners)

    t0 = time.time()
    fn = (sfm_mod.global_sfm if args.method == "global"
          else sfm_mod.incremental_sfm)
    init, valid, excluded = fn(
        pair_matches, intr, n, thresh_px=2.0, ba_iters=300,
        min_track_len=2, seed=0, quant=args.quant)
    print("sfm: {:.1f}s; {} valid, excluded {}".format(
        time.time() - t0, len(valid), excluded))
    if len(valid) < 3:
        return
    va = np.asarray(valid)
    _, ssim = align.prealign_w2c_large_camera_systems(init[va],
                                                      poses_gt[va])
    aligned = align.apply_traj_align_ssim(init, ssim)
    R_err, t_err = align._pose_errors_np(aligned[va], poses_gt[va])
    print("rot {:.3f} deg  trans {:.4f}".format(
        float(np.rad2deg(R_err.mean())), float(t_err.mean())))


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
