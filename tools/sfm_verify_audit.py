"""Audit the two-view verification stage against GT: for each pair the
pipeline verifies, what fraction of its RANSAC-essential inliers are
actually correct matches (GT-triangulated < 2px)? Verified-but-wrong
inliers are the wrong links that poison the track graph.

Usage: JAX_PLATFORMS=cpu python tools/sfm_verify_audit.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    from neural_invertible_warp_tpu.utils import sfm as sfm_mod
    import sfm_scale_debug

    imgs, intr, poses_gt = sfm_scale_debug.get_scene()
    pair_matches = sfm_scale_debug.get_matches(imgs)
    focal = 0.5 * (intr[:, 0, 0] + intr[:, 1, 1])
    th = 2.0 / focal
    nat = None
    try:
        from neural_invertible_warp_tpu.utils import sfm_native
        nat = sfm_native if sfm_native.available() else None
    except Exception:
        pass
    ransac_e = nat.ransac_essential if nat else (
        lambda a, b, thresh, seed: sfm_mod.ransac_essential(
            a, b, thresh=thresh, seed=seed))

    stats = []   # (d, n_match, n_inl, frac_inl_correct)
    for (i, j), (xi, xj) in sorted(pair_matches.items()):
        xi = np.asarray(xi, np.float64)
        xj = np.asarray(xj, np.float64)
        if len(xi) < 8:
            continue
        x1 = sfm_mod.normalize_pixels(xi, intr[i])
        x2 = sfm_mod.normalize_pixels(xj, intr[j])
        E, inl = ransac_e(x1, x2, thresh=max(th[i], th[j]), seed=0)
        if E is None or int(inl.sum()) < 12:
            continue
        P1 = np.asarray(poses_gt[i], np.float64)
        P2 = np.asarray(poses_gt[j], np.float64)
        X = sfm_mod.triangulate(P1, P2, x1[inl], x2[inl])
        e1, z1 = sfm_mod.reprojection_error(P1, X, x1[inl])
        e2, z2 = sfm_mod.reprojection_error(P2, X, x2[inl])
        e_px = np.maximum(e1 * focal[i], e2 * focal[j])
        good = (z1 > 0) & (z2 > 0) & (e_px < 2.0)
        stats.append((abs(i - j), len(xi), int(inl.sum()),
                      float(good.mean())))

    stats = np.array(stats)
    print("verified pairs: {}".format(len(stats)))
    print("\n d | nverif | n_inl med | frac_inl_CORRECT med/min | "
          "n_pairs frac<0.8")
    for d in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        sel = stats[stats[:, 0] == d]
        if not len(sel):
            continue
        print("{:3d} | {:5d} | {:8.0f} | {:.2f} / {:.2f} | {}".format(
            d, len(sel), np.median(sel[:, 2]), np.median(sel[:, 3]),
            sel[:, 3].min(), int((sel[:, 3] < 0.8).sum())))
    bad = stats[stats[:, 3] < 0.5]
    print("\nverified pairs with <50% correct inliers: {} "
          "(these inject wrong track links)".format(len(bad)))
    n_bad_links = int((bad[:, 2] * (1 - bad[:, 3])).sum()) if len(bad) else 0
    n_links = int(stats[:, 2].sum())
    print("wrong links from them: ~{} of {} total verified links".format(
        n_bad_links, n_links))


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
