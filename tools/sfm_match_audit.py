"""Audit cached DTU-scale matches against GROUND TRUTH poses.

Separates "the matcher is bad" from "the SfM pipeline is bad": for every
cached pair, triangulate each match with the GT cameras and report its
reprojection residual; per-pair correct-match fractions and counts tell us
what the reconstruction stage actually has to work with.

Usage: JAX_PLATFORMS=cpu python tools/sfm_match_audit.py
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

    # per-pair: triangulate under GT, residual in px
    rows = []
    for (i, j), (xi, xj) in sorted(pair_matches.items()):
        x1 = sfm_mod.normalize_pixels(np.asarray(xi, np.float64), intr[i])
        x2 = sfm_mod.normalize_pixels(np.asarray(xj, np.float64), intr[j])
        P1 = np.asarray(poses_gt[i], np.float64)
        P2 = np.asarray(poses_gt[j], np.float64)
        X = sfm_mod.triangulate(P1, P2, x1, x2)
        e1, z1 = sfm_mod.reprojection_error(P1, X, x1)
        e2, z2 = sfm_mod.reprojection_error(P2, X, x2)
        e_px = np.maximum(e1 * focal[i], e2 * focal[j])
        good = (z1 > 0) & (z2 > 0) & (e_px < 2.0)
        rows.append((i, j, len(xi), float(good.mean()),
                     float(np.median(e_px[good])) if good.any() else np.nan))

    rows_np = np.array([(r[2], r[3]) for r in rows])
    print("pairs: {} | matches/pair median {:.0f} mean {:.1f}".format(
        len(rows), np.median(rows_np[:, 0]), rows_np[:, 0].mean()))
    print("correct-fraction (<2px GT-triangulated): median {:.2f} mean {:.2f}"
          .format(np.median(rows_np[:, 1]), rows_np[:, 1].mean()))

    # adjacency profile: quality vs baseline separation
    print("\n d | npairs | n_match med | frac_good med | med_err_px")
    for d in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32):
        sel = [r for r in rows if abs(r[0] - r[1]) == d]
        if not sel:
            continue
        nm = np.median([r[2] for r in sel])
        fg = np.median([r[3] for r in sel])
        me = np.nanmedian([r[4] for r in sel])
        print("{:3d} | {:5d} | {:8.0f} | {:10.2f} | {:.3f}".format(
            d, len(sel), nm, fg, me))

    # per-image total good matches (is some part of the arc starved?)
    per_img = np.zeros(len(imgs))
    for i, j, n, fg, _ in rows:
        per_img[i] += n * fg
        per_img[j] += n * fg
    print("\nper-image good-match totals: min {:.0f} (img {}), "
          "median {:.0f}, max {:.0f}".format(
              per_img.min(), int(per_img.argmin()),
              np.median(per_img), per_img.max()))
    worst = np.argsort(per_img)[:8]
    print("worst 8 images:", [(int(k), int(per_img[k])) for k in worst])


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
