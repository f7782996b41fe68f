"""Audit the TRACK GRAPH built from verified ZNCC matches against GT.

The per-pair matches are 95% correct (tools/sfm_match_audit.py) and the
pipeline reconstructs perfectly from the GT matcher, so the failure must be
where pairwise matches become multi-view tracks. For every track: multiview-
triangulate under GT poses, classify obs as good/bad, report track purity.

Usage: JAX_PLATFORMS=cpu python tools/sfm_track_audit.py
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
    poses_gt = np.asarray(poses_gt, np.float64)
    intr = np.asarray(intr, np.float64)
    focal = 0.5 * (intr[:, 0, 0] + intr[:, 1, 1])
    th = 2.0 / focal

    # replicate the pipeline's verification + track build
    norm = {}
    verified = {}
    from neural_invertible_warp_tpu.utils import sfm_native
    nat = sfm_native if sfm_native.available() else None
    ransac_e = nat.ransac_essential if nat else (
        lambda a, b, thresh, seed: sfm_mod.ransac_essential(
            a, b, thresh=thresh, seed=seed))
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
        verified[(i, j)] = (xi[inl], xj[inl])   # PIXELS (as the pipeline)

    graph = sfm_mod.TrackGraph(quant=1.0)
    n_links = 0
    for (i, j), (x1, x2) in verified.items():
        for k in range(len(x1)):
            graph.add_match(i, j, x1[k], x2[k])
            n_links += 1
    tracks = graph.tracks(min_len=2)
    lens = np.array([len(t) for t in tracks])
    print("links {}, tracks {}, len: med {:.0f} mean {:.1f} max {}".format(
        n_links, len(tracks), np.median(lens), lens.mean(), lens.max()))

    # classify each track against GT: multiview triangulate from GT poses
    n_pure, n_contam, n_junk = 0, 0, 0
    bad_obs, tot_obs = 0, 0
    for t in tracks:
        cams = sorted(t)
        Ps = poses_gt[cams]
        xs = np.stack([sfm_mod.normalize_pixels(t[c][None], intr[c])[0]
                       for c in cams])
        X = sfm_mod.triangulate_multiview(Ps, xs)
        good = 0
        for m, c in enumerate(cams):
            e, z = sfm_mod.reprojection_error(poses_gt[c], X[None],
                                              xs[m][None])
            if z[0] > 0 and e[0] * focal[c] < 2.0:
                good += 1
        tot_obs += len(cams)
        bad_obs += len(cams) - good
        if good == len(cams):
            n_pure += 1
        elif good >= 2:
            n_contam += 1
        else:
            n_junk += 1
    print("tracks: {} pure / {} contaminated / {} junk".format(
        n_pure, n_contam, n_junk))
    print("obs: {} bad / {} total ({:.1f}%)".format(
        bad_obs, tot_obs, 100.0 * bad_obs / max(tot_obs, 1)))

    # how many links were REJECTED by the conflict-aware union-find?
    # (re-run with counting)
    class CountingGraph(sfm_mod.TrackGraph):
        def __init__(self, quant=1.0):
            super().__init__(quant=quant)
            self.n_reject = 0

        def add_match(self, img_a, img_b, xy_a, xy_b):
            a = self._key(img_a, xy_a)
            b = self._key(img_b, xy_b)
            before = None
            for node, (img, xy) in ((a, (img_a, xy_a)), (b, (img_b, xy_b))):
                if node not in self.parent:
                    self.parent[node] = node
                    self.obs[node] = (img, np.asarray(xy, np.float64))
                    self.imgs[node] = {img: node}
            ra, rb = self._find(a), self._find(b)
            if ra == rb:
                return
            ma, mb = self.imgs[ra], self.imgs[rb]
            if len(mb) > len(ma):
                ra, rb = rb, ra
                ma, mb = mb, ma
            for img, node in mb.items():
                if ma.get(img, node) != node:
                    self.n_reject += 1
                    return
            ma.update(mb)
            self.parent[rb] = ra
            del self.imgs[rb]

    g2 = CountingGraph(quant=1.0)
    for (i, j), (x1, x2) in verified.items():
        for k in range(len(x1)):
            g2.add_match(i, j, x1[k], x2[k])
    print("conflict-rejected merges: {} of {} links".format(
        g2.n_reject, n_links))

    # per-image track coverage
    per_img = np.zeros(len(imgs))
    for t in tracks:
        for c in t:
            per_img[c] += 1
    print("per-image track count: min {:.0f} med {:.0f} max {:.0f}".format(
        per_img.min(), np.median(per_img), per_img.max()))


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
