"""Fast fixture iteration: render 3 views of a candidate DTU-scale scene,
run the real ZNCC matcher, and report the properties that decide whether
two-view geometry is well-posed: depth spread of matched structure, wall
fraction, homography-explainable fraction, and E-pose error vs GT.

Usage: JAX_PLATFORMS=cpu python tools/sfm_scene_probe.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def probe(name, blob, bd, views=(10, 12, 16), n_corners=400):
    import synth_data
    import test_sfm_scale as tss
    from neural_invertible_warp_tpu.utils import sfm as sfm_mod, matchers
    from neural_invertible_warp_tpu.utils import sfm_native as nat

    H, W = tss.H, tss.W
    # camera ring from the test fixture (subset of views)
    imgs_all, intr_all, poses_all = None, None, None
    rng_poses = tss._ring_scene.__wrapped__ if hasattr(
        tss._ring_scene, "__wrapped__") else None
    # rebuild poses only (cheap) by replicating the fixture's pose loop
    rng = np.random.RandomState(0)
    poses = []
    n_views = tss.N_VIEWS
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
        R = np.stack([x, y, z])
        t = -R @ eye
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    poses = np.stack(poses).astype(np.float32)
    intr = np.tile(np.array([[170.0, 0, W / 2], [0, 170.0, H / 2],
                             [0, 0, 1]], np.float32), (n_views, 1, 1))
    sel = np.array(views)
    imgs = np.asarray(synth_data.analytic_blob_render(
        poses[sel], intr[sel], H, W, blob, depth_range=(1.5, 7.0),
        backdrop=bd))

    matcher = matchers.ZnccMatcher(n_corners=n_corners, patch_radius=6,
                                   min_score=0.75)
    focal = 170.0
    th = 2.0 / focal
    print("== {} ==".format(name))
    for a in range(1, len(sel)):
        i, j = 0, a
        gi, gj = sel[0], sel[a]
        kpi, kpj = matcher(i, j, imgs[i], imgs[j])
        if len(kpi) < 8:
            print(" pair d={}: only {} matches".format(gj - gi, len(kpi)))
            continue
        x1 = sfm_mod.normalize_pixels(kpi, intr[gi])
        x2 = sfm_mod.normalize_pixels(kpj, intr[gj])
        Pg1 = np.asarray(poses[gi], np.float64)
        Pg2 = np.asarray(poses[gj], np.float64)
        X = sfm_mod.triangulate(Pg1, Pg2, x1, x2)
        e1, z1 = sfm_mod.reprojection_error(Pg1, X, x1)
        good = (z1 > 0) & (e1 * focal < 2.0)
        Xg = X[good]
        wall = np.abs(Xg[:, 2] - 1.8) < 0.08
        _, h_inl = sfm_mod.ransac_homography(x1[good], x2[good], thresh=th,
                                             seed=0)
        hfrac = (float(h_inl.sum()) / max(1, int(good.sum()))
                 if h_inl is not None else -1)
        E, inl = nat.ransac_essential(x1, x2, thresh=th, seed=0)
        rot = tde = np.nan
        if E is not None:
            P2, _ = nat.pose_from_essential(E, x1[inl], x2[inl])
            if P2 is not None:
                R_rel = Pg2[:, :3] @ Pg1[:, :3].T
                t_rel = Pg2[:, 3] - R_rel @ Pg1[:, 3]
                dR = P2[:, :3] @ R_rel.T
                rot = np.degrees(np.arccos(np.clip(
                    (np.trace(dR) - 1) / 2, -1, 1)))
                tde = np.degrees(np.arccos(np.clip(np.dot(
                    P2[:, 3] / np.linalg.norm(P2[:, 3]),
                    t_rel / np.linalg.norm(t_rel)), -1, 1)))
        print(" pair d={}: {} matches, {} good, wall {:.2f}, "
              "z-std {:.2f}, H-frac {:.2f} | rot {:.2f} tdir {:.1f}".format(
                  gj - gi, len(kpi), int(good.sum()), wall.mean(),
                  Xg[:, 2].std(), hfrac, rot, tde))


def main():
    import synth_data
    trng = np.random.RandomState(13)

    def make_bd(n_spots, s_lo, s_hi, amp):
        bd = synth_data.backdrop_params(point=(0, 0, 1.8),
                                        normal=(0, 0, -1), seed=11)
        bd["spot_uv"] = (trng.rand(n_spots, 2).astype(np.float32) - 0.5) * 14.0
        bd["spot_s"] = (s_lo + (s_hi - s_lo)
                        * trng.rand(n_spots)).astype(np.float32)
        bd["spot_c"] = ((trng.rand(n_spots, 3) - 0.5)
                        * amp).astype(np.float32)
        return bd

    # candidate A: sparse opaque dots + sharp wall spots
    blob = synth_data.blob_params(seed=7, n_blobs=120, radius=1.3,
                                  axis_scale=(1.35, 1.05, 0.85),
                                  s_range=(0.025, 0.06))
    blob["a"] = blob["a"] * 40.0
    probe("A: 120 sparse dots + sharp wall", blob,
          make_bd(600, 0.02, 0.05, 1.8))

    # candidate B: even sparser, bigger depth spread, stronger wall
    blob = synth_data.blob_params(seed=7, n_blobs=80, radius=1.5,
                                  axis_scale=(1.3, 1.0, 1.4),
                                  s_range=(0.03, 0.07))
    blob["a"] = blob["a"] * 40.0
    probe("B: 80 dots, deep cloud", blob, make_bd(800, 0.015, 0.04, 2.0))


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main()
