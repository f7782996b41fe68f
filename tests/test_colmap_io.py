"""COLMAP model-file interop (utils/colmap_io): binary/text round-trips,
quaternion algebra, pose seeding semantics (reference
utils/colmap_initialization/sfm.py:246-284), and the pose.init=colmap_files
system path on the DTU fixture."""

import numpy as np
import pytest

from neural_invertible_warp_tpu.utils import colmap_io


def _random_model(rng, n_images=5, n_points=7, with_points2d=True):
    cameras = {
        1: colmap_io.Camera(1, "PINHOLE", 640, 480,
                            np.array([520.0, 521.5, 320.0, 240.25])),
        2: colmap_io.Camera(2, "SIMPLE_RADIAL", 320, 240,
                            np.array([260.0, 160.0, 120.0, -0.05])),
    }
    images = {}
    for i in range(1, n_images + 1):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        n2d = rng.randint(0, 6) if with_points2d else 0
        images[i] = colmap_io.Image(
            i, q, rng.randn(3), 1 + (i % 2), "img_{:03d}.png".format(i),
            rng.rand(n2d, 2) * 100,
            rng.randint(-1, n_points, size=n2d).astype(np.int64))
    points = {}
    for p in range(1, n_points + 1):
        tl = rng.randint(1, 4)
        points[p] = colmap_io.Point3D(
            p, rng.randn(3), rng.randint(0, 256, 3).astype(np.uint8),
            float(rng.rand()), rng.randint(1, n_images + 1, tl),
            rng.randint(0, 5, tl))
    return cameras, images, points


def _assert_models_equal(a, b):
    cams_a, ims_a, pts_a = a
    cams_b, ims_b, pts_b = b
    assert set(cams_a) == set(cams_b)
    for k in cams_a:
        ca, cb = cams_a[k], cams_b[k]
        assert (ca.model, ca.width, ca.height) == (cb.model, cb.width,
                                                   cb.height)
        np.testing.assert_allclose(ca.params, cb.params, rtol=0, atol=0)
    assert set(ims_a) == set(ims_b)
    for k in ims_a:
        ia, ib = ims_a[k], ims_b[k]
        assert (ia.name, ia.camera_id) == (ib.name, ib.camera_id)
        np.testing.assert_allclose(ia.qvec, ib.qvec, atol=0)
        np.testing.assert_allclose(ia.tvec, ib.tvec, atol=0)
        np.testing.assert_allclose(ia.xys, ib.xys, atol=0)
        np.testing.assert_array_equal(ia.point3D_ids, ib.point3D_ids)
    assert set(pts_a) == set(pts_b)
    for k in pts_a:
        pa, pb = pts_a[k], pts_b[k]
        np.testing.assert_allclose(pa.xyz, pb.xyz, atol=0)
        np.testing.assert_array_equal(pa.rgb, pb.rgb)
        assert pa.error == pb.error
        np.testing.assert_array_equal(pa.image_ids, pb.image_ids)
        np.testing.assert_array_equal(pa.point2D_idxs, pb.point2D_idxs)


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_model_round_trip(tmp_path, ext):
    rng = np.random.RandomState(0)
    model = _random_model(rng)
    colmap_io.write_model(*model, str(tmp_path), ext=ext)
    back = colmap_io.read_model(str(tmp_path))  # format auto-detected
    assert colmap_io.detect_model_format(str(tmp_path)) == ext
    _assert_models_equal(model, back)


def test_qvec_rotmat_round_trip():
    rng = np.random.RandomState(1)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap_io.qvec2rotmat(q)
        # proper rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0
        np.testing.assert_allclose(colmap_io.rotmat2qvec(R), q, atol=1e-10)


def test_poses_from_model_name_matching(tmp_path):
    rng = np.random.RandomState(2)
    cameras, images, points = _random_model(rng, n_images=4)
    colmap_io.write_model(cameras, images, points, str(tmp_path), ext=".bin")
    # ask for 6 names; two are not in the reconstruction
    names = ["img_001.png", "missing_a.png", "img_002.png", "img_003.png",
             "missing_b.png", "img_004.png"]
    poses, valid, excluded = colmap_io.poses_from_model(str(tmp_path),
                                                       image_names=names)
    assert poses.shape == (6, 3, 4) and poses.dtype == np.float32
    assert valid == [0, 2, 3, 5]
    assert excluded == [1, 4]
    np.testing.assert_allclose(poses[1], np.eye(3, 4), atol=0)
    np.testing.assert_allclose(poses[4], np.eye(3, 4), atol=0)
    for i, img_id in [(0, 1), (2, 2), (3, 3), (5, 4)]:
        R = colmap_io.qvec2rotmat(images[img_id].qvec)
        np.testing.assert_allclose(poses[i, :, :3], R, atol=1e-6)
        np.testing.assert_allclose(poses[i, :, 3], images[img_id].tvec,
                                   atol=1e-6)


def test_intrinsics_from_camera():
    K = colmap_io.intrinsics_from_camera(
        colmap_io.Camera(1, "PINHOLE", 640, 480,
                         np.array([520.0, 500.0, 320.0, 240.0])))
    np.testing.assert_allclose(
        K, [[520, 0, 320], [0, 500, 240], [0, 0, 1]])
    K2 = colmap_io.intrinsics_from_camera(
        colmap_io.Camera(2, "SIMPLE_RADIAL", 320, 240,
                         np.array([260.0, 160.0, 120.0, -0.05])))
    np.testing.assert_allclose(
        K2, [[260, 0, 160], [0, 260, 120], [0, 0, 1]])


def test_colmap_files_pose_init_end_to_end(tmp_path):
    """pose.init=colmap_files seeds a DTU system from an on-disk binary
    model written in the GT frame (with one image missing)."""
    import jax
    import synth_data
    from neural_invertible_warp_tpu import config
    from neural_invertible_warp_tpu.data import dtu as dtu_data
    from neural_invertible_warp_tpu.models import get_system_class
    from neural_invertible_warp_tpu.ops import align

    root = str(tmp_path / "dtu")
    synth_data.make_dtu_scene(root, H=32, W=40)
    opt = config.load_options("options/barf_dtu.yaml")
    over = config.parse_arguments([
        "--model=barf_dtu", "--yaml=barf_dtu",
        "--data.root={}".format(root), "--data.scene=scan1",
        "--data.image_size=[32,40]", "--data.num_workers=2",
        "--arch.layers_feat=[null,32,32,32,32]",
        "--arch.layers_rgb=[null,16,3]", "--arch.skip=[2]",
        "--arch.posenc.L_3D=4", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=16", "--nerf.rand_rays=128",
        "--pose.init=colmap_files", "--max_iter=10",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 32, 40
    opt.output_path = str(tmp_path)

    ds_train = dtu_data.Dataset(opt, split="train")
    arrays = ds_train.all_arrays(opt)
    names = ds_train.image_names()
    assert names is not None
    poses_gt = np.asarray(arrays["pose"], np.float64)

    # write a COLMAP binary model holding the GT poses under an arbitrary
    # rigid gauge (the sim3 prealign must undo it), omitting image 1
    rng = np.random.RandomState(0)
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    g = np.concatenate([Q, rng.randn(3, 1)], axis=1)  # extra w2w transform
    cameras = {1: colmap_io.Camera(1, "PINHOLE", 40, 32,
                                   np.array([30.0, 30.0, 20.0, 16.0]))}
    images = {}
    for i in range(len(names)):
        if i == 1:
            continue
        R, t = poses_gt[i, :, :3], poses_gt[i, :, 3]
        Rg = R @ Q.T
        tg = t - Rg @ g[:, 3]
        images[i + 1] = colmap_io.Image(
            i + 1, colmap_io.rotmat2qvec(Rg), tg, 1, names[i],
            np.zeros((0, 2)), np.zeros((0,), np.int64))
    model_dir = str(tmp_path / "colmap_model")
    colmap_io.write_model(cameras, images, {}, model_dir, ext=".bin")
    opt.pose.model_dir = model_dir

    cls = get_system_class(opt.model)
    system = cls(opt)
    ds_val = dtu_data.Dataset(opt, split="val")
    system.attach_data(arrays, ds_val.all_arrays(opt))
    system.train_image_names = names
    state = system.init_state(jax.random.PRNGKey(0))
    assert system.sfm_excluded == [1]
    init = np.asarray(state["aux"]["initial_poses_w2c"])
    valid = np.array(system.sfm_valid_idx)
    R_err, t_err = align._pose_errors_np(
        init[valid], poses_gt[valid].astype(np.float32))
    assert np.rad2deg(R_err.mean()) < 0.5
    assert t_err.mean() < 0.05
    state, metrics = system.train_step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss_all"]))
