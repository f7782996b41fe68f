"""Data-layer tests on synthetic scenes in the exact on-disk formats."""

import numpy as np
import pytest

import synth_data
from neural_invertible_warp_tpu.data import blender, llff


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("blender"))
    synth_data.make_blender_scene(root, n_train=6, n_val=2, n_test=3)
    return root


@pytest.fixture(scope="module")
def llff_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("llff"))
    synth_data.make_llff_scene(root, n_images=8)
    return root


def test_blender_loading(blender_root):
    opt = synth_data.blender_opt(blender_root)
    ds = blender.Dataset(opt, split="train")
    assert len(ds) == 6
    arrays = ds.all_arrays(opt)
    assert arrays["image"].shape == (6, 40, 40, 3)
    assert arrays["intr"].shape == (6, 3, 3)
    assert arrays["pose"].shape == (6, 3, 4)
    assert arrays["image"].min() >= 0 and arrays["image"].max() <= 1
    # focal scaling: raw focal 0.5*800/tan(0.4), resized by 40/800
    focal_raw = 0.5 * 800 / np.tan(0.4)
    np.testing.assert_allclose(arrays["intr"][0, 0, 0], focal_raw * 40 / 800, rtol=1e-5)
    np.testing.assert_allclose(arrays["intr"][0, 0, 2], 20.0, rtol=1e-5)


def test_blender_pose_convention(blender_root):
    # w2c = invert(flip . c2w): the flip only touches the rotation, so the
    # recovered camera center must equal the raw c2w translation exactly
    import json, os
    opt = synth_data.blender_opt(blender_root)
    ds = blender.Dataset(opt, split="train")
    with open(os.path.join(blender_root, "toy", "transforms_train.json")) as f:
        meta = json.load(f)
    poses = ds.get_all_camera_poses(opt)
    for i, frame in enumerate(meta["frames"]):
        t_c2w = np.array(frame["transform_matrix"], np.float32)[:3, 3]
        R, t = poses[i, :, :3], poses[i, :, 3]
        center = -R.T @ t
        np.testing.assert_allclose(center, t_c2w, atol=1e-4)
        # orthonormal w2c
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_blender_val_subset(blender_root):
    opt = synth_data.blender_opt(blender_root)
    ds = blender.Dataset(opt, split="val", subset=1)
    assert len(ds) == 1


def test_llff_loading_and_split(llff_root):
    opt = synth_data.llff_opt(llff_root)
    ds_train = llff.Dataset(opt, split="train")
    ds_val = llff.Dataset(opt, split="val")
    # val_ratio=0.25 of 8 -> last 2 images are val
    assert len(ds_train) == 6 and len(ds_val) == 2
    arrays = ds_train.all_arrays(opt)
    assert arrays["image"].shape == (6, 24, 32, 3)
    assert arrays["pose"].shape == (6, 3, 4)


def test_llff_poses_centered_and_orthonormal(llff_root):
    opt = synth_data.llff_opt(llff_root)
    ds = llff.Dataset(opt, split="train")
    poses_raw, bounds = ds.parse_cameras_and_bounds(opt)
    # centering: mean camera position of the centered raw poses ~ 0
    assert np.abs(poses_raw[..., 3].mean(axis=0)).max() < 1e-4
    # world rescale by 1/(min_bound*0.75)
    assert abs(bounds.min() - 1.0 / 0.75) < 1e-4
    poses = ds.get_all_camera_poses(opt)
    R = poses[..., :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.tile(np.eye(3), (len(ds), 1, 1)), atol=1e-4)


def test_llff_double_flip_identity_convention(llff_root):
    # parse_raw_camera(identity-ish c2w): a camera at origin looking down -z in
    # OpenGL becomes a w2c pose looking down +z (the double flip makes identity
    # init face the same way as the data poses; data/llff.py:129-133)
    opt = synth_data.llff_opt(llff_root)
    ds = llff.Dataset(opt, split="train")
    raw = np.eye(3, 4, dtype=np.float32)  # c2w identity
    pose = ds.parse_raw_camera(raw)
    np.testing.assert_allclose(pose, np.eye(3, 4), atol=1e-6)


def test_llff_intrinsics_resize(llff_root):
    opt = synth_data.llff_opt(llff_root)
    ds = llff.Dataset(opt, split="train")
    intr, _ = ds.get_camera(opt, 0)
    intr_p, _ = ds.preprocess_camera(opt, intr, np.eye(3, 4, dtype=np.float32))
    np.testing.assert_allclose(intr_p[0, 0], 3260.0 * 32 / 4032, rtol=1e-5)
    np.testing.assert_allclose(intr_p[1, 1], 3260.0 * 24 / 3024, rtol=1e-5)
    np.testing.assert_allclose(intr_p[0, 2], 16.0, rtol=1e-5)
    np.testing.assert_allclose(intr_p[1, 2], 12.0, rtol=1e-5)
