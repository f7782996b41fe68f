"""iPhone + Tanks&Temples loader tests."""

import os

import numpy as np
import imageio.v2 as imageio
import pytest

import synth_data
from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.data import iphone, tandt
from neural_invertible_warp_tpu.data.base import np_invert


@pytest.fixture(scope="module")
def iphone_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("iphone"))
    img_dir = os.path.join(root, "vid", "images")
    os.makedirs(img_dir)
    for i in range(10):
        imageio.imwrite(os.path.join(img_dir, "{}.png".format(i)),
                        synth_data._toy_image(36, 64, i))
    return root


def test_iphone_loader(iphone_root):
    opt = DotDict(dict(
        H=18, W=32,
        data=dict(root=iphone_root, dataset="iphone", scene="vid",
                  image_size=[18, 32], num_workers=2, preload=True,
                  val_ratio=0.2, augment={}, center_crop=None),
    ))
    ds = iphone.Dataset(opt, split="train")
    assert len(ds) == 8
    # frames must be numerically sorted (2.png < 10.png)
    assert ds.list == sorted(ds.list, key=lambda f: int(f.split(".")[0]))
    arrays = ds.all_arrays(opt)
    assert arrays["image"].shape == (8, 18, 32, 3)
    # identity dummy poses
    np.testing.assert_allclose(arrays["pose"],
                               np.tile(np.eye(3, 4), (8, 1, 1)), atol=1e-6)
    # hard-coded iPhone focal, rescaled to the target width
    focal_raw = 1920 * 4.2 / (12.8 / 2.55)
    np.testing.assert_allclose(arrays["intr"][0, 0, 0], focal_raw * 32 / 1920,
                               rtol=1e-5)


@pytest.fixture(scope="module")
def tandt_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tandt"))
    path = os.path.join(root, "Ballroom")
    img_dir = os.path.join(path, "images")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    rows = []
    n = 16
    for i in range(n):
        # forward-facing arc (a camera ring degenerates the reference's
        # average-pose centering; real T&T captures are walk-throughs)
        th = (i / n - 0.5) * 1.2
        eye = np.array([2.5 * np.sin(th), 0.3, 2.5 * np.cos(th)])
        c2w = synth_data.look_at_c2w(eye)
        raw = c2w.copy()
        raw[..., 0], raw[..., 1] = -c2w[..., 1], c2w[..., 0]
        hwf = np.array([540.0, 960.0, 800.0], np.float32)[:, None]
        rows.append(np.concatenate([
            np.concatenate([raw, hwf], axis=1).reshape(-1),
            np.array([1.5 + rng.rand() * 0.1, 6.0])]))
        imageio.imwrite(os.path.join(img_dir, "{:04d}.png".format(i)),
                        synth_data._toy_image(27, 48, i))
    np.save(os.path.join(path, "poses_bounds.npy"), np.stack(rows))
    return root


def _tandt_opt(root):
    return DotDict(dict(
        H=27, W=48,
        data=dict(root=root, dataset="tandt", scene="Ballroom",
                  image_size=[27, 48], num_workers=2, preload=True,
                  val_ratio=8, augment={}, center_crop=None),
    ))


def test_tandt_split(tandt_root):
    opt = _tandt_opt(tandt_root)
    ds_train = tandt.Dataset(opt, split="train")
    ds_val = tandt.Dataset(opt, split="val")
    ds_test = tandt.Dataset(opt, split="test")
    # 16 images, step 8 offset 4 -> test = {4, 12}; val = first 2 of test
    assert len(ds_test) == 2 and len(ds_val) == 2 and len(ds_train) == 14


def test_tandt_spherified_poses(tandt_root):
    opt = _tandt_opt(tandt_root)
    ds = tandt.Dataset(opt, split="train")
    poses = ds.get_all_camera_poses(opt)
    R = poses[..., :3]
    # centering uses the transpose-inverse of an only-approximately-orthonormal
    # average pose (reference data/llff.py:63-72), so allow small skew
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.tile(np.eye(3), (len(ds), 1, 1)), atol=5e-2)
    # spherification rescales camera centers to ~unit radius
    centers = np_invert(poses)[:, :, 3]
    radius = np.linalg.norm(centers, axis=-1)
    assert 0.5 < radius.mean() < 1.5
