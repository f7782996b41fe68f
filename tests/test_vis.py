"""Visualization utility tests."""

import os

import numpy as np

from neural_invertible_warp_tpu.utils import vis


def test_camera_frustums_at_origin():
    pose = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    frusta = vis.camera_frustums(pose, depth=0.5)
    assert len(frusta) == 2
    np.testing.assert_allclose(frusta[0][0], [0, 0, 0], atol=1e-6)
    # image-plane corners sit at z = depth for the identity pose
    np.testing.assert_allclose(frusta[0][1:, 2], 0.5, atol=1e-6)


def test_plot_save_poses(tmp_path):
    rng = np.random.RandomState(0)
    from neural_invertible_warp_tpu.ops import lie
    import jax.numpy as jnp
    pose = np.asarray(lie.se3_to_SE3(jnp.array(rng.randn(5, 6) * 0.3,
                                               dtype=jnp.float32)))
    ref = np.asarray(lie.se3_to_SE3(jnp.array(rng.randn(5, 6) * 0.3,
                                              dtype=jnp.float32)))
    fname = vis.plot_save_poses(str(tmp_path), pose, ref, ep=100)
    assert os.path.isfile(fname)
    assert os.path.getsize(fname) > 1000


def test_colorize_depth():
    depth = np.linspace(1, 5, 12).reshape(3, 4)
    rgb = vis.colorize_depth(depth)
    assert rgb.shape == (3, 4, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    valid = depth > 2
    rgb2 = vis.colorize_depth(depth, valid=valid)
    np.testing.assert_allclose(rgb2[~valid], 0)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.utils import ckpt as ckpt_util
    state = dict(params=dict(w=jnp.arange(6.0).reshape(2, 3)),
                 step=jnp.int32(7),
                 nested=(jnp.ones(4), [jnp.zeros(2)]))
    ckpt_util.save_checkpoint_orbax(str(tmp_path), state, it=42)
    restored, it = ckpt_util.restore_checkpoint_orbax(str(tmp_path), state, 42)
    assert it == 42
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_export_interactive_poses(tmp_path):
    """poses.html: self-contained viewer with embedded frusta JSON
    (visdom-wireframe equivalent, utils/pose_viewer.py)."""
    import json
    import re
    from neural_invertible_warp_tpu.utils.pose_viewer import (
        export_interactive_poses)
    rng = np.random.RandomState(0)
    def rand_poses(n):
        out = np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1))
        out[:, :, 3] = rng.randn(n, 3) * 0.1
        return out
    frames = [(0, rand_poses(4)), (500, rand_poses(4))]
    ref = rand_poses(4)
    path = export_interactive_poses(str(tmp_path / "poses.html"), frames,
                                    pose_ref=ref, cam_depth=0.3)
    html = open(path).read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded data blob missing"
    data = json.loads(m.group(1))
    assert data["iters"] == [0, 500]
    assert len(data["frames"]) == 2
    assert len(data["frames"][0]) == 4          # 4 cameras
    assert len(data["frames"][0][0]) == 5       # 5 frustum vertices
    assert len(data["ref"]) == 4
    assert "<canvas" in html and "orbit" in html
