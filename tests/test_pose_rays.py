"""Pose algebra + ray generation tests."""

import numpy as np
import jax.numpy as jnp

from neural_invertible_warp_tpu.ops import lie, pose, rays

rng = np.random.RandomState(1)


def _random_poses(n):
    return lie.se3_to_SE3(jnp.array(rng.randn(n, 6).astype(np.float32) * 0.3))


def _intr(f=100.0, cx=32.0, cy=24.0, n=1):
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    return jnp.array(np.tile(K, (n, 1, 1)))


def test_compose_invert_roundtrip():
    p = _random_poses(8)
    ident = pose.compose_pair(p, pose.invert_pose(p))
    np.testing.assert_allclose(np.asarray(ident),
                               np.tile(np.eye(3, 4), (8, 1, 1)), atol=1e-5)


def test_compose_order_matches_sequential_application():
    p1, p2 = _random_poses(4), _random_poses(4)
    X = jnp.array(rng.randn(4, 10, 3).astype(np.float32))
    combined = pose.world2cam(X, pose.compose([p1, p2]))
    seq = pose.world2cam(pose.world2cam(X, p1), p2)
    np.testing.assert_allclose(np.asarray(combined), np.asarray(seq), atol=1e-5)


def test_world2cam_cam2world_inverse():
    p = _random_poses(4)
    X = jnp.array(rng.randn(4, 7, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pose.cam2world(pose.world2cam(X, p), p)),
        np.asarray(X), atol=1e-5)


def test_rotation_distance():
    w = np.zeros((1, 3), np.float32)
    w[0, 0] = 0.5
    R1 = lie.so3_to_SO3(jnp.array(w))
    R2 = lie.so3_to_SO3(jnp.zeros((1, 3)))
    d = np.asarray(pose.rotation_distance(R1, R2))
    np.testing.assert_allclose(d, [0.5], atol=1e-5)


def test_pixel_centers_idx_matches_full_grid():
    H, W = 6, 9
    full = np.asarray(rays.full_pixel_grid(H, W))
    idx = np.asarray(rays.pixel_centers_from_idx(jnp.arange(H * W), W))
    np.testing.assert_allclose(full, idx)
    # row-major: entry y*W+x is (x+.5, y+.5)
    np.testing.assert_allclose(full[2 * W + 3], [3.5, 2.5])


def test_identity_pose_rays_through_pinhole():
    H, W = 8, 10
    intr = _intr(n=1)
    p = pose.identity_pose((1,))
    center, ray = rays.get_center_and_ray(p, intr, H=H, W=W)
    assert center.shape == (1, H * W, 3) and ray.shape == (1, H * W, 3)
    np.testing.assert_allclose(np.asarray(center), 0, atol=1e-6)
    # ray for pixel (x,y) = K^-1 (x+.5, y+.5, 1)
    Kinv = np.linalg.inv(np.asarray(intr[0]))
    xy = np.asarray(rays.full_pixel_grid(H, W))
    expected = (np.concatenate([xy, np.ones_like(xy[:, :1])], 1) @ Kinv.T)
    np.testing.assert_allclose(np.asarray(ray[0]), expected, atol=1e-5)


def test_rays_with_pose_are_rigidly_transformed():
    H, W = 4, 5
    intr = _intr(n=2)
    p = _random_poses(2)
    center, ray = rays.get_center_and_ray(p, intr, H=H, W=W)
    # center must equal the camera origin in world frame: -R^T t
    R = np.asarray(p)[..., :3]
    t = np.asarray(p)[..., 3]
    cam_origin = -np.einsum("bij,bj->bi", R.transpose(0, 2, 1), t)
    np.testing.assert_allclose(np.asarray(center[:, 0]), cam_origin, atol=1e-5)
    # rays are rotated camera-frame rays
    _, ray_ident = rays.get_center_and_ray(pose.identity_pose((2,)), intr, H=H, W=W)
    expected = np.einsum("bij,bnj->bni", R.transpose(0, 2, 1), np.asarray(ray_ident))
    np.testing.assert_allclose(np.asarray(ray), expected, atol=1e-4)


def test_ray_subset_matches_full():
    H, W = 6, 8
    intr = _intr(n=2)
    p = _random_poses(2)
    idx = jnp.array([0, 5, 17, 40])
    c_full, r_full = rays.get_center_and_ray(p, intr, H=H, W=W)
    c_sub, r_sub = rays.get_center_and_ray(p, intr, H=H, W=W, ray_idx=idx)
    np.testing.assert_allclose(np.asarray(c_sub), np.asarray(c_full)[:, idx], atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_sub), np.asarray(r_full)[:, idx], atol=1e-6)


def test_unwarped_center_and_ray():
    H, W = 4, 6
    intr = _intr(n=3)
    center, grid = rays.get_unwarped_center_and_ray(intr, H=H, W=W)
    np.testing.assert_allclose(np.asarray(center), 0)
    assert np.allclose(np.asarray(grid)[..., 2], 1.0)  # z=1 plane
    # with a pose_init, both move into the init world frame
    p = _random_poses(3)
    center_w, grid_w = rays.get_unwarped_center_and_ray(intr, H=H, W=W, pose_init=p)
    np.testing.assert_allclose(
        np.asarray(center_w), np.asarray(pose.cam2world(center, p)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grid_w), np.asarray(pose.cam2world(grid, p)), atol=1e-5)


def test_convert_ndc_center_on_near_plane():
    H, W = 4, 6
    intr = _intr(n=1)
    p = pose.identity_pose((1,))
    center, ray = rays.get_center_and_ray(p, intr, H=H, W=W)
    center = center - jnp.array([0.0, 0.0, 2.0])  # move camera back
    c_ndc, r_ndc = rays.convert_NDC(center, ray, intr)
    assert np.all(np.isfinite(np.asarray(c_ndc)))
    # reference convention: z_ndc = 1 - 2*near/cz with cz at near plane -> -1
    np.testing.assert_allclose(np.asarray(c_ndc)[..., 2], -1.0, atol=1e-5)


def test_novel_view_poses_orbit():
    anchor = _random_poses(1)[0]
    novel = pose.get_novel_view_poses(anchor, N=12, scale=1.0)
    assert novel.shape == (12, 3, 4)
    R = np.asarray(novel)[..., :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.tile(np.eye(3), (12, 1, 1)), atol=1e-5)
    # all novel cameras stay near the anchor camera's center
    c_anchor = -np.asarray(anchor)[..., :3].T @ np.asarray(anchor)[..., 3]
    centers = np.stack([-r.T @ t for r, t in
                        zip(R, np.asarray(novel)[..., 3])])
    assert np.linalg.norm(centers - c_anchor, axis=-1).max() < 1.0
