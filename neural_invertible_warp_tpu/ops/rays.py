"""Ray generation and NDC conversion.

TPU-first redesign of reference camera.py:359-443: instead of materializing the
full H*W pixel grid and gathering a subset afterwards (reference pattern), the
pixel coordinates are computed directly from ray indices — static shapes, no
[B,HW,3] intermediates, and the same math for train-time subsets and eval
chunks.

Conventions (parity with the reference):
* pixel centers at (x+0.5, y+0.5), row-major ray index = y*W + x;
* ``grid`` points live on the z=1 plane in camera coordinates;
* rays are ``grid_world - center_world`` (NOT normalized).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import pose as pose_ops


def pixel_centers_from_idx(ray_idx, W):
    """[N] ray indices -> [N,2] (x+0.5, y+0.5) pixel-center coordinates."""
    x = (ray_idx % W).astype(jnp.float32) + 0.5
    y = (ray_idx // W).astype(jnp.float32) + 0.5
    return jnp.stack([x, y], axis=-1)


def full_pixel_grid(H, W):
    """[H*W,2] all pixel centers, row-major (parity: camera.py:428-433)."""
    y, x = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    return jnp.stack([x, y], axis=-1).reshape(-1, 2)


def _grid_cam(xy, intr):
    """Lift pixel centers onto the z=1 camera plane: [N,2],[B,3,3] -> [B,N,3]."""
    return pose_ops.img2cam(pose_ops.to_hom(xy)[None], intr)


def get_center_and_ray(pose, intr, H=None, W=None, ray_idx=None):
    """Camera centers and rays in world coordinates (camera.py:419-443).

    Args:
        pose: [B,3,4] w2c poses.
        intr: [B,3,3] intrinsics.
        H, W: image size (needed unless ray_idx is given with W).
        ray_idx: optional [N] int ray subset; full grid otherwise.
    Returns:
        center, ray: [B,N,3] each; ray is unnormalized (grid - center).
    """
    if ray_idx is not None:
        xy = pixel_centers_from_idx(ray_idx, W)
    else:
        xy = full_pixel_grid(H, W)
    grid_3D = _grid_cam(xy, intr)                       # [B,N,3]
    center_3D = jnp.zeros_like(grid_3D)
    grid_3D = pose_ops.cam2world(grid_3D, pose)
    center_3D = pose_ops.cam2world(center_3D, pose)
    return center_3D, grid_3D - center_3D


def get_unwarped_center_and_ray(intr, H=None, W=None, ray_idx=None, pose_init=None):
    """Camera-frame grid/center points fed to the INN warp (camera.py:359-390).

    Returns (center_3D, grid_3D), both [B,N,3]; centers are zeros (the camera
    origin) unless pose_init maps them into an initial world frame.
    """
    if ray_idx is not None:
        xy = pixel_centers_from_idx(ray_idx, W)
    else:
        xy = full_pixel_grid(H, W)
    grid_3D = _grid_cam(xy, intr)
    center_3D = jnp.zeros_like(grid_3D)
    if pose_init is not None:
        grid_3D = pose_ops.cam2world(grid_3D, pose_init)
        center_3D = pose_ops.cam2world(center_3D, pose_init)
    return center_3D, grid_3D


def convert_NDC(center, ray, intr, near=1.0):
    """Shift ray origins to the near plane and project to NDC (camera.py:523-540).

    Cameras are assumed to face +z (unlike conventional NDC), matching the
    reference's modified convention.
    """
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = (intr[:, 0, 0] / intr[:, 0, 2])[:, None]
    scale_y = (intr[:, 1, 1] / intr[:, 1, 2])[:, None]
    cnx = scale_x * (cx / cz)
    cny = scale_y * (cy / cz)
    cnz = 1 - 2 * near / cz
    rnx = scale_x * (rx / rz - cx / cz)
    rny = scale_y * (ry / rz - cy / cz)
    rnz = 2 * near / cz
    center_ndc = jnp.stack([cnx, cny, cnz], axis=-1)
    ray_ndc = jnp.stack([rnx, rny, rnz], axis=-1)
    return center_ndc, ray_ndc


def points_from_depth(center, ray, depth):
    """x = c + d*v with a sample axis: [B,N,3],[B,N,3],[B,N,K,1] -> [B,N,K,3]."""
    return center[..., None, :] + ray[..., None, :] * depth
