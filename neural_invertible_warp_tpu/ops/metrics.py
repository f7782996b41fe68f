"""Depth-error metrics (DTU evaluation).

Parity with reference core/metrics.py:4-119:
* per-ray depth error against the valid-masked GT depth (abs + RMSE);
* full-image variant taking min(scaled, unscaled) where the scale comes from
  the recovered sim3 (model/nerf_dtu.py:227-235).
All functions are mask-weighted jnp reductions (no boolean gathers, static
shapes — TPU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_abs_rmse(pred, gt, mask):
    """Masked |e| mean and RMSE. pred/gt/mask: same shape."""
    mask = mask.astype(pred.dtype)
    n = jnp.sum(mask)
    diff = (pred - gt) * mask
    abs_e = jnp.sum(jnp.abs(diff)) / (n + 1e-6)
    rmse = jnp.sqrt(jnp.sum(diff ** 2) / (n + 1e-6))
    return abs_e, rmse


def depth_error_on_rays(pred_depth, depth_gt_pixels, valid_pixels, ray_idx,
                        scaling_factor=1.0):
    """Depth error at sampled rays (reference core/metrics.py:4-58).

    Args:
        pred_depth: [B,N,1] rendered depth at rays.
        depth_gt_pixels: [B,HW] GT depth flattened row-major.
        valid_pixels: [B,HW] validity mask.
        ray_idx: [N] shared ray indices.
    """
    gt = depth_gt_pixels[:, ray_idx][..., None]
    valid = valid_pixels[:, ray_idx][..., None]
    return _masked_abs_rmse(pred_depth * scaling_factor, gt, valid)


def depth_error_full(pred_depth, depth_gt, valid, scaling_factor=1.0):
    """Full-image depth error; min over {scaled, unscaled} like
    reference core/metrics.py:64-119."""
    pred = pred_depth.reshape(-1)
    gt = depth_gt.reshape(-1)
    mask = valid.reshape(-1)
    abs_u, rmse_u = _masked_abs_rmse(pred, gt, mask)
    abs_s, rmse_s = _masked_abs_rmse(pred * scaling_factor, gt, mask)
    return jnp.minimum(abs_u, abs_s), jnp.minimum(rmse_u, rmse_s)


def white_composite(img, mask):
    """Composite the foreground onto a white background:
    ``img*m + (1-m)`` (reference model/nerf_dtu.py:241-243).
    img: [H,W,3]; mask: [H,W] (1 = foreground)."""
    m = mask[..., None].astype(img.dtype)
    return img * m + (1.0 - m)


def masked_psnr(pred, gt, mask):
    """Masked PSNR (reference model/nerf_dtu.py:237-248): both images are
    white-composited with the fg mask and PSNR is taken over ALL pixels
    (background pixels agree exactly, so they contribute zero error but DO
    count in the normalization — the reference's convention).
    pred/gt: [H,W,3]; mask: [H,W]."""
    mse = jnp.mean((white_composite(pred, mask)
                    - white_composite(gt, mask)) ** 2)
    return -10.0 * jnp.log10(mse + 1e-12)
