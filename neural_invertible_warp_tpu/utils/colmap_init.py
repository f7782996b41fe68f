"""SfM pose initialization ("colmap" init mode; host-side orchestration).

Reference flow (utils/colmap_initialization/sfm.py:337-406): dump images to
disk -> hloc exhaustive pairs -> PDC-Net dense matches -> pycolmap
triangulation with known intrinsics -> read images.bin -> w2c poses, with
failed images replaced by identity and reported as excluded
(sfm.py:246-284), consumed by model/barf_dtu.py:55-67.

This implementation keeps the same capability but is matcher-agnostic and
self-contained: correspondences come from any callable
``matcher(i, j, img_i, img_j) -> (kps_i, kps_j)`` (see utils/matchers.py for
the weight-free ZNCC matcher, the synthetic GT matcher used in tests, and
the PDC-Net gate), and the reconstruction runs in-process
(utils/sfm.py: essential seed -> triangulation -> PnP -> jitted JAX bundle
adjustment) instead of shelling out to pycolmap. For seeding poses from an
EXISTING on-disk COLMAP reconstruction (images.bin/cameras.bin), see
utils/colmap_io.py (pose.init=colmap_files).
"""

from __future__ import annotations

import numpy as np

from . import log
from . import matchers as matchers_mod
from . import sfm as sfm_mod


def available():
    """The subsystem is always available (in-process backend)."""
    return True


def get_matcher(name, **kwargs):
    """Resolve a matcher by config name (pose.sfm.matcher)."""
    if callable(name):
        return name
    if name in (None, "zncc", "correlation"):
        return matchers_mod.ZnccMatcher(**kwargs)
    if name == "pdcnet":
        return matchers_mod.pdcnet(**kwargs)
    raise ValueError("unknown sfm matcher: {!r}".format(name))


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


def compute_sfm_poses(images, intrinsics, matcher="zncc", save_dir=None,
                      thresh_px=2.0, ba_iters=300, min_track_len=2, seed=0,
                      quant_px=1.0):
    """Full pose-initialization pipeline.

    Args:
        images: [N,H,W,3] float array (or list of HxWx3 arrays).
        intrinsics: [N,3,3].
        matcher: callable or config name (utils/matchers.py).
        save_dir: optional directory for correspondence/pose dumps.
    Returns:
        (initial_poses_w2c [N,3,4] float32, valid_idx list, excluded list)
        — same contract as reference compute_sfm_pdcnet (sfm.py:337-406).
        The recovered frame/scale is arbitrary, like COLMAP's.
    """
    images = [np.asarray(im) for im in images]
    n = len(images)
    intrinsics = np.asarray(intrinsics)
    match_fn = get_matcher(matcher)

    pair_matches = {}
    for (i, j) in matchers_mod.exhaustive_pairs(n):
        kpi, kpj = match_fn(i, j, images[i], images[j])
        if len(kpi) >= 8:
            pair_matches[(i, j)] = (kpi, kpj)
    n_match = sum(len(a) for a, _ in pair_matches.values())
    log.info("sfm: {} verified pairs, {} correspondences".format(
        len(pair_matches), n_match))

    if save_dir is not None:
        import os
        os.makedirs(save_dir, exist_ok=True)
        np.savez(os.path.join(save_dir, "matches.npz"),
                 **{"{}_{}".format(i, j): np.concatenate([a, b], axis=1)
                    for (i, j), (a, b) in pair_matches.items()})

    poses, valid, excluded = sfm_mod.incremental_sfm(
        pair_matches, intrinsics, n, thresh_px=thresh_px, ba_iters=ba_iters,
        min_track_len=min_track_len, seed=seed, quant=quant_px)

    if save_dir is not None:
        import os
        np.savez(os.path.join(save_dir, "initial_poses.npz"),
                 poses=poses, valid=np.array(valid, np.int32),
                 excluded=np.array(excluded, np.int32))
    return poses, valid, excluded
