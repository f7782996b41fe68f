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
                      quant_px=1.0, pairs=None, matcher_kwargs=None,
                      method="incremental", retrieval_neighbors=10):
    """Full pose-initialization pipeline.

    Args:
        images: [N,H,W,3] float array (or list of HxWx3 arrays).
        intrinsics: [N,3,3].
        matcher: callable or config name (utils/matchers.py).
        save_dir: optional directory for correspondence/pose dumps.
        pairs: explicit (i, j) match pairs; default proposes them by
            appearance retrieval (matchers.retrieval_pairs) when N is
            large enough for exhaustive matching to hurt, else exhaustive.
        method: "incremental" (COLMAP-style seed-and-grow with PnP-refine
            registration, retry sweeps, and gauge-fixed LM BA — the
            default; on the 49-view fixture it registers every camera,
            and with unbiased matches reaches 0.04 deg mean rotation
            error) or "global" (rotation averaging + known-rotation
            linear init + LM BA; kept as an alternative for unordered
            wide-baseline collections — on thin-baseline arcs its
            two-view rotation init lands outside the BA basin and it
            loses to incremental, measured in tests/test_sfm_scale.py).
            "incremental" falls back to global when it registers fewer
            than half the cameras.
    Returns:
        (initial_poses_w2c [N,3,4] float32, valid_idx list, excluded list)
        — same contract as reference compute_sfm_pdcnet (sfm.py:337-406).
        The recovered frame/scale is arbitrary, like COLMAP's.
    """
    images = [np.asarray(im) for im in images]
    n = len(images)
    intrinsics = np.asarray(intrinsics)
    match_fn = get_matcher(matcher, **(matcher_kwargs or {}))

    pair_matches = {}
    if pairs is None:
        if retrieval_neighbors and n > retrieval_neighbors + 2:
            pairs = matchers_mod.retrieval_pairs(
                images, num_neighbors=retrieval_neighbors)
        else:
            pairs = matchers_mod.exhaustive_pairs(n)
    for (i, j) in pairs:
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

    kwargs = dict(thresh_px=thresh_px, ba_iters=ba_iters,
                  min_track_len=min_track_len, seed=seed, quant=quant_px)
    if method == "incremental":
        poses, valid, excluded = sfm_mod.incremental_sfm(
            pair_matches, intrinsics, n, **kwargs)
        if len(valid) < max(3, n // 2):
            log.warn("sfm: incremental path registered only {}/{} cameras; "
                     "retrying global".format(len(valid), n))
            p2, v2, e2 = sfm_mod.global_sfm(
                pair_matches, intrinsics, n, **kwargs)
            if len(v2) > len(valid):
                poses, valid, excluded = p2, v2, e2
    elif method == "global":
        poses, valid, excluded = sfm_mod.global_sfm(
            pair_matches, intrinsics, n, **kwargs)
    else:
        raise ValueError("unknown sfm method: {}".format(method))

    if save_dir is not None:
        import os
        np.savez(os.path.join(save_dir, "initial_poses.npz"),
                 poses=poses, valid=np.array(valid, np.int32),
                 excluded=np.array(excluded, np.int32))
    return poses, valid, excluded
