"""Shared dataset machinery: image preprocessing, intrinsics adjustment,
threaded preloading, whole-split collation.

Parity with reference data/base.py:16-130; images come out as float32
[H,W,C] in [0,1], intrinsics are adjusted for center-crop and resize
(data/base.py:109-117).
"""

from __future__ import annotations

import concurrent.futures as futures

import numpy as np
import PIL.Image

from ..utils import log


class Dataset:
    """Base dataset: subclasses must set ``self.raw_H/raw_W`` and ``self.list``
    before calling super().__init__, then implement get_image/get_camera."""

    def __init__(self, opt, split="train"):
        self.opt = opt
        self.split = split
        if opt.data.get("augment"):
            raise NotImplementedError(
                "photometric augmentation is not supported (the reference only "
                "uses it for 2D experiments; reference data/base.py:74-90)")
        if opt.data.get("center_crop") is not None:
            self.crop_H = int(self.raw_H * opt.data.center_crop)
            self.crop_W = int(self.raw_W * opt.data.center_crop)
        else:
            self.crop_H, self.crop_W = self.raw_H, self.raw_W
        if not opt.get("H") or not opt.get("W"):
            opt.H, opt.W = self.crop_H, self.crop_W

    def __len__(self):
        return len(self.list)

    # -- loading ------------------------------------------------------------

    def preload_threading(self, opt, load_func, data_str="images"):
        """Parallel preloading (reference data/base.py:45-66)."""
        n_workers = max(1, int(opt.data.num_workers or 1))
        with futures.ThreadPoolExecutor(n_workers) as ex:
            out = list(ex.map(lambda i: load_func(opt, i), range(len(self))))
        log.info("preloaded {} {}".format(len(out), data_str))
        return out

    def get_image(self, opt, idx):
        raise NotImplementedError

    def get_camera(self, opt, idx):
        raise NotImplementedError

    # -- preprocessing ------------------------------------------------------

    def preprocess_image(self, opt, image):
        """PIL -> float32 [H,W,C] in [0,1], with center-crop + resize."""
        if opt.data.get("center_crop") is not None:
            left = (self.raw_W - self.crop_W) // 2
            top = (self.raw_H - self.crop_H) // 2
            image = image.crop((left, top, left + self.crop_W, top + self.crop_H))
        if opt.data.image_size[0] is not None:
            image = image.resize((opt.W, opt.H), PIL.Image.BILINEAR)
        arr = np.asarray(image, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        return arr

    def preprocess_camera(self, opt, intr, pose):
        """Adjust intrinsics for crop/resize (reference data/base.py:109-117)."""
        intr = np.array(intr, dtype=np.float32)
        intr[0, 2] -= (self.raw_W - self.crop_W) / 2
        intr[1, 2] -= (self.raw_H - self.crop_H) / 2
        intr[0] *= opt.W / self.crop_W
        intr[1] *= opt.H / self.crop_H
        return intr, np.array(pose, dtype=np.float32)

    # -- whole-split collation ----------------------------------------------

    def __getitem__(self, idx):
        raise NotImplementedError

    def all_arrays(self, opt):
        """Stack the whole split into a dict of numpy arrays (device-ready)."""
        samples = [self[i] for i in range(len(self))]
        out = {}
        for k in samples[0]:
            out[k] = np.stack([np.asarray(s[k]) for s in samples]).astype(
                np.float32 if np.asarray(samples[0][k]).dtype.kind == "f" else None)
        out["idx"] = np.arange(len(self), dtype=np.int32)
        return out


# -- host-side pose helpers (numpy mirrors of ops.pose, used by loaders) -----

def np_pose(R=None, t=None):
    if R is None:
        R = np.eye(3, dtype=np.float32)
    if t is None:
        t = np.zeros(3, dtype=np.float32)
    R = np.asarray(R, np.float32)
    t = np.asarray(t, np.float32)
    return np.concatenate([R, t[..., None]], axis=-1)


def np_invert(pose):
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = np.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return np.concatenate([R_inv, t_inv[..., None]], axis=-1).astype(np.float32)


def np_compose_pair(pose_a, pose_b):
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R = R_b @ R_a
    t = R_b @ t_a + t_b
    return np.concatenate([R, t], axis=-1).astype(np.float32)
