"""Functional ops used by the reference data/eval path.

`to_tensor` matches torchvision semantics for 8-bit PIL images:
HWC uint8 -> CHW float32 in [0,1].
"""

import numpy as np
import torch
import PIL.Image


def to_tensor(pic):
    if isinstance(pic, torch.Tensor):
        return pic
    arr = np.array(pic, dtype=np.uint8, copy=True)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
    return t.to(torch.float32).div_(255.0)


def to_pil_image(t):
    arr = t.detach().cpu().numpy()
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    arr = (np.clip(arr, 0.0, 1.0) * 255).round().astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    return PIL.Image.fromarray(arr)


def hflip(img):
    raise NotImplementedError("augmentation is disabled in the control harness")


def center_crop(img, size):
    raise NotImplementedError("center_crop is unused in the control harness")
