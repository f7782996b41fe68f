"""Convert a torch ``lpips`` (AlexNet) checkpoint into the npz layout used by
``neural_invertible_warp_tpu.ops.lpips``.

The reference evaluates LPIPS through the pip ``lpips==0.1.4`` package
(reference model/nerf.py:25,182; requirements.txt). That package combines
torchvision's pretrained AlexNet features with learned per-channel "lin"
heads. This environment has no network egress, so instead of downloading we
accept a state dict saved from any machine that has it:

    import torch, lpips
    loss_fn = lpips.LPIPS(net="alex")
    torch.save(loss_fn.state_dict(), "lpips_alex.pth")

then here:

    python tools/convert_lpips_weights.py lpips_alex.pth lpips_alex.npz
    export NIW_LPIPS_WEIGHTS=$PWD/lpips_alex.npz

npz layout (consumed by ops/lpips.py):
    conv0..conv4      [out,in,kh,kw]   AlexNet feature convs
    conv0_b..conv4_b  [out]            their biases
    lin0..lin4        [C]              LPIPS per-channel head weights
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# torchvision AlexNet ``features`` indices of the five convs, and the lpips
# slice each one lives in (lpips/pretrained_networks.py alexnet slices:
# slice1=features[0:2], slice2=[2:5], slice3=[5:8], slice4=[8:10],
# slice5=[10:12]; state-dict keys keep the original feature indices).
_CONV_KEYS = [
    ("net.slice1.0", 0),
    ("net.slice2.3", 1),
    ("net.slice3.6", 2),
    ("net.slice4.8", 3),
    ("net.slice5.10", 4),
]

EXPECTED_CONV_SHAPES = [
    (64, 3, 11, 11),
    (192, 64, 5, 5),
    (384, 192, 3, 3),
    (256, 384, 3, 3),
    (256, 256, 3, 3),
]


def convert_state_dict(sd):
    """lpips.LPIPS(net='alex') state dict -> npz dict. Raises KeyError with
    the missing key name if the layout is not the expected one."""
    out = {}

    def tonp(v):
        # works for torch tensors and numpy arrays alike
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    for prefix, i in _CONV_KEYS:
        w = tonp(sd["{}.weight".format(prefix)])
        b = tonp(sd["{}.bias".format(prefix)])
        if w.shape != EXPECTED_CONV_SHAPES[i]:
            raise ValueError(
                "conv{} has shape {}, expected {} — is this an AlexNet LPIPS "
                "checkpoint?".format(i, w.shape, EXPECTED_CONV_SHAPES[i]))
        out["conv{}".format(i)] = w
        out["conv{}_b".format(i)] = b
    for i in range(5):
        # lin heads: 1x1 convs [1,C,1,1] -> per-channel vector [C]
        key = "lin{}.model.1.weight".format(i)
        lin = tonp(sd[key]).reshape(-1)
        if lin.shape[0] != EXPECTED_CONV_SHAPES[i][0]:
            raise ValueError("{} has {} channels, expected {}".format(
                key, lin.shape[0], EXPECTED_CONV_SHAPES[i][0]))
        out["lin{}".format(i)] = lin
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="torch lpips state-dict file (.pth)")
    ap.add_argument("dst", help="output .npz")
    args = ap.parse_args(argv)

    import torch
    sd = torch.load(args.src, map_location="cpu")
    if hasattr(sd, "state_dict"):   # whole module was saved
        sd = sd.state_dict()
    npz = convert_state_dict(sd)
    np.savez(args.dst, **npz)
    print("wrote {} ({} arrays)".format(args.dst, len(npz)))
    print("export NIW_LPIPS_WEIGHTS={}".format(args.dst))
    return 0


if __name__ == "__main__":
    sys.exit(main())
