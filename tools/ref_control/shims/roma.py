"""Minimal `roma` stand-in for the reference control harness.

The reference calls exactly one function, `rigid_points_registration(x, y)`
(`model/nerf_inn_llff.py:569`, `model/pose_models/inn.py:100`), whose
contract (per roma's docs) is: return (R, t) minimizing ||R @ x + t - y||^2
over rotations — i.e. the rigid transform taking the FIRST point set onto
the SECOND. Batched Kabsch with the usual det-sign reflection fix.

Validated against the rebuild's Procrustes (`ops/align.py`) in
tests/test_ref_control.py.
"""

import torch


def rigid_points_registration(x, y, weights=None, compute_scaling=False):
    """x, y: [..., N, 3] -> R [..., 3, 3], t [..., 3] with R @ x + t ~= y."""
    assert not compute_scaling, "control harness only needs the rigid case"
    if weights is not None:
        w = weights[..., None] / weights.sum(-1, keepdim=True)[..., None]
        xc = (x * w).sum(-2, keepdim=True)
        yc = (y * w).sum(-2, keepdim=True)
    else:
        xc = x.mean(-2, keepdim=True)
        yc = y.mean(-2, keepdim=True)
    X = x - xc
    Y = y - yc
    if weights is not None:
        X = X * w
    M = Y.transpose(-1, -2) @ X  # [..., 3, 3]
    U, S, Vt = torch.linalg.svd(M)
    d = torch.det(U @ Vt)
    ones = torch.ones_like(d)
    D = torch.diag_embed(torch.stack([ones, ones, d], dim=-1))
    R = U @ D @ Vt
    t = yc.squeeze(-2) - (R @ xc.transpose(-1, -2)).squeeze(-1)
    return R, t
