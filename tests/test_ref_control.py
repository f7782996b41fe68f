"""Validation of the reference-control-harness shims (tools/ref_control).

The torch control run (VERDICT r2 Next #1) stands on these shims; if the
roma stand-in's Kabsch disagreed with roma's actual contract, the
global-alignment loss in the control run would silently differ from the
reference's. So we pin:
  * roma shim vs the rebuild's own `ops.align.rigid_points_registration`
    (independently tested against analytic rigid transforms),
  * roma shim vs an analytic rigid transform directly (batched + reflection
    guard),
  * EasyDict semantics the reference's options.py / data path relies on.
"""

import os
import sys

import numpy as np
import pytest

SHIMS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "ref_control", "shims")
sys.path.insert(0, SHIMS)

torch = pytest.importorskip("torch")


def _random_rigid(rng):
    A = rng.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.randn(3)
    return Q, t


def test_roma_shim_recovers_analytic_rigid_transform():
    from roma import rigid_points_registration  # the shim
    rng = np.random.RandomState(0)
    for b in range(4):
        R_true, t_true = _random_rigid(rng)
        x = rng.randn(50, 3)
        y = x @ R_true.T + t_true
        R, t = rigid_points_registration(
            torch.tensor(x, dtype=torch.float64),
            torch.tensor(y, dtype=torch.float64))
        # contract: R @ x + t == y
        np.testing.assert_allclose(R.numpy(), R_true, atol=1e-9)
        np.testing.assert_allclose(t.numpy(), t_true, atol=1e-9)
        assert np.linalg.det(R.numpy()) > 0


def test_roma_shim_batched_and_noisy_matches_ops_align():
    from roma import rigid_points_registration as shim_rpr
    from neural_invertible_warp_tpu.ops import align
    rng = np.random.RandomState(1)
    B, N = 5, 40
    x = rng.randn(B, N, 3)
    y = np.empty_like(x)
    for b in range(B):
        R_true, t_true = _random_rigid(rng)
        y[b] = x[b] @ R_true.T + t_true + 0.05 * rng.randn(N, 3)
    R_s, t_s = shim_rpr(torch.tensor(x), torch.tensor(y))
    R_j, t_j = align.rigid_points_registration(x, y)
    np.testing.assert_allclose(R_s.numpy(), np.asarray(R_j),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(t_s.numpy(), np.asarray(t_j),
                               atol=2e-4, rtol=1e-4)
    assert np.all(np.linalg.det(R_s.numpy()) > 0)


def test_roma_shim_reflection_guard():
    """A near-planar degenerate cloud must still yield a proper rotation."""
    from roma import rigid_points_registration
    rng = np.random.RandomState(2)
    x = rng.randn(30, 3)
    x[:, 2] *= 1e-6
    y = -x.copy()  # mirror-ish target
    R, t = rigid_points_registration(torch.tensor(x), torch.tensor(y))
    assert np.linalg.det(R.numpy()) > 0.99


def test_easydict_shim_semantics():
    from easydict import EasyDict as edict
    d = edict({"a": 1, "b": {"c": [{"x": 2}], "d": 3}})
    assert d.a == 1 and d.b.c[0].x == 2 and d["b"]["d"] == 3
    d.e = {"f": 4}
    assert d["e"].f == 4          # setattr syncs items + wraps dicts
    d["g"] = 5
    assert d.g == 5               # setitem syncs attrs
    d.update(h=6)
    assert d.h == 6 and d["h"] == 6
    assert d.pop("h") == 6
    assert "h" not in d and not hasattr(d, "h")
    with pytest.raises(AttributeError):
        _ = d.missing
    # options.py iterates .items() after command-line override
    assert dict(edict(a=dict(b=1)).items())["a"]["b"] == 1
