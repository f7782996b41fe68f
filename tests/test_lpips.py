"""LPIPS network + weight-converter coverage (VERDICT r1 item 6).

The real AlexNet weights cannot be downloaded here, so these tests exercise
the full network with synthetic (random) weights: shapes, finiteness,
identical-images == 0, sensitivity to differences, and the torch-state-dict
converter round-trip."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from neural_invertible_warp_tpu.ops import lpips as lpips_mod
import convert_lpips_weights as conv


def synth_weights(seed=0):
    rng = np.random.RandomState(seed)
    w = {}
    for i, shape in enumerate(conv.EXPECTED_CONV_SHAPES):
        w["conv{}".format(i)] = rng.randn(*shape).astype(np.float32) * 0.05
        w["conv{}_b".format(i)] = rng.randn(shape[0]).astype(np.float32) * 0.05
        w["lin{}".format(i)] = np.abs(
            rng.randn(shape[0]).astype(np.float32)) * 0.1
    return w


def test_lpips_network_with_synthetic_weights():
    w = synth_weights()
    rng = np.random.RandomState(1)
    a = rng.rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    b = rng.rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    same = lpips_mod.lpips(a, a, weights=w)
    diff = lpips_mod.lpips(a, b, weights=w)
    assert np.isfinite(same) and np.isfinite(diff)
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 1e-5
    # closer images score lower
    near = lpips_mod.lpips(a, a + 0.01 * (b - a), weights=w)
    assert near < diff


def test_lpips_env_gating(tmp_path, monkeypatch):
    lpips_mod.reset_cache()
    monkeypatch.delenv(lpips_mod.WEIGHTS_ENV, raising=False)
    assert not lpips_mod.available()
    assert np.isnan(lpips_mod.lpips(np.zeros((1, 3, 32, 32), np.float32),
                                    np.zeros((1, 3, 32, 32), np.float32)))
    path = tmp_path / "w.npz"
    np.savez(path, **synth_weights())
    monkeypatch.setenv(lpips_mod.WEIGHTS_ENV, str(path))
    lpips_mod.reset_cache()
    assert lpips_mod.available()
    v = lpips_mod.lpips(np.zeros((1, 3, 32, 32), np.float32) - 0.5,
                        np.zeros((1, 3, 32, 32), np.float32) + 0.5)
    assert np.isfinite(v)
    lpips_mod.reset_cache()
    monkeypatch.delenv(lpips_mod.WEIGHTS_ENV, raising=False)


def test_converter_round_trip(tmp_path):
    torch = pytest.importorskip("torch")
    # synthetic lpips-layout state dict
    rng = np.random.RandomState(2)
    sd = {}
    for (prefix, i), shape in zip(conv._CONV_KEYS,
                                  conv.EXPECTED_CONV_SHAPES):
        sd[prefix + ".weight"] = torch.tensor(
            rng.randn(*shape).astype(np.float32))
        sd[prefix + ".bias"] = torch.tensor(
            rng.randn(shape[0]).astype(np.float32))
        sd["lin{}.model.1.weight".format(i)] = torch.tensor(
            rng.randn(1, shape[0], 1, 1).astype(np.float32))
    src = tmp_path / "lpips_alex.pth"
    dst = tmp_path / "lpips_alex.npz"
    torch.save(sd, str(src))
    assert conv.main([str(src), str(dst)]) == 0
    w = dict(np.load(dst))
    for i, shape in enumerate(conv.EXPECTED_CONV_SHAPES):
        assert w["conv{}".format(i)].shape == shape
        np.testing.assert_allclose(
            w["conv{}".format(i)], sd[conv._CONV_KEYS[i][0] + ".weight"],
            rtol=0, atol=0)
        assert w["lin{}".format(i)].shape == (shape[0],)
    # the converted npz drives the real network
    a = rng.rand(1, 3, 64, 64).astype(np.float32)
    v = lpips_mod.lpips(a, -a, weights=w)
    assert np.isfinite(v)


def test_converter_rejects_wrong_shapes():
    sd = {"net.slice1.0.weight": np.zeros((8, 3, 3, 3), np.float32),
          "net.slice1.0.bias": np.zeros((8,), np.float32)}
    with pytest.raises((ValueError, KeyError)):
        conv.convert_state_dict(sd)
