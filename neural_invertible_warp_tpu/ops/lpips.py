"""LPIPS (AlexNet) perceptual metric — gated on weight availability.

The reference uses the ``lpips`` pip package with downloaded AlexNet weights
(reference model/nerf.py:25,182). This environment has no torchvision/lpips
and no network egress, so the metric degrades gracefully: ``available()``
reports whether a weight file can be found, and ``lpips()`` returns NaN when it
cannot. Drop pretrained AlexNet weights (as .npz with conv0..conv4 kernels and
lin0..lin4 1x1 weights) at ``NIW_LPIPS_WEIGHTS`` to enable it.
"""

from __future__ import annotations

import os

import numpy as np

WEIGHTS_ENV = "NIW_LPIPS_WEIGHTS"
_WEIGHTS_ENV = WEIGHTS_ENV   # backwards-compat alias
_cache = {"checked": False, "weights": None}


def reset_cache():
    """Forget the cached weight lookup (tests change the env var)."""
    _cache["checked"] = False
    _cache["weights"] = None


def _load_weights():
    if _cache["checked"]:
        return _cache["weights"]
    _cache["checked"] = True
    path = os.environ.get(WEIGHTS_ENV)
    if path and os.path.isfile(path):
        try:
            _cache["weights"] = dict(np.load(path))
        except Exception:
            _cache["weights"] = None
    return _cache["weights"]


def available():
    return _load_weights() is not None


def lpips(img1, img2, weights=None):
    """[B,C,H,W] in [-1,1] -> scalar LPIPS, or NaN if weights unavailable.

    ``weights`` overrides the env-located npz (used by tests); layout:
    conv0..conv4 [out,in,kh,kw] + conv{i}_b biases (torchvision AlexNet
    features) and lin0..lin4 per-channel LPIPS head weights."""
    w = weights if weights is not None else _load_weights()
    if w is None:
        return float("nan")
    import jax
    import jax.numpy as jnp

    mean = jnp.array([-0.030, -0.088, -0.188]).reshape(1, 3, 1, 1)
    std = jnp.array([0.458, 0.448, 0.450]).reshape(1, 3, 1, 1)
    x1 = (jnp.asarray(img1) - mean) / std
    x2 = (jnp.asarray(img2) - mean) / std

    def alexnet_feats(x):
        feats = []
        strides = [4, 1, 1, 1, 1]
        pads = [2, 2, 1, 1, 1]
        for i in range(5):
            k = jnp.asarray(w["conv{}".format(i)])      # [out,in,kh,kw]
            b = jnp.asarray(w["conv{}_b".format(i)])
            x = jax.lax.conv_general_dilated(
                x, k, (strides[i], strides[i]),
                [(pads[i], pads[i])] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = x + b.reshape(1, -1, 1, 1)
            x = jax.nn.relu(x)
            feats.append(x)
            if i in (0, 1):
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                          (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
        return feats

    f1, f2 = alexnet_feats(x1), alexnet_feats(x2)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        a = a / jnp.sqrt(jnp.sum(a ** 2, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b ** 2, axis=1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        lin = jnp.asarray(w["lin{}".format(i)]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
    return float(total)
