"""GARF field: Gaussian-activation NeRF (no positional encoding).

Parity with reference model/nerf_gaussian.py:334-457 (``NeRF_Gaussian``):
* input linear then a mean-centered Gaussian feature
  exp(-0.5 (mean(x) - x)^2 / sigma^2) (nerf_gaussian.py:437-449);
* ``depth`` gaussian-activated trunk layers with a skip concat AFTER the
  activation at ``arch.skip`` (doubling the next layer's input width);
* view-dependent heads: alpha (density), feature, gaussian view branch
  (width/2), rgb (+ optional sigmoid);
* torch default Linear init (U(+-1/sqrt(fan_in)) for weight AND bias) unless
  ``init.weight.uniform`` requests U(+-range).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .nerf_mlp import _DENSITY_ACTIV


def _linear_init(key, k_in, k_out, uniform_range=None):
    kw, kb = jax.random.split(key)
    if uniform_range is not None:
        w = jax.random.uniform(kw, (k_in, k_out), minval=-uniform_range,
                               maxval=uniform_range, dtype=jnp.float32)
    else:
        bound = 1.0 / math.sqrt(k_in)
        w = jax.random.uniform(kw, (k_in, k_out), minval=-bound, maxval=bound,
                               dtype=jnp.float32)
    bound = 1.0 / math.sqrt(k_in)
    b = jax.random.uniform(kb, (k_out,), minval=-bound, maxval=bound,
                           dtype=jnp.float32)
    return dict(w=w, b=b)


def init_gaussian_nerf_params(key, arch, view_dep=True, init_cfg=None):
    width, depth = arch.width, arch.depth
    ur = None
    if init_cfg and init_cfg.get("weight") and init_cfg.weight.get("uniform"):
        ur = init_cfg.weight.range
    keys = jax.random.split(key, depth + 8)
    params = dict(
        gaussian_linear_d=_linear_init(keys[0], 3, width, ur),
        gaussian_linear_c=_linear_init(keys[1], 3, width, ur),
    )
    pts = [_linear_init(keys[2], width, width, ur)]
    for i in range(depth - 1):
        k_in = 2 * width if i in arch.skip else width
        pts.append(_linear_init(keys[3 + i], k_in, width, ur))
    params["pts_linears"] = pts
    if view_dep:
        params["feature_linear"] = _linear_init(keys[depth + 3], width, width, ur)
        params["alpha_linear"] = _linear_init(keys[depth + 4], width, 1, ur)
        params["views_linears"] = [_linear_init(keys[depth + 5], 2 * width,
                                                width // 2, ur)]
        params["rgb_linear"] = _linear_init(keys[depth + 6], width // 2, 3, ur)
    else:
        params["output_linear"] = _linear_init(keys[depth + 3], width, 4, ur)
    return params


def _gaussian_init_feature(layer, x, sigma):
    """exp(-0.5 (mean - x)^2 / sigma^2) on the lifted input."""
    h = x @ layer["w"] + layer["b"]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    return jnp.exp(-0.5 * (mu - h) ** 2 / sigma ** 2)


def apply_gaussian_nerf(params, arch, points_3D, ray_unit=None, *,
                        view_dep=True, density_activ="softplus",
                        density_noise_reg=None, noise_key=None, **_unused):
    """Evaluate the Gaussian-activation field. Returns (rgb, density)."""
    sigma = arch.gaussian.sigma

    def gauss(x):
        return jnp.exp(-0.5 * x ** 2 / sigma ** 2)

    feat = _gaussian_init_feature(params["gaussian_linear_d"], points_3D, sigma)
    points_enc = feat
    for i, layer in enumerate(params["pts_linears"]):
        feat = gauss(feat @ layer["w"] + layer["b"])
        if i in arch.skip:
            feat = jnp.concatenate([points_enc, feat], axis=-1)
    if view_dep:
        assert ray_unit is not None
        alpha = feat @ params["alpha_linear"]["w"] + params["alpha_linear"]["b"]
        feature = feat @ params["feature_linear"]["w"] + params["feature_linear"]["b"]
        ray_enc = _gaussian_init_feature(params["gaussian_linear_c"], ray_unit,
                                         sigma)
        h = jnp.concatenate([feature, ray_enc], axis=-1)
        for layer in params["views_linears"]:
            h = gauss(h @ layer["w"] + layer["b"])
        rgb = h @ params["rgb_linear"]["w"] + params["rgb_linear"]["b"]
    else:
        out = feat @ params["output_linear"]["w"] + params["output_linear"]["b"]
        rgb, alpha = out[..., :3], out[..., 3:]
    if arch.get("sigmoid"):
        rgb = jax.nn.sigmoid(rgb)
    if density_noise_reg and noise_key is not None:
        alpha = alpha + jax.random.normal(noise_key, alpha.shape) * density_noise_reg
    density = _DENSITY_ACTIV[density_activ](alpha)[..., 0]
    return rgb, density


def apply_gaussian_nerf_samples(params, arch, center, ray, depth_samples,
                                **kwargs):
    points = center[..., None, :] + ray[..., None, :] * depth_samples
    if kwargs.get("view_dep", True):
        ray_unit = ray / jnp.clip(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                                  1e-12, None)
        ray_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
    else:
        ray_unit = None
    return apply_gaussian_nerf(params, arch, points, ray_unit, **kwargs)
