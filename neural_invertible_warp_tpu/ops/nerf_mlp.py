"""NeRF field MLP: functional init + apply.

Architecture parity with reference model/nerf.py:367-483 (and the INN/BARF
variants that differ only in the coarse-to-fine PE mask):
  * trunk ``layers_feat`` (default 8x256, skip concat at layer 4), last trunk
    layer emits width+1 where channel 0 is density;
  * RGB head ``layers_rgb`` (default 256(+view enc) -> 128 -> 3), sigmoid;
  * TensorFlow-style Xavier-uniform init with the density row initialized at
    gain 1 and everything else at gain sqrt(2) (model/nerf.py:404-414);
  * sin/cos positional encoding with identity concat, optionally masked by the
    BARF coarse-to-fine schedule driven by a ``progress`` scalar.

Weights are stored as [in, out] so the apply path is `x @ W + b` — MXU-friendly
row-major matmuls over a flattened [rays*samples, features] axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .posenc import positional_encoding_c2f

_DENSITY_ACTIV = dict(
    softplus=jax.nn.softplus,
    relu=jax.nn.relu,
    abs=jnp.abs,
    sigmoid=jax.nn.sigmoid,
    exp=jnp.exp,
)


def layer_dims(layers):
    """[None,256,...] -> [(in,out), ...] (reference util.py:176-178)."""
    return list(zip(layers[:-1], layers[1:]))


def _xavier_uniform(key, n_rows, n_cols, gain):
    """torch.nn.init.xavier_uniform_ on a (rows=out, cols=in) block."""
    bound = gain * math.sqrt(6.0 / (n_rows + n_cols))
    return jax.random.uniform(key, (n_rows, n_cols), minval=-bound, maxval=bound,
                              dtype=jnp.float32)


def init_nerf_params(key, arch, view_dep=True):
    """Build the parameter pytree.

    Args:
        arch: DotDict with layers_feat, layers_rgb, skip, posenc{L_3D,L_view},
              tf_init (options/nerf_*.yaml `arch` section).
    Returns:
        dict(feat=[{w,b}...], rgb=[{w,b}...])
    """
    posenc = arch.get("posenc", None)
    input_3D_dim = 3 + 6 * posenc.L_3D if posenc else 3
    input_view_dim = (3 + 6 * posenc.L_view if posenc else 3) if view_dep else 0

    feat_layers = []
    dims = layer_dims(arch.layers_feat)
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = input_3D_dim
        if li in arch.skip:
            k_in += input_3D_dim
        if li == len(dims) - 1:
            k_out += 1  # +1 density channel
        key, sub = jax.random.split(key)
        if arch.get("tf_init", False):
            if li == len(dims) - 1:
                k1, k2 = jax.random.split(sub)
                w_density = _xavier_uniform(k1, 1, k_in, gain=1.0)
                w_feat = _xavier_uniform(k2, k_out - 1, k_in, gain=math.sqrt(2.0))
                w = jnp.concatenate([w_density, w_feat], axis=0).T
            else:
                w = _xavier_uniform(sub, k_out, k_in, gain=math.sqrt(2.0)).T
        else:
            # torch.nn.Linear default: U(-1/sqrt(in), 1/sqrt(in))
            bound = 1.0 / math.sqrt(k_in)
            w = jax.random.uniform(sub, (k_in, k_out), minval=-bound, maxval=bound)
        feat_layers.append(dict(w=w, b=jnp.zeros((k_out,), jnp.float32)))

    rgb_layers = []
    dims = layer_dims(arch.layers_rgb)
    feat_dim = arch.layers_feat[-1]
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = feat_dim + input_view_dim
        key, sub = jax.random.split(key)
        if arch.get("tf_init", False):
            gain = 1.0 if li == len(dims) - 1 else math.sqrt(2.0)
            w = _xavier_uniform(sub, k_out, k_in, gain=gain).T
        else:
            bound = 1.0 / math.sqrt(k_in)
            w = jax.random.uniform(sub, (k_in, k_out), minval=-bound, maxval=bound)
        rgb_layers.append(dict(w=w, b=jnp.zeros((k_out,), jnp.float32)))

    return dict(feat=feat_layers, rgb=rgb_layers)


def apply_nerf(params, arch, points_3D, ray_unit=None, *,
               view_dep=True, density_activ="softplus",
               progress=None, barf_c2f=None,
               density_noise_reg=None, noise_key=None):
    """Evaluate the field at 3D points.

    Args:
        points_3D: [..., 3]; ray_unit: [..., 3] (required if view_dep).
        progress/barf_c2f: BARF coarse-to-fine PE mask inputs (both or neither).
    Returns:
        rgb [...,3], density [...]
    """
    posenc = arch.get("posenc", None)
    if posenc:
        enc = positional_encoding_c2f(points_3D, posenc.L_3D, progress, barf_c2f)
        points_enc = jnp.concatenate([points_3D, enc], axis=-1)
    else:
        points_enc = points_3D
    feat = points_enc
    n_feat = len(params["feat"])
    density = None
    for li, layer in enumerate(params["feat"]):
        if li in arch.skip:
            feat = jnp.concatenate([feat, points_enc], axis=-1)
        feat = feat @ layer["w"] + layer["b"]
        if li == n_feat - 1:
            density = feat[..., 0]
            if density_noise_reg and noise_key is not None:
                density = density + jax.random.normal(noise_key, density.shape,
                                                      density.dtype) * density_noise_reg
            density = _DENSITY_ACTIV[density_activ](density)
            feat = feat[..., 1:]
        feat = jax.nn.relu(feat)
    if view_dep:
        assert ray_unit is not None
        if posenc:
            ray_enc = positional_encoding_c2f(ray_unit, posenc.L_view, progress, barf_c2f)
            ray_enc = jnp.concatenate([ray_unit, ray_enc], axis=-1)
        else:
            ray_enc = ray_unit
        feat = jnp.concatenate([feat, ray_enc], axis=-1)
    n_rgb = len(params["rgb"])
    for li, layer in enumerate(params["rgb"]):
        feat = feat @ layer["w"] + layer["b"]
        if li != n_rgb - 1:
            feat = jax.nn.relu(feat)
    rgb = jax.nn.sigmoid(feat)
    return rgb, density


def apply_nerf_samples(params, arch, center, ray, depth_samples, **kwargs):
    """Field evaluation along rays (reference forward_samples, nerf.py:449-456).

    center/ray: [B,R,3]; depth_samples: [B,R,K,1] -> rgb [B,R,K,3], density [B,R,K].
    """
    points = center[..., None, :] + ray[..., None, :] * depth_samples  # [B,R,K,3]
    if kwargs.get("view_dep", True):
        ray_unit = ray / jnp.clip(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12, None)
        ray_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
    else:
        ray_unit = None
    return apply_nerf(params, arch, points, ray_unit, **kwargs)
