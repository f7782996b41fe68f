"""Invertible deformation network (RealNVP/NDR-style coupling blocks).

Functional JAX redesign of reference model/nvp/nvp_ndr.py:229-567
(``DeformNetwork``), the paper's core module. Per block (axis-cycled by
``form=(i//3)%2``, ``mode=i%3``):

  part a: the "focus" coordinate is shifted by an MLP of the other two
          coordinates (annealed-PE encoded) and the per-image latent code:
              z' = z - MLP_a([PE(xy), c])
  part b: the other two coordinates get an inverse 2D rigid transform whose
          angle/translation come from an MLP of the new focus coordinate:
              (theta, du, dv) = MLP_b([PE(z'), c])
              xy' = R(-theta) @ (xy - duv)
  latent: per-block residual projector c_i = W_c c + b_c + c.

Both MLP output layers are zero-initialized so the warp starts as the exact
identity (nvp_ndr.py:276-277,320-322); the first layers use weight
normalization with only the raw-coordinate input columns non-zero
(nvp_ndr.py:278-282). ``inverse`` runs the blocks in reverse with the exact
algebraic inverses, giving bit-exact invertibility up to fp32 rounding.

Points are [B,N,3] with a per-image latent [B,D]; all compute is batched
matmuls over the flattened point axis (MXU-friendly), no per-point Python.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .posenc import (annealed_embed, annealed_embed_dim,
                     annealed_embed_reference)

# (focus_axis, other_axes) per (form, mode) — reference nvp_ndr.py:389-410
_AXES = {
    (0, 0): (2, (0, 1)),
    (0, 1): (1, (0, 2)),
    (0, 2): (0, (1, 2)),
    (1, 0): (0, (1, 2)),
    (1, 1): (1, (0, 2)),
    (1, 2): (2, (0, 1)),
}


def _activation(name):
    if name == "softplus":
        return lambda x: jax.nn.softplus(100.0 * x) / 100.0  # beta=100
    if name == "silu":
        return jax.nn.silu
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "sine":
        return lambda x: jnp.sin(10.0 * x)
    if name == "gaussian":
        return lambda x: jnp.exp(-0.5 * x ** 2)
    raise ValueError("unknown INN activation: {}".format(name))


def _wn_weight(layer):
    """Effective weight of a weight-normalized layer: W = v * g/||v||_col."""
    v, g = layer["v"], layer["g"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
    return v * (g / jnp.clip(norm, 1e-12, None))


def _apply_mlp(layers, x, act):
    """Hidden layers are weight-normalized + activated; final layer is plain."""
    for layer in layers[:-1]:
        x = act(x @ _wn_weight(layer) + layer["b"])
    last = layers[-1]
    return x @ last["w"] + last["b"]


def _init_branch(key, ori_in, d_feature, d_hidden, n_layers, d_out, multires):
    """One coupling branch: [PE(coords) ++ latent] -> hidden^n -> d_out.

    First layer: N(0, sqrt(2/d_hidden)) on the raw-coordinate columns, zeros on
    the PE-frequency and latent columns; weight-normalized. Final layer zeros.
    """
    pe_dim = annealed_embed_dim(multires, ori_in) if multires > 0 else ori_in
    dims = [pe_dim + d_feature] + [d_hidden] * n_layers + [d_out]
    layers = []
    for l in range(len(dims) - 1):
        k_in, k_out = dims[l], dims[l + 1]
        key, sub = jax.random.split(key)
        if l == len(dims) - 2:
            layers.append(dict(w=jnp.zeros((k_in, k_out), jnp.float32),
                               b=jnp.zeros((k_out,), jnp.float32)))
        else:
            std = math.sqrt(2.0) / math.sqrt(k_out)
            if l == 0 and multires > 0:
                v = jnp.zeros((k_in, k_out), jnp.float32)
                v = v.at[:ori_in].set(jax.random.normal(sub, (ori_in, k_out)) * std)
            else:
                v = jax.random.normal(sub, (k_in, k_out)) * std
            g = jnp.linalg.norm(v, axis=0)
            layers.append(dict(v=v, g=g, b=jnp.zeros((k_out,), jnp.float32)))
    return layers


def init_deform_params(key, d_feature, d_hidden=128, n_blocks=3, n_layers=1,
                       multires=6):
    """Parameters for the deformation network (defaults = paper model:
    reference model/barf_inn_llff.py:54-55 / model/pose_models/inn.py:23-27)."""
    blocks = []
    for _ in range(n_blocks):
        key, ka, kb = jax.random.split(key, 3)
        blocks.append(dict(
            a=_init_branch(ka, 2, d_feature, d_hidden, n_layers, 1, multires),
            b=_init_branch(kb, 1, d_feature, d_hidden, 1, 3, multires),
            c=dict(w=jnp.zeros((d_feature, d_feature), jnp.float32),
                   b=jnp.zeros((d_feature,), jnp.float32)),
        ))
    return dict(blocks=blocks)


def _embed(x, multires, alpha_ratio, anneal="reference"):
    """INN input embedding. anneal="reference" reproduces the reference's
    ACTUAL computation — the Nerfies window lands on the POINT axis, so
    features get full-frequency PE from step 0 (see
    posenc.annealed_embed_reference; this is what makes joint pose+field
    recovery work, EVIDENCE_r3.md). anneal="bands" is the windowing the
    paper DESCRIBES (kept for ablation)."""
    if multires > 0:
        if anneal == "reference":
            return annealed_embed_reference(x, multires, alpha_ratio)
        return annealed_embed(x, multires, alpha_ratio)
    return x


def _block_code(block, code):
    """Residual latent projector (nvp_ndr.py:341-345,378-381)."""
    return code @ block["c"]["w"] + block["c"]["b"] + code


@partial(jax.jit, static_argnames=("multires", "actfn", "n_blocks",
                                   "anneal"))
def deform_forward(params, code, pts, alpha_ratio, *, multires=6,
                   actfn="softplus", n_blocks=None, anneal="reference"):
    """Warp points forward. code: [B,D]; pts: [B,N,3] -> [B,N,3]."""
    act = _activation(actfn)
    blocks = params["blocks"]
    n_blocks = n_blocks or len(blocks)
    x = pts
    for i_b in range(n_blocks):
        block = blocks[i_b]
        focus_ax, other_ax = _AXES[((i_b // 3) % 2, i_b % 3)]
        code_ib = _block_code(block, code)                        # [B,D]
        code_n = jnp.broadcast_to(code_ib[:, None, :], x.shape[:-1] + code_ib.shape[-1:])
        focus = x[..., focus_ax:focus_ax + 1]                     # [B,N,1]
        other = jnp.stack([x[..., other_ax[0]], x[..., other_ax[1]]], axis=-1)
        # part a: shift the focus coordinate
        h = jnp.concatenate([_embed(other, multires, alpha_ratio, anneal),
                             code_n], axis=-1)
        focus = focus - _apply_mlp(block["a"], h, act)
        # part b: inverse 2D rigid transform on the other pair
        h = jnp.concatenate([_embed(focus, multires, alpha_ratio, anneal),
                             code_n], axis=-1)
        out = _apply_mlp(block["b"], h, act)                      # [B,N,3]
        theta, trans = out[..., 0:1], out[..., 1:3]
        c, s = jnp.cos(theta[..., 0]), jnp.sin(theta[..., 0])
        o = other - trans
        other = jnp.stack([c * o[..., 0] + s * o[..., 1],
                           -s * o[..., 0] + c * o[..., 1]], axis=-1)
        # reassemble by axis index
        cols = [None, None, None]
        cols[focus_ax] = focus[..., 0]
        cols[other_ax[0]] = other[..., 0]
        cols[other_ax[1]] = other[..., 1]
        x = jnp.stack(cols, axis=-1)
    return x


@partial(jax.jit, static_argnames=("multires", "actfn", "n_blocks",
                                   "anneal"))
def deform_inverse(params, code, pts, alpha_ratio, *, multires=6,
                   actfn="softplus", n_blocks=None, anneal="reference"):
    """Exact inverse warp (reference nvp_ndr.py:471-567)."""
    act = _activation(actfn)
    blocks = params["blocks"]
    n_blocks = n_blocks or len(blocks)
    x = pts
    for i_b in reversed(range(n_blocks)):
        block = blocks[i_b]
        focus_ax, other_ax = _AXES[((i_b // 3) % 2, i_b % 3)]
        code_ib = _block_code(block, code)
        code_n = jnp.broadcast_to(code_ib[:, None, :], x.shape[:-1] + code_ib.shape[-1:])
        focus = x[..., focus_ax:focus_ax + 1]                     # z'
        other = jnp.stack([x[..., other_ax[0]], x[..., other_ax[1]]], axis=-1)
        # invert part b: forward 2D rigid transform on the pair
        h = jnp.concatenate([_embed(focus, multires, alpha_ratio, anneal),
                             code_n], axis=-1)
        out = _apply_mlp(block["b"], h, act)
        theta, trans = out[..., 0:1], out[..., 1:3]
        c, s = jnp.cos(theta[..., 0]), jnp.sin(theta[..., 0])
        other = jnp.stack([c * other[..., 0] - s * other[..., 1],
                           s * other[..., 0] + c * other[..., 1]], axis=-1) + trans
        # invert part a: add the shift back
        h = jnp.concatenate([_embed(other, multires, alpha_ratio, anneal),
                             code_n], axis=-1)
        focus = focus + _apply_mlp(block["a"], h, act)
        cols = [None, None, None]
        cols[focus_ax] = focus[..., 0]
        cols[other_ax[0]] = other[..., 0]
        cols[other_ax[1]] = other[..., 1]
        x = jnp.stack(cols, axis=-1)
    return x
