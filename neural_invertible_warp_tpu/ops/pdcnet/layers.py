"""Primitive layers for the JAX PDC-Net (inference-only dense matcher).

Torch-semantics mirrors for exact parity against the reference
(third_party/DenseMatching): NCHW activations, OIHW conv kernels (so the
weight converter is a straight copy), eval-mode BatchNorm, torch
`F.interpolate` bilinear (half-pixel) and `area` (adaptive-average) resizes,
and `grid_sample(align_corners=True, padding_mode='zeros')`. All ops are
plain XLA (matmuls/convs/gathers) — this subsystem is inference-only, so no
custom VJPs are needed.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5


# ------------------------------------------------------------------ init


def kaiming_conv(key, c_out, c_in, kh, kw):
    """torch kaiming_normal_(mode='fan_in') on an OIHW kernel."""
    fan_in = c_in * kh * kw
    std = math.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (c_out, c_in, kh, kw)) * std


def init_conv(key, c_in, c_out, k=3, bias=True, bn=False):
    p = {"w": kaiming_conv(key, c_out, c_in, k, k)}
    if bias:
        p["b"] = jnp.zeros((c_out,))
    if bn:
        # torch<=1.1-style init reproduced by the reference: weight ~ U(0,1)
        key, sub = jax.random.split(key)
        p["bn"] = dict(scale=jax.random.uniform(sub, (c_out,)),
                       bias=jnp.zeros((c_out,)),
                       mean=jnp.zeros((c_out,)), var=jnp.ones((c_out,)))
    return p


def bilinear_deconv_kernel(c, k=4):
    """BilinearConvTranspose2d init (reference models/modules/mod.py):
    per-channel bilinear upsampling kernel, zero cross-channel."""
    f = (k + 1) // 2
    center = f - 1 if k % 2 == 1 else f - 0.5
    og = np.arange(k, dtype=np.float64)
    filt1d = 1 - np.abs(og - center) / f
    filt = np.outer(filt1d, filt1d)
    w = np.zeros((c, c, k, k), np.float32)
    for i in range(c):
        w[i, i] = filt
    return jnp.asarray(w)


# ------------------------------------------------------------------ apply


def conv2d(p, x, stride=1, padding=1, dilation=1):
    """NCHW conv with OIHW kernel, integer symmetric padding."""
    out = lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        out = out + p["b"][None, :, None, None]
    return out


def batchnorm(p, x):
    inv = lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"][None, :, None, None]) * \
        (p["scale"] * inv)[None, :, None, None] + p["bias"][None, :, None, None]


def lrelu(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def conv_block(p, x, stride=1, padding=1, dilation=1, relu=True):
    """The reference's `conv()` helper: Conv2d [+ BN] [+ LeakyReLU(0.1)]."""
    x = conv2d(p, x, stride=stride, padding=padding, dilation=dilation)
    if "bn" in p:
        x = batchnorm(p["bn"], x)
    if relu:
        x = lrelu(x)
    return x


def deconv2d(p, x, stride=2, padding=1):
    """torch ConvTranspose2d(k, s, p) with the torch (in, out, kH, kW)
    kernel layout: fractionally-strided conv with spatially-flipped kernel
    (output size (H-1)*s - 2p + k, matching torch)."""
    w = p["w"]
    k = w.shape[2]
    pad = k - 1 - padding
    out = lax.conv_general_dilated(
        x, w[:, :, ::-1, ::-1], window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "IOHW", "NCHW"))
    if "b" in p:
        out = out + p["b"][None, :, None, None]
    return out


def maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                             "VALID")


# ------------------------------------------------------------------ resize


def _bilinear_matrix(n_in, n_out):
    """torch F.interpolate(bilinear, align_corners=False) weights: NO
    anti-aliasing on downsampling (unlike jax.image.resize), 2-tap kernel at
    half-pixel source coords, edge-clamped."""
    M = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        x0 = math.floor(src)
        w1 = src - x0
        M[i, min(max(x0, 0), n_in - 1)] += 1.0 - w1
        M[i, min(max(x0 + 1, 0), n_in - 1)] += w1
    return jnp.asarray(M)


def interp_bilinear(x, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) on NCHW."""
    B, C, H, W = x.shape
    h2, w2 = int(out_hw[0]), int(out_hw[1])
    Mh = _bilinear_matrix(H, h2)
    Mw = _bilinear_matrix(W, w2)
    x = jnp.einsum("oh,bchw->bcow", Mh, x)
    return jnp.einsum("ow,bchw->bcho", Mw, x)


def _area_matrix(n_in, n_out):
    """torch adaptive_avg_pool1d weights: rows average
    input[floor(i*n_in/n_out) : ceil((i+1)*n_in/n_out)]."""
    M = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)
        M[i, lo:hi] = 1.0 / (hi - lo)
    return jnp.asarray(M)


def interp_area(x, out_hw):
    """torch F.interpolate(mode='area') == adaptive average pooling."""
    B, C, H, W = x.shape
    h2, w2 = int(out_hw[0]), int(out_hw[1])
    Mh = _area_matrix(H, h2)                      # [h2, H]
    Mw = _area_matrix(W, w2)                      # [w2, W]
    x = jnp.einsum("oh,bchw->bcow", Mh, x)
    return jnp.einsum("ow,bchw->bcho", Mw, x)


# ------------------------------------------------------------------ warping


def grid_sample_zeros(x, vgrid):
    """torch grid_sample(align_corners=True, padding_mode='zeros').

    x: [B,C,H,W]; vgrid: [B,2,H,W] normalized coords in [-1,1] (x then y).
    """
    B, C, H, W = x.shape
    gx = (vgrid[:, 0] + 1.0) * (W - 1) / 2.0      # [B,H,W] pixel coords
    gy = (vgrid[:, 1] + 1.0) * (H - 1) / 2.0
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = x.reshape(B, C, H * W)
        idx = (yi_c * W + xi_c).reshape(B, 1, -1)
        vals = jnp.take_along_axis(flat, jnp.broadcast_to(
            idx, (B, C, idx.shape[-1])), axis=2).reshape(B, C, H, W)
        return vals * valid[:, None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[:, None]
    wy = wy[:, None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
            v10 * (1 - wx) * wy + v11 * wx * wy)


def warp(x, flow):
    """Backward-warp x by flow (reference base_matching_net.py:228-262)."""
    B, C, H, W = x.shape
    xx = jnp.arange(W, dtype=x.dtype)[None, :].repeat(H, 0)
    yy = jnp.arange(H, dtype=x.dtype)[:, None].repeat(W, 1)
    grid = jnp.stack([xx, yy])[None]              # [1,2,H,W]
    vgrid = grid + flow
    vx = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vy = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    return grid_sample_zeros(x, jnp.stack([vx, vy], axis=1))


# ------------------------------------------------------------------ misc


def l2norm_channel(x, eps=1e-6):
    """FeatureL2Norm over the channel dim (DGC-Net convention)."""
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True) + eps)
    return x / norm


def unnormalise_and_convert_mapping_to_flow(mapping):
    """Normalized [-1,1] mapping -> flow in pixels (mod.py:48-66)."""
    B, C, H, W = mapping.shape
    mx = (mapping[:, 0] + 1) * (W - 1) / 2.0
    my = (mapping[:, 1] + 1) * (H - 1) / 2.0
    xx = jnp.arange(W, dtype=mapping.dtype)[None, :].repeat(H, 0)
    yy = jnp.arange(H, dtype=mapping.dtype)[:, None].repeat(W, 1)
    return jnp.stack([mx - xx[None], my - yy[None]], axis=1)
