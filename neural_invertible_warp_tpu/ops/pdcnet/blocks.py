"""PDC-Net decoder / refinement / uncertainty blocks (reference
third_party/DenseMatching/models/modules/mod.py + models/PDCNet/
mod_uncertainty.py), as pure functions over parameter pytrees."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L


# --------------------------------------------------- residual decoders


def init_residual_decoder(key, in_channels, final_out=2):
    """Shared trunk of CMDTopResidualConnections /
    OpticalFlowEstimatorResidualConnection (identical structure)."""
    ks = jax.random.split(key, 8)
    return dict(
        conv_0=L.init_conv(ks[0], in_channels, 128, 3, bn=True),
        conv0_skip=L.init_conv(ks[1], 128, 96, 1, bias=False, bn=True),
        conv_1=L.init_conv(ks[2], 128, 128, 3, bn=True),
        conv_2=L.init_conv(ks[3], 128, 96, 3, bn=True),
        conv2_skip=L.init_conv(ks[4], 96, 32, 1, bias=False, bn=True),
        conv_3=L.init_conv(ks[5], 96, 64, 3, bn=True),
        conv_4=L.init_conv(ks[6], 64, 32, 3, bn=True),
        final=dict(w=L.kaiming_conv(ks[7], final_out, 32, 3, 3),
                   b=jnp.zeros((final_out,))),
    )


def residual_decoder(p, x):
    """Returns (features_before_head [b,32,h,w], head_output [b,2,h,w])."""
    x0 = L.conv_block(p["conv_0"], x, relu=False)
    x0r = L.lrelu(x0)
    x2 = L.conv_block(p["conv_2"], L.conv_block(p["conv_1"], x0r),
                      relu=False)
    x2s = x2 + L.conv_block(p["conv0_skip"], x0, padding=0, relu=False)
    x2sr = L.lrelu(x2s)
    x4 = L.conv_block(p["conv_4"], L.conv_block(p["conv_3"], x2sr),
                      relu=False)
    x4s = x4 + L.conv_block(p["conv2_skip"], x2s, padding=0, relu=False)
    xo = L.lrelu(x4s)
    return xo, L.conv2d(p["final"], xo, padding=1)


# --------------------------------------------------- PWC-Net refinement


def init_refinement(key, in_channels):
    ks = jax.random.split(key, 7)
    return dict(
        dc_conv1=L.init_conv(ks[0], in_channels, 128, 3, bn=True),
        dc_conv2=L.init_conv(ks[1], 128, 128, 3, bn=True),
        dc_conv3=L.init_conv(ks[2], 128, 128, 3, bn=True),
        dc_conv4=L.init_conv(ks[3], 128, 96, 3, bn=True),
        dc_conv5=L.init_conv(ks[4], 96, 64, 3, bn=True),
        dc_conv6=L.init_conv(ks[5], 64, 32, 3, bn=True),
        dc_conv7=dict(w=L.kaiming_conv(ks[6], 2, 32, 3, 3),
                      b=jnp.zeros((2,))),
    )


def refinement(p, x):
    """Dilated context network (base_matching_net.py:379-411)."""
    x = L.conv_block(p["dc_conv1"], x, padding=1, dilation=1)
    x = L.conv_block(p["dc_conv2"], x, padding=2, dilation=2)
    x = L.conv_block(p["dc_conv3"], x, padding=4, dilation=4)
    x = L.conv_block(p["dc_conv4"], x, padding=8, dilation=8)
    x = L.conv_block(p["dc_conv5"], x, padding=16, dilation=16)
    x = L.conv_block(p["dc_conv6"], x, padding=1, dilation=1)
    return x, L.conv2d(p["dc_conv7"], x, padding=1)


# --------------------------------------------------- uncertainty heads


def init_mdn_from_corr(key, search_size, output_channels=6, in_channels=1):
    ks = jax.random.split(key, 4)
    return dict(
        conv_0=L.init_conv(ks[0], in_channels, 32, 3, bn=True),
        conv_1=L.init_conv(ks[1], 32, 32, 3, bn=True),
        conv_2=L.init_conv(ks[2], 32, 16, 3, bn=True),
        predict=dict(w=L.kaiming_conv(ks[3], output_channels, 16, 3, 3),
                     b=jnp.zeros((output_channels,))),
    )


def mdn_from_corr(p, corr, search_size):
    """MixtureDensityEstimatorFromCorr (output_all_channels_together=True):
    corr [b, s*s, h, w] -> [b, out_ch, h, w]."""
    s = search_size
    b, ss, h, w = corr.shape
    x = corr.transpose(0, 2, 3, 1).reshape(b * h * w, 1, s, s)
    if s == 16:
        x = L.conv_block(p["conv_0"], x, padding=0)         # 16 -> 14
        x = L.maxpool2(x)                                   # -> 7
        x = L.conv_block(p["conv_1"], x, padding=0)         # -> 5
        x = L.conv_block(p["conv_2"], x, padding=0)         # -> 3
    else:                                                   # s == 9
        x = L.conv_block(p["conv_0"], x, padding=0)         # -> 7
        x = L.conv_block(p["conv_1"], x, padding=0)         # -> 5
        x = L.conv_block(p["conv_2"], x, padding=0)         # -> 3
    u = L.conv2d(p["predict"], x, padding=0)                # -> 1x1
    return u.reshape(b, h, w, -1).transpose(0, 3, 1, 2)


def init_mdn_from_flow(key, in_channels, output_channels=3):
    ks = jax.random.split(key, 3)
    return dict(
        conv_0=L.init_conv(ks[0], in_channels, 32, 3, bn=True),
        conv_1=L.init_conv(ks[1], 32, 16, 3, bn=True),
        predict=dict(w=L.kaiming_conv(ks[2], output_channels, 16, 3, 3),
                     b=jnp.zeros((output_channels,))),
    )


def mdn_from_flow(p, x):
    """MixtureDensityEstimatorFromUncertaintiesAndFlow
    (output_all_channels_together=False, 3 output channels):
    returns (log_var [b,1,h,w], weights [b,2,h,w])."""
    x = L.conv_block(p["conv_1"], L.conv_block(p["conv_0"], x))
    u = L.conv2d(p["predict"], x, padding=1)
    return u[:, 0:1], u[:, 1:]


def constrain_large_log_var_map(var_min, var_max, large_log_var_map):
    """base_pdcnet.py:121-140 (var_min > 0 and var_max > 0 case)."""
    return jnp.log(var_min + (var_max - var_min) *
                   jax.nn.sigmoid(large_log_var_map - jnp.log(var_max)))


def estimate_probability_of_confidence_interval_of_mixture_density(
        weight_map, log_var_map, R=1.0, gaussian=False):
    """P_R of the (Laplace by default) mixture (mod_uncertainty.py:16-34)."""
    proba = jax.nn.softmax(weight_map, axis=1)
    var = jnp.exp(log_var_map)
    if gaussian:
        return jnp.sum(proba * (1 - jnp.exp(-R ** 2 / (2 * var))), axis=1,
                       keepdims=True)
    return jnp.sum(proba * (1 - jnp.exp(-jnp.sqrt(2.0) * R /
                                        jnp.sqrt(var))) ** 2,
                   axis=1, keepdims=True)
