"""PDC-Net dense matcher in JAX — the 'PDCNet' (megadepth) configuration the
reference uses for real-image pose initialization
(utils/colmap_initialization/pdcnet_for_hloc.py:154-494; model built in
third_party/DenseMatching/model_selection.py:144-161).

Two-net coarse-to-fine architecture (GLU-Net layout,
models/PDCNet/PDCNet.py):
  L-Net (256x256 input): level 4 — GlobalGOCor 16x16 correlation ->
    CMDTop-residual mapping decoder -> flow4; level 3 (32x32) — LocalGOCor
    -> OFE-residual flow decoder + adaptive-reso PWC refinement -> flow3.
  H-Net (original resolution): levels 2 (1/8) and 1 (1/4) — LocalGOCor ->
    OFE-residual decoders, upfeat from level 2, final PWC refinement.
Each level also carries a mixture-density uncertainty estimate
(corr-based MDN + flow-based MDN -> constrained log-variance + weights),
combined at inference into the confidence P_R of a Laplace mixture.

Config constants (PDCNet megadepth): global GOCor with flexible
context-aware initializer + query loss (3 iters), local GOCor simple
initializer (3 iters), normalize='leakyrelu', two-mode mixture with
var_1=1, var_2 in [2, 520^2] ([2, 256^2] for the L-Net), Laplace.

Inference-only: gradients are never taken through the matcher.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..correlation import local_correlation
from . import blocks as B
from . import gocor as G
from . import layers as L
from . import vgg

MD = 4                       # local search radius -> 9x9 windows
VAR_1 = 1.0
VAR_2_MINUS = 2.0
VAR_2_PLUS = 520.0 ** 2
VAR_2_PLUS_256 = 256.0 ** 2


def init_pdcnet_params(key):
    ks = iter(jax.random.split(key, 24))
    corr_dim = (2 * MD + 1) ** 2
    p = dict(
        pyramid=vgg.init_vgg_params(next(ks)),
        global_gocor=G.init_global_gocor(next(ks)),
        local_gocor=G.init_local_gocor(next(ks)),
        # level 4 (16x16 global)
        decoder4=B.init_residual_decoder(next(ks), 16 * 16 + 2),
        deconv4=dict(w=L.bilinear_deconv_kernel(2), b=jnp.zeros((2,))),
        corr_uncertainty_decoder4=B.init_mdn_from_corr(next(ks), 16, 6),
        uncertainty_decoder4=B.init_mdn_from_flow(next(ks), 6 + 32, 3),
        # level 3 (32x32 local)
        decoder3=B.init_residual_decoder(next(ks), corr_dim + 4 + 2),
        corr_uncertainty_decoder3=B.init_mdn_from_corr(next(ks), 9, 6),
        uncertainty_decoder3=B.init_mdn_from_flow(next(ks), 6 + 32 + 2 + 4,
                                                  3),
        refinement_adaptive=B.init_refinement(next(ks), 32 + 2),
        # level 2 (1/8)
        decoder2=B.init_residual_decoder(next(ks), corr_dim + 4 + 2),
        corr_uncertainty_decoder2=B.init_mdn_from_corr(next(ks), 9, 6),
        uncertainty_decoder2=B.init_mdn_from_flow(next(ks), 6 + 32 + 2 + 4,
                                                  3),
        upfeat2=dict(w=L.kaiming_conv(next(ks), 32, 2, 4, 4),  # IOHW
                     b=jnp.zeros((2,))),
        deconv2=dict(w=L.bilinear_deconv_kernel(2), b=jnp.zeros((2,))),
        # level 1 (1/4)
        decoder1=B.init_residual_decoder(next(ks), corr_dim + 4 + 2 + 2),
        corr_uncertainty_decoder1=B.init_mdn_from_corr(next(ks), 9, 6),
        uncertainty_decoder1=B.init_mdn_from_flow(next(ks), 6 + 32 + 2 + 4,
                                                  3),
        refinement_final=B.init_refinement(next(ks), 32 + 2),
    )
    return p


def _global_corr(params, c14, c24):
    """get_global_correlation with GOCor + normalize='leakyrelu'
    (base_matching_net.py:829-878): L2-normalized features in, leaky relu
    on the cost volume out."""
    corr = G.global_gocor(params["global_gocor"], L.l2norm_channel(c14),
                          L.l2norm_channel(c24))
    return L.lrelu(corr)


def _local_corr(params, c_t, c_s_warped):
    corr = G.local_gocor(params["local_gocor"], c_t, c_s_warped)
    return L.lrelu(corr)


def _plain_global_corr(c_t, c_s):
    """use_global_corr_layer (base_pdcnet.py:84-103): plain feature
    correlation of L2-normed features, relu + L2 norm over channel."""
    b, d, H, W = c_t.shape
    tn = L.l2norm_channel(c_t).reshape(b, d, H * W)
    sn = L.l2norm_channel(c_s).reshape(b, d, H * W)
    # GlobalFeatureCorrelationLayer(shape='3D'): source positions in channels
    corr = jnp.einsum("bds,bdt->bst", sn, tn).reshape(b, H * W, H, W)
    return L.l2norm_channel(jax.nn.relu(corr))


def _plain_local_corr(c_t, c_s):
    """use_local_corr_layer: PWC-style local correlation + leaky relu."""
    return L.lrelu(local_correlation(c_t, c_s, max_displacement=MD))


def _uncertainty_at_level(params, lvl, corr_for_unc, x_layer, up_flow,
                          up_unc, search_size, var_max):
    """estimate_uncertainty_components + variance constraint for one level.
    Returns (log_var_map [b,2,h,w], weight_map [b,2,h,w])."""
    corr_unc = B.mdn_from_corr(params["corr_uncertainty_decoder" + lvl],
                               corr_for_unc, search_size)
    if up_flow is None:
        inp = jnp.concatenate([corr_unc, x_layer], axis=1)
    else:
        inp = jnp.concatenate([corr_unc, x_layer, up_unc, up_flow], axis=1)
    large_log_var, weight = B.mdn_from_flow(
        params["uncertainty_decoder" + lvl], inp)
    large_log_var = B.constrain_large_log_var_map(VAR_2_MINUS, var_max,
                                                  large_log_var)
    small = jnp.full_like(large_log_var, math.log(VAR_1))
    return jnp.concatenate([small, large_log_var], axis=1), weight


def pdcnet_forward(params, im_target, im_source, im_target_256,
                   im_source_256, debug=None):
    """Full two-net forward (PDCNet.py:481-657). Images imagenet-normalized,
    NCHW; original-res H,W divisible by 8. Returns (output_256, output)
    dicts with flow and (log_var, weight) per level."""
    b, _, h_original, w_original = im_target.shape
    h_256, w_256 = im_target_256.shape[-2:]

    pyr_t = vgg.vgg_eighth(params["pyramid"], im_target)
    pyr_s = vgg.vgg_eighth(params["pyramid"], im_source)
    c11, c12 = pyr_t[-2], pyr_t[-1]
    c21, c22 = pyr_s[-2], pyr_s[-1]
    pyr_t256 = vgg.vgg_pyramid(params["pyramid"], im_target_256)
    pyr_s256 = vgg.vgg_pyramid(params["pyramid"], im_source_256)
    c13, c14 = pyr_t256[-2], pyr_t256[-1]
    c23, c24 = pyr_s256[-2], pyr_s256[-1]
    if debug is not None:
        debug.update(c11=c11, c12=c12, c21=c21, c22=c22)

    # ---------------- level 4 (global, 16x16)
    corr4 = _global_corr(params, c14, c24)
    init_map = jnp.zeros((b, 2, corr4.shape[2], corr4.shape[3]))
    x4, est_map4 = B.residual_decoder(
        params["decoder4"], jnp.concatenate([corr4, init_map], axis=1))
    flow4 = L.unnormalise_and_convert_mapping_to_flow(est_map4)
    ratio_x = 16.0 / float(w_256)
    ratio_y = 16.0 / float(h_256)
    flow4 = jnp.stack([flow4[:, 0] / ratio_x, flow4[:, 1] / ratio_y], axis=1)

    corr4_unc = _plain_global_corr(c14, c24)
    log_var4, weight4 = _uncertainty_at_level(
        params, "4", corr4_unc, x4, None, None, 16, VAR_2_PLUS_256)

    up_flow4 = L.deconv2d(params["deconv4"], flow4)         # -> 32x32
    up_lv4 = L.interp_bilinear(log_var4[:, 1:2], (32, 32))
    up_lv4 = jnp.concatenate([jnp.full_like(up_lv4, math.log(VAR_1)),
                              up_lv4], axis=1)
    up_w4 = L.interp_bilinear(weight4, (32, 32))
    up_unc4 = jnp.concatenate([up_lv4, up_w4], axis=1)      # [b,4,32,32]

    # ---------------- level 3 (local, 32x32)
    def flow_level(lvl, c_t, c_s, up_flow, up_unc, ratio, var_max,
                   up_feat=None, refine_key=None):
        flow_scaled = jnp.stack([up_flow[:, 0] * ratio,
                                 up_flow[:, 1] * ratio], axis=1)
        c_s_warped = L.warp(c_s, flow_scaled)
        corr = _local_corr(params, c_t, c_s_warped)
        if debug is not None:
            debug["warped" + lvl] = c_s_warped
            debug["corr" + lvl] = corr
            debug["upflow" + lvl] = up_flow
            debug["upunc" + lvl] = up_unc
        pieces = [corr, up_flow]
        if up_feat is not None:
            pieces.append(up_feat)
        pieces.append(up_unc)
        x, res_flow = B.residual_decoder(params["decoder" + lvl],
                                         jnp.concatenate(pieces, axis=1))
        x_ = jnp.zeros_like(x)
        if refine_key is not None:
            x_, res_flow_ = B.refinement(
                params[refine_key],
                jnp.concatenate([x, res_flow + up_flow], axis=1))
            res_flow = res_flow + res_flow_
        flow = res_flow + up_flow
        corr_unc_in = _plain_local_corr(c_t, c_s_warped)
        log_var, weight = _uncertainty_at_level(
            params, lvl, corr_unc_in, x_ + x, up_flow, up_unc, 9, var_max)
        return x, flow, log_var, weight

    x3, flow3, log_var3, weight3 = flow_level(
        "3", c13, c23, up_flow4, up_unc4, 32.0 / float(w_256),
        VAR_2_PLUS_256, refine_key="refinement_adaptive")

    # ---------------- upscale to H-Net (1/8 of original)
    h8, w8 = h_original // 8, w_original // 8
    up_flow3 = L.interp_bilinear(flow3, (h8, w8))
    up_flow3 = jnp.stack(
        [up_flow3[:, 0] * float(w_original) / float(w_256),
         up_flow3[:, 1] * float(h_original) / float(h_256)], axis=1)
    up_lv3 = L.interp_bilinear(log_var3[:, 1:2], (h8, w8))
    up_lv3 = jnp.concatenate([jnp.full_like(up_lv3, math.log(VAR_1)),
                              up_lv3], axis=1)
    up_w3 = L.interp_bilinear(weight3, (h8, w8))
    up_unc3 = jnp.concatenate([up_lv3, up_w3], axis=1)

    # ---------------- level 2 (local, 1/8)
    x2, flow2, log_var2, weight2 = flow_level(
        "2", c12, c22, up_flow3, up_unc3, 1.0 / 8.0, VAR_2_PLUS)

    h4, w4_ = h_original // 4, w_original // 4
    up_flow2 = L.deconv2d(params["deconv2"], flow2)
    up_feat2 = L.deconv2d(params["upfeat2"], x2)
    up_lv2 = L.interp_bilinear(log_var2[:, 1:2], (h4, w4_))
    up_lv2 = jnp.concatenate([jnp.full_like(up_lv2, math.log(VAR_1)),
                              up_lv2], axis=1)
    up_w2 = L.interp_bilinear(weight2, (h4, w4_))
    up_unc2 = jnp.concatenate([up_lv2, up_w2], axis=1)

    # ---------------- level 1 (local, 1/4)
    x1, flow1, log_var1, weight1 = flow_level(
        "1", c11, c21, up_flow2, up_unc2, 1.0 / 4.0, VAR_2_PLUS,
        up_feat=up_feat2, refine_key="refinement_final")

    output_256 = dict(flow_estimates=[flow4, flow3],
                      uncertainty_estimates=[(log_var4, weight4),
                                             (log_var3, weight3)])
    output = dict(flow_estimates=[flow2, flow1],
                  uncertainty_estimates=[(log_var2, weight2),
                                         (log_var1, weight1)])
    return output_256, output


# ------------------------------------------------------------- inference


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pre_process_data(source_img, target_img):
    """pre_process_image_pair_glunet (base_matching_net.py:75-145):
    [B,3,H,W] uint-range arrays -> (src, tgt, src_256, tgt_256, rx, ry)."""
    b, _, h, w = target_img.shape
    h2 = 256 if h < 256 else int(math.floor(h / 8.0) * 8)
    w2 = 256 if w < 256 else int(math.floor(w / 8.0) * 8)

    def norm(x):
        x = x / 255.0
        return (x - IMAGENET_MEAN[None, :, None, None]) / \
            IMAGENET_STD[None, :, None, None]

    src = norm(L.interp_area(source_img, (h2, w2)))
    tgt = norm(L.interp_area(target_img, (h2, w2)))
    src256 = norm(L.interp_area(source_img, (256, 256)))
    tgt256 = norm(L.interp_area(target_img, (256, 256)))
    return src, tgt, src256, tgt256, float(w) / w2, float(h) / h2


def estimate_flow_and_confidence_map(params, source_img, target_img,
                                     scaling=0.25, R=1.0):
    """Direct single-pass inference (base_pdcnet.py:645-757): flow (target
    -> source) and P_R confidence at `scaling` x target resolution."""
    b, _, h, w = target_img.shape
    output_shape = (int(h * scaling), int(w * scaling))
    src, tgt, src256, tgt256, rx, ry = pre_process_data(source_img,
                                                        target_img)
    rx *= float(output_shape[1]) / float(w)
    ry *= float(output_shape[0]) / float(h)
    _, output = pdcnet_forward(params, tgt, src, tgt256, src256)
    flow = L.interp_bilinear(output["flow_estimates"][-1], output_shape)
    flow = jnp.stack([flow[:, 0] * rx, flow[:, 1] * ry], axis=1)
    log_var, weight = output["uncertainty_estimates"][-1]
    log_var = L.interp_bilinear(log_var, output_shape)
    weight = L.interp_bilinear(weight, output_shape)
    p_r = B.estimate_probability_of_confidence_interval_of_mixture_density(
        weight, log_var, R=R, gaussian=False)
    return flow, p_r


def matches_from_flow_and_confidence(flow, p_r, target_hw, min_confidence,
                                     min_number_of_pts=0):
    """get_matches_and_confidence (base_pdcnet.py:518-570): mask
    proba_interval_1_above_X, discard mappings outside the source, rescale
    keypoints to original resolution, sort by confidence."""
    fl = np.asarray(flow)[0]                                # [2,h,w]
    pr = np.asarray(p_r)[0, 0]
    h, w = pr.shape
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    map_x = xx + fl[0]
    map_y = yy + fl[1]
    mask = (pr >= min_confidence) & (map_x >= 0) & (map_y >= 0) & \
        (map_x <= w - 1) & (map_y <= h - 1)
    scale_y = float(target_hw[0]) / h
    scale_x = float(target_hw[1]) / w
    kp_t = np.stack([xx[mask] * scale_x, yy[mask] * scale_y], axis=-1)
    kp_s = np.stack([map_x[mask] * scale_x, map_y[mask] * scale_y], axis=-1)
    conf = pr[mask]
    order = np.argsort(-conf)
    kp_s, kp_t, conf = kp_s[order], kp_t[order], conf[order]
    if len(kp_s) < min_number_of_pts:
        return (np.empty((0, 2), np.float32), np.empty((0, 2), np.float32),
                np.empty((0,), np.float32))
    return kp_s.astype(np.float32), kp_t.astype(np.float32), \
        conf.astype(np.float32)
