"""GOCor correlation modules in JAX (reference
third_party/DenseMatching/third_party/GOCor/GOCor/{global_gocor,
global_corr_initializer,local_gocor,distance,activation,fourdim}.py).

GOCor replaces the feature-correlation layer with a small inner optimization:
a per-position filter map is initialized from the reference features and
refined by `optim_iter` steepest-descent steps on a learned robust objective
(reference loss L_r with learned distance-based target/weight functions,
plus for the global module a 4D-conv-regularized query loss L_q), then
correlated with the query features. filter_size=1 throughout (the only case
the reference supports), which reduces every filter application to a batched
matmul — ideal MXU shapes.

The steepest-descent loop is a static Python loop (3 iterations) under jit;
the filter-gradient transposes are exact adjoints computed via jax.vjp of
the corresponding correlation, which is what the reference's hand-written
CUDA transpose kernels implement.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..correlation import local_correlation
from . import layers as L


# ----------------------------------------------------------- distance map


def distance_bins(center_yx, out_hw, num_bins, bin_displacement):
    """Soft histogram of euclidean distance from center, per pixel
    (GOCor/distance.py): triangular bins, last bin clamped."""
    k0 = jnp.arange(out_hw[0], dtype=jnp.float32)[:, None]
    k1 = jnp.arange(out_hw[1], dtype=jnp.float32)[None, :]
    d0 = k0 - center_yx[0]
    d1 = k1 - center_yx[1]
    dist = jnp.sqrt(d0 * d0 + d1 * d1)                      # [H,W]
    bc = jnp.arange(num_bins, dtype=jnp.float32)[:, None, None]
    bin_diff = dist[None] / bin_displacement - bc           # [bins,H,W]
    main = jax.nn.relu(1.0 - jnp.abs(bin_diff[:-1]))
    last = jnp.clip(1.0 + bin_diff[-1:], 0.0, 1.0)
    return jnp.concatenate([main, last], axis=0)            # [bins,H,W]


def apply_bin_weights(w, bins):
    """1x1 conv over the bin axis: w [bins] -> scalar map."""
    return jnp.einsum("b,bhw->hw", w, bins)


def leaky_relu_par(x, a):
    return (1.0 - a) / 2.0 * jnp.abs(x) + (1.0 + a) / 2.0 * x


def leaky_relu_par_deriv(x, a):
    return (1.0 - a) / 2.0 * jnp.sign(x) + (1.0 + a) / 2.0


# ----------------------------------------------------------- 4D regularizer


def init_separable_conv4d(key, kernel_size=3, inter_dim=16, output_dim=16):
    k1, k2 = jax.random.split(key)
    shape1 = (inter_dim, 1, kernel_size, kernel_size)
    shape2 = (output_dim, inter_dim, kernel_size, kernel_size)
    return dict(weight1=jax.random.normal(k1, shape1) * 1e-3,
                weight2=jax.random.normal(k2, shape2) * 1e-3)


def separable_conv4d(p, x):
    """x: [b, H2, W2, H1, W1] -> [b, H1, W1, out_dim, H2, W2]
    (permute_back_output=False as PDC-Net uses it; GOCor/fourdim.py)."""
    b, H2, W2, H1, W1 = x.shape
    inter = p["weight1"].shape[0]
    out_dim = p["weight2"].shape[0]
    x2 = L.conv2d({"w": p["weight1"]}, x.reshape(-1, 1, H1, W1), padding=1)
    x2 = x2.reshape(b, H2 * W2, inter, H1 * W1).transpose(0, 3, 2, 1)
    x3 = L.conv2d({"w": p["weight2"]}, x2.reshape(-1, inter, H2, W2),
                  padding=1)
    return x3.reshape(b, H1, W1, out_dim, H2, W2)


def separable_conv4d_t(p, x):
    """Transpose of separable_conv4d: [b,H1,W1,out,H2,W2] -> [b,H2,W2,H1,W1]."""
    b, H1, W1, out_dim, H2, W2 = x.shape
    inter = p["weight1"].shape[0]

    def conv_t(w, inp):
        # adjoint of conv2d(w OIHW, pad 1): flipped kernel read as IOHW
        return jax.lax.conv_general_dilated(
            inp, w[:, :, ::-1, ::-1], window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "IOHW", "NCHW"))

    x2 = conv_t(p["weight2"], x.reshape(-1, out_dim, H2, W2))
    x2 = x2.reshape(b, H1 * W1, inter, H2 * W2).transpose(0, 3, 2, 1)
    x3 = conv_t(p["weight1"], x2.reshape(-1, inter, H1, W1))
    return x3.reshape(b, H2, W2, H1, W1)


# ----------------------------------------------------------- global GOCor


def init_global_gocor(key, num_features=512, num_dist_bins=10,
                      init_gauss_sigma=1.0, v_minus_init_factor=4.0,
                      init_step_length=1.0, init_filter_reg=1e-2,
                      reg_inter_dim=16, reg_output_dim=16):
    """GlobalGOCorWithFlexibleContextAwareInitializer + GlobalGOCorOpt params
    (PDCNet config: apply_query_loss=True, train_label_map=False)."""
    import numpy as np
    d = np.arange(num_dist_bins, dtype=np.float32) * 0.5    # bin_displacement
    init_gauss = np.exp(-0.5 * (d / init_gauss_sigma) ** 2)
    k_reg, = jax.random.split(key, 1)
    return dict(
        target_fg=jnp.ones((num_features,)),
        target_bg=jnp.zeros((num_features,)),
        log_step_length=jnp.full((1,), math.log(init_step_length)),
        filter_reg=jnp.full((1,), init_filter_reg),
        label_map_w=jnp.asarray(init_gauss - init_gauss.min()),
        spatial_weight_w=jnp.ones((num_dist_bins,)),
        target_mask_w=jnp.asarray(v_minus_init_factor * np.tanh(2.0 - d)),
        reg_layer=init_separable_conv4d(k_reg, 3, reg_inter_dim,
                                        reg_output_dim),
    )


def _flexible_context_aware_init(p, ref):
    """GlobalCorrFlexibleContextAwareInitializer (filter_size=1).
    ref: [b,d,H,W] -> filters [b,HW,d]."""
    b, d, H, W = ref.shape
    f = ref.reshape(b, d, H * W)                            # == unfold(k=1)
    bg = f.mean(axis=2, keepdims=True)
    ff = (f * f).sum(axis=1, keepdims=True)
    bb = (bg * bg).sum(axis=1, keepdims=True)
    fb = (f * bg).sum(axis=1, keepdims=True)
    den = jnp.clip(ff * bb - fb * fb, 1e-6, None)
    tfg = p["target_fg"][None, :, None]
    tbg = p["target_bg"][None, :, None]
    fg_scale = tfg * bb - tbg * fb
    bg_scale = tfg * fb - tbg * ff
    w = (fg_scale * f - bg_scale * bg) / den                # [b,d,HW]
    return w.transpose(0, 2, 1)                             # [b,HW,d]


def _unfolded_map(values_2h1, H, W):
    """reference _unfold_map: from a (2H-1, 2W-1) center-anchored map, the
    (H,W) window aligned to each filter position p=(i,j):
    out[p, y, x] = full[H-1 + y - i, W-1 + x - j]."""
    ii = jnp.arange(H)
    jj = jnp.arange(W)
    yy = jnp.arange(H)
    xx = jnp.arange(W)
    r = (H - 1) + yy[None, :, None, None] - ii[:, None, None, None]
    c = (W - 1) + xx[None, None, None, :] - jj[None, None, :, None]
    out = values_2h1[r, c]                                  # [H,H? ...]
    # axes: (i, y, j, x) -> (i, j, y, x) -> [HW, H, W]
    return out.transpose(0, 2, 1, 3).reshape(H * W, H, W)


def global_gocor(p, ref, query, num_iter=3, steplength_reg=0.1,
                 min_filter_reg=1e-5, num_dist_bins=10, bin_displacement=0.5):
    """GlobalGOCor forward: ref/query [b,d,H,W] (same H,W) ->
    scores [b, H2*W2, H, W] (query positions in channel dim)."""
    b, d, H, W = ref.shape
    filt = _flexible_context_aware_init(p, ref)             # [b,HW,d]

    dist_hw = (2 * H - 1, 2 * W - 1)
    bins = distance_bins((dist_hw[0] // 2, dist_hw[1] // 2), dist_hw,
                         num_dist_bins, bin_displacement)
    target_full = apply_bin_weights(p["label_map_w"], bins)
    vplus_full = apply_bin_weights(p["spatial_weight_w"], bins)
    wm_full = jax.nn.sigmoid(apply_bin_weights(p["target_mask_w"], bins))
    target_map = _unfolded_map(target_full, H, W)[None]     # [1,HW,H,W]
    v_plus = _unfolded_map(vplus_full, H, W)[None]
    weight_m = _unfolded_map(wm_full, H, W)[None]

    step_length = jnp.exp(p["log_step_length"])
    reg_weight = jnp.clip(p["filter_reg"] ** 2, min_filter_reg ** 2, None)

    ref_flat = ref.reshape(b, d, H * W)                     # [b,d,HW]
    query_flat = query.reshape(b, d, H * W)

    def apply_filter(f, feat_flat):
        # [b,HW,d] @ [b,d,HW2] -> [b,HW,HW2] -> [b,HW,H,W]
        return jnp.einsum("bnd,bdm->bnm", f, feat_flat).reshape(b, -1, H, W)

    def apply_feat_transpose(feat_flat, scores):
        # adjoint of apply_filter w.r.t. f
        s = scores.reshape(b, -1, H * W)
        return jnp.einsum("bnm,bdm->bnd", s, feat_flat)

    for _ in range(num_iter):
        scores_ref = apply_filter(filt, ref_flat)           # [b,HW,H,W]
        act = v_plus * leaky_relu_par(scores_ref, weight_m)
        dact = v_plus * leaky_relu_par_deriv(scores_ref, weight_m)
        residuals = act - v_plus * target_map
        mapped = dact * residuals
        grad = apply_feat_transpose(ref_flat, mapped)
        grad = grad + reg_weight * filt

        # query loss L_q (apply_query_loss=True in the PDCNet config)
        scores_q = apply_filter(filt, query_flat)
        lq_res = separable_conv4d(p["reg_layer"],
                                  scores_q.reshape(b, H, W, H, W))
        reg_tp = separable_conv4d_t(p["reg_layer"], lq_res).reshape(
            scores_q.shape)
        grad = grad + apply_feat_transpose(query_flat, reg_tp)

        # step length (sums over all filters: apply_query_loss mode)
        sg_ref = apply_filter(grad, ref_flat)
        den_res = dact * sg_ref
        alpha_den = (den_res ** 2).reshape(b, -1).sum(axis=1)
        sg_q = apply_filter(grad, query_flat)
        den_q = separable_conv4d(p["reg_layer"],
                                 sg_q.reshape(b, H, W, H, W))
        alpha_den = alpha_den + (den_q ** 2).reshape(b, -1).sum(axis=1)
        alpha_num = (grad ** 2).reshape(b, -1).sum(axis=1)
        alpha_den = jnp.clip(alpha_den + reg_weight[0] * alpha_num, 1e-8,
                             None)
        alpha_den = alpha_den + steplength_reg * alpha_num
        alpha = alpha_num / alpha_den                       # [b]
        filt = filt - (step_length[0] * alpha)[:, None, None] * grad

    scores = apply_filter(filt, query_flat)                 # [b,HW,H2,W2]
    # put query positions in the channel dimension: [b, H2*W2, H, W]
    scores = scores.reshape(b, H * W, H * W).transpose(0, 2, 1)
    return scores.reshape(b, H * W, H, W)


# ----------------------------------------------------------- local GOCor


def init_local_gocor(key, num_dist_bins=10, init_gauss_sigma=1.0,
                     v_minus_init_factor=4.0, init_step_length=1.0,
                     init_filter_reg=1e-2):
    import numpy as np
    d = np.arange(num_dist_bins, dtype=np.float32) * 0.5
    init_gauss = np.exp(-0.5 * (d / init_gauss_sigma) ** 2)
    return dict(
        scaling=jnp.ones((1,)),                              # simple init
        log_step_length=jnp.full((1,), math.log(init_step_length)),
        filter_reg=jnp.full((1,), init_filter_reg),
        label_map_w=jnp.asarray(init_gauss - init_gauss.min()),
        spatial_weight_w=jnp.ones((num_dist_bins,)),
        target_mask_w=jnp.asarray(v_minus_init_factor * np.tanh(2.0 - d)),
    )


def local_gocor(p, ref, query, num_iter=3, search_size=9,
                min_filter_reg=1e-5, num_dist_bins=10, bin_displacement=0.5):
    """LocalGOCor with SimpleInitializer: ref/query [b,d,H,W] ->
    scores [b, search_size^2, H, W]."""
    b, d, H, W = ref.shape
    md = search_size // 2
    filt = p["scaling"][0] * ref / ((ref * ref).mean(axis=1,
                                                     keepdims=True) + 1e-6)

    bins = distance_bins((md, md), (search_size, search_size),
                         num_dist_bins, bin_displacement)
    target_map = apply_bin_weights(p["label_map_w"], bins).reshape(
        1, -1, 1, 1)
    v_plus = apply_bin_weights(p["spatial_weight_w"], bins).reshape(
        1, -1, 1, 1)
    weight_m = jax.nn.sigmoid(apply_bin_weights(p["target_mask_w"],
                                                bins)).reshape(1, -1, 1, 1)

    step_length = jnp.exp(p["log_step_length"])
    reg_weight = jnp.clip(p["filter_reg"] ** 2, min_filter_reg ** 2,
                          None) / (d ** 2)

    def corr(f, feat):
        return local_correlation(f, feat, max_displacement=md)

    for _ in range(num_iter):
        scores_ref = corr(filt, ref)                        # [b,81,H,W]
        act = v_plus * leaky_relu_par(scores_ref, weight_m)
        dact = v_plus * leaky_relu_par_deriv(scores_ref, weight_m)
        residuals = act - v_plus * target_map
        mapped = dact * residuals
        # FunctionCorrelationTranspose == exact adjoint wrt the filter map
        _, vjp = jax.vjp(lambda f: corr(f, ref), filt)
        grad = vjp(mapped)[0] + reg_weight * filt

        sg_ref = dact * corr(grad, ref)
        alpha_den = (sg_ref * sg_ref).sum(axis=1, keepdims=True)
        alpha_num = (grad * grad).sum(axis=1, keepdims=True)
        alpha_den = jnp.clip(alpha_den + reg_weight * alpha_num, 1e-8, None)
        alpha = alpha_num / alpha_den
        filt = filt - step_length[0] * alpha * grad

    return corr(filt, query)
