"""Convert a reference PDC-Net torch checkpoint (state_dict) into the JAX
parameter pytree of ops/pdcnet (same role as tools/convert_lpips_weights.py
for LPIPS: the architecture is validated on random weights against the
reference network; the real PDCNet_megadepth.pth.tar — unavailable in this
offline environment — converts through this exact mapping).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv(sd, name, bias=True, bn=True):
    """reference `conv()` Sequential: <name>.0 = Conv2d, <name>.1 = BN."""
    p = {"w": jnp.asarray(_np(sd[name + ".0.weight"]))}
    if bias:
        p["b"] = jnp.asarray(_np(sd[name + ".0.bias"]))
    if bn:
        p["bn"] = dict(scale=jnp.asarray(_np(sd[name + ".1.weight"])),
                       bias=jnp.asarray(_np(sd[name + ".1.bias"])),
                       mean=jnp.asarray(_np(sd[name + ".1.running_mean"])),
                       var=jnp.asarray(_np(sd[name + ".1.running_var"])))
    return p


def _plain(sd, name):
    return dict(w=jnp.asarray(_np(sd[name + ".weight"])),
                b=jnp.asarray(_np(sd[name + ".bias"])))


def _residual_decoder(sd, name, final_name):
    return dict(
        conv_0=_conv(sd, name + ".conv_0"),
        conv0_skip=_conv(sd, name + ".conv0_skip", bias=False),
        conv_1=_conv(sd, name + ".conv_1"),
        conv_2=_conv(sd, name + ".conv_2"),
        conv2_skip=_conv(sd, name + ".conv2_skip", bias=False),
        conv_3=_conv(sd, name + ".conv_3"),
        conv_4=_conv(sd, name + ".conv_4"),
        final=_plain(sd, "{}.{}".format(name, final_name)),
    )


def _refinement(sd, prefix):
    p = {}
    for i in range(1, 7):
        p["dc_conv{}".format(i)] = _conv(sd, "{}{}".format(prefix, i))
    p["dc_conv7"] = _plain(sd, prefix + "7")
    return p


def _mdn_corr(sd, name):
    return dict(conv_0=_conv(sd, name + ".conv_0"),
                conv_1=_conv(sd, name + ".conv_1"),
                conv_2=_conv(sd, name + ".conv_2"),
                predict=_plain(sd, name + ".predict_uncertainty"))


def _mdn_flow(sd, name):
    return dict(conv_0=_conv(sd, name + ".conv_0"),
                conv_1=_conv(sd, name + ".conv_1"),
                predict=_plain(sd, name + ".predict_uncertainty_final"))


def _vgg(sd, prefix="pyramid."):
    # level_N Sequentials: conv indices 0[,2[,4]] (relu/pool own no params)
    idxs = [[0], [0], [0, 2], [0, 2, 4], [0, 2, 4]]
    out = []
    for lvl, conv_ids in enumerate(idxs):
        out.append([
            dict(w=jnp.asarray(_np(
                sd["{}level_{}.{}.weight".format(prefix, lvl, ci)])),
                b=jnp.asarray(_np(
                    sd["{}level_{}.{}.bias".format(prefix, lvl, ci)])))
            for ci in conv_ids])
    return out


def _global_gocor(sd, prefix="corr.corr_module."):
    ini = prefix + "filter_initializer."
    opt = prefix + "filter_optimizer."
    return dict(
        target_fg=jnp.asarray(_np(sd[ini + "target_fg"])),
        target_bg=jnp.asarray(_np(sd[ini + "target_bg"])),
        log_step_length=jnp.asarray(_np(sd[opt + "log_step_length"])),
        filter_reg=jnp.asarray(_np(sd[opt + "filter_reg"])),
        label_map_w=jnp.asarray(_np(
            sd[opt + "label_map_predictor.weight"]).reshape(-1)),
        spatial_weight_w=jnp.asarray(_np(
            sd[opt + "spatial_weight_predictor.weight"]).reshape(-1)),
        target_mask_w=jnp.asarray(_np(
            sd[opt + "target_mask_predictor.0.weight"]).reshape(-1)),
        reg_layer=dict(
            weight1=jnp.asarray(_np(sd[opt + "reg_layer.weight1"])),
            weight2=jnp.asarray(_np(sd[opt + "reg_layer.weight2"]))),
    )


def _local_gocor(sd, prefix="local_corr."):
    ini = prefix + "filter_initializer."
    opt = prefix + "filter_optimizer."
    return dict(
        scaling=jnp.asarray(_np(sd[ini + "scaling"])),
        log_step_length=jnp.asarray(_np(sd[opt + "log_step_length"])),
        filter_reg=jnp.asarray(_np(sd[opt + "filter_reg"])),
        label_map_w=jnp.asarray(_np(
            sd[opt + "label_map_predictor.weight"]).reshape(-1)),
        spatial_weight_w=jnp.asarray(_np(
            sd[opt + "spatial_weight_predictor.weight"]).reshape(-1)),
        target_mask_w=jnp.asarray(_np(
            sd[opt + "target_mask_predictor.0.weight"]).reshape(-1)),
    )


def pdcnet_params_from_torch(sd):
    """Full PDCNetModel state_dict -> ops/pdcnet params pytree."""
    return dict(
        pyramid=_vgg(sd),
        global_gocor=_global_gocor(sd),
        local_gocor=_local_gocor(sd),
        decoder4=_residual_decoder(sd, "decoder4", "final"),
        deconv4=_plain(sd, "deconv4"),
        corr_uncertainty_decoder4=_mdn_corr(sd, "corr_uncertainty_decoder4"),
        uncertainty_decoder4=_mdn_flow(sd, "uncertainty_decoder4"),
        decoder3=_residual_decoder(sd, "decoder3", "predict_flow"),
        corr_uncertainty_decoder3=_mdn_corr(sd, "corr_uncertainty_decoder3"),
        uncertainty_decoder3=_mdn_flow(sd, "uncertainty_decoder3"),
        refinement_adaptive=_refinement(sd, "dc_conv"),
        decoder2=_residual_decoder(sd, "decoder2", "predict_flow"),
        corr_uncertainty_decoder2=_mdn_corr(sd, "corr_uncertainty_decoder2"),
        uncertainty_decoder2=_mdn_flow(sd, "uncertainty_decoder2"),
        upfeat2=_plain(sd, "upfeat2"),
        deconv2=_plain(sd, "deconv2"),
        decoder1=_residual_decoder(sd, "decoder1", "predict_flow"),
        corr_uncertainty_decoder1=_mdn_corr(sd, "corr_uncertainty_decoder1"),
        uncertainty_decoder1=_mdn_flow(sd, "uncertainty_decoder1"),
        refinement_final=_refinement(sd, "l_dc_conv"),
    )


def load_pdcnet_checkpoint(path):
    """Load PDCNet_megadepth.pth.tar (torch checkpoint) -> params."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return pdcnet_params_from_torch(sd)
