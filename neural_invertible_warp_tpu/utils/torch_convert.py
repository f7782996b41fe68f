"""Convert reference (torch) checkpoints / state_dicts into this framework's
parameter pytrees.

Interop surface: a user coming from the reference implementation
(sfchng/neural_invertible_warp) can load a trained torch checkpoint and
continue / evaluate here. Also the foundation for the round-3 matched-weight
gradient comparison (tools/ref_control/compare_grads.py).

Layouts converted (no torch import required — works on plain numpy
state_dicts; tensors are accepted and `.detach().cpu().numpy()`-ed):
  * NeRF field MLP (reference model/nerf.py:373-402: mlp_feat/mlp_rgb
    ModuleLists; torch Linear weight [out,in] -> ours [in,out])
  * DeformNetwork INN (reference model/nvp/nvp_ndr.py:229-348:
    lin{b}_a_{l} / lin{b}_b_{l} weight-normalized (weight_g [out,1],
    weight_v [out,in]) + plain zero-init output layers + lin{b}_c latent
    projectors)
  * warp latent embedding (torch.nn.Embedding weight [N,D], as-is)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def nerf_params_from_torch(state_dict, prefix=""):
    """mlp_feat.* / mlp_rgb.* -> dict(feat=[{w,b}...], rgb=[{w,b}...])."""
    def layers(name):
        out = []
        i = 0
        while "{}{}.{}.weight".format(prefix, name, i) in state_dict:
            w = _np(state_dict["{}{}.{}.weight".format(prefix, name, i)])
            b = _np(state_dict["{}{}.{}.bias".format(prefix, name, i)])
            out.append(dict(w=jnp.asarray(w.T), b=jnp.asarray(b)))
            i += 1
        if not out:
            raise KeyError("no layers found for {}{}".format(prefix, name))
        return out
    return dict(feat=layers("mlp_feat"), rgb=layers("mlp_rgb"))


def _wn_layer(state_dict, name):
    """weight-normalized torch Linear -> dict(v [in,out], g [out], b)."""
    if name + ".weight_v" in state_dict:           # torch < 2.1 style
        v = _np(state_dict[name + ".weight_v"])
        g = _np(state_dict[name + ".weight_g"])
    else:                                          # parametrizations style
        v = _np(state_dict[name + ".parametrizations.weight.original1"])
        g = _np(state_dict[name + ".parametrizations.weight.original0"])
    b = _np(state_dict[name + ".bias"])
    return dict(v=jnp.asarray(v.T), g=jnp.asarray(g.reshape(-1)),
                b=jnp.asarray(b))


def _plain_layer(state_dict, name):
    return dict(w=jnp.asarray(_np(state_dict[name + ".weight"]).T),
                b=jnp.asarray(_np(state_dict[name + ".bias"])))


def deform_params_from_torch(state_dict, n_blocks=3, n_layers_a=1,
                             prefix=""):
    """DeformNetwork state_dict -> ops.inn.init_deform_params pytree.

    Branch a has n_layers_a weight-normalized hidden layers + a plain
    zero-init output layer; branch b always has exactly one hidden layer
    (reference nvp_ndr.py:300).
    """
    blocks = []
    for i_b in range(n_blocks):
        a = [_wn_layer(state_dict, "{}lin{}_a_{}".format(prefix, i_b, l))
             for l in range(n_layers_a)]
        a.append(_plain_layer(state_dict,
                              "{}lin{}_a_{}".format(prefix, i_b, n_layers_a)))
        b = [_wn_layer(state_dict, "{}lin{}_b_0".format(prefix, i_b)),
             _plain_layer(state_dict, "{}lin{}_b_1".format(prefix, i_b))]
        c_t = _plain_layer(state_dict, "{}lin{}_c".format(prefix, i_b))
        blocks.append(dict(a=a, b=b, c=dict(w=c_t["w"], b=c_t["b"])))
    return dict(blocks=blocks)


def latent_from_torch(state_dict, key="warp_latent.weight", prefix=""):
    return jnp.asarray(_np(state_dict[prefix + key]))


def inn_llff_params_from_torch(graph_state_dict):
    """Full barf_inn_llff Graph state_dict -> this framework's params dict
    (reference graph attributes: nerf.*, warp_mlp.*, warp_latent.*)."""
    params = dict(
        nerf=nerf_params_from_torch(graph_state_dict, prefix="nerf."),
        warp_mlp=deform_params_from_torch(graph_state_dict,
                                          prefix="warp_mlp."),
    )
    if "warp_latent.weight" in graph_state_dict:
        params["warp_latent"] = latent_from_torch(graph_state_dict)
    return params
