"""VGG-16 feature pyramid (reference
third_party/DenseMatching/models/feature_backbones/VGG_features.py).

Level splits follow the reference's iteration over torchvision vgg16
features (split at the first ReLU, then at every MaxPool):
  level_0: conv1_1+relu              -> full res, 64ch
  level_1: conv1_2+relu+pool         -> 1/2, 64ch
  level_2: conv2_1..relu+pool        -> 1/4, 128ch
  level_3: conv3_1..relu+pool        -> 1/8, 256ch
  level_4: conv4_1..relu+pool        -> 1/16, 512ch
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L

# (level, [(c_in, c_out), ...]) conv stacks; pool after each level >= 1
VGG_LEVELS = [
    [(3, 64)],
    [(64, 64)],
    [(64, 128), (128, 128)],
    [(128, 256), (256, 256), (256, 256)],
    [(256, 512), (512, 512), (512, 512)],
]


def init_vgg_params(key):
    params = []
    for convs in VGG_LEVELS:
        lvl = []
        for c_in, c_out in convs:
            key, sub = jax.random.split(key)
            lvl.append(dict(w=L.kaiming_conv(sub, c_out, c_in, 3, 3),
                            b=jnp.zeros((c_out,))))
        params.append(lvl)
    return params


def vgg_pyramid(params, x, n_levels=5):
    """x: [B,3,H,W] imagenet-normalized. Returns the level outputs."""
    outs = []
    for li in range(n_levels):
        for conv in params[li]:
            x = jax.nn.relu(L.conv2d(conv, x, padding=1))
        if li >= 1:
            x = L.maxpool2(x)
        outs.append(x)
    return outs


def vgg_eighth(params, x):
    """eigth_resolution mode: [full(64ch), quarter(128ch), eighth(256ch)]."""
    outs = vgg_pyramid(params, x, n_levels=4)
    return [outs[0], outs[2], outs[3]]
