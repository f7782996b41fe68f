"""Local correlation (cost volume) — TPU-native replacement for the
reference's only CUDA kernel.

The reference JIT-compiles CUDA through CuPy for PDC-Net's 9x9-neighborhood
local correlation (third_party/DenseMatching/.../correlation.py:16-280), used
only by the optional COLMAP pose-initialization path, inference-only
(SURVEY.md §2.2). Here it is expressed as 81 shifted elementwise
multiply-reduce passes that XLA fuses into one pass over the feature maps —
a memory-bound stencil that maps cleanly onto the VPU without a custom kernel;
gradients come for free (the reference needed hand-written backward kernels).
"""

from __future__ import annotations

import jax.numpy as jnp


def local_correlation(f1, f2, max_displacement=4):
    """Cost volume between two feature maps.

    out[b, d, y, x] = mean_c f1[b,c,y,x] * f2[b,c,y+dy,x+dx]
    for all displacements (dy,dx) in [-md, md]^2, d = (dy+md)*(2md+1)+(dx+md).

    Args:
        f1, f2: [B,C,H,W] feature maps.
    Returns:
        [B,(2md+1)^2,H,W] correlation volume (zero where the shifted window
        leaves the image, matching the reference's zero padding).
    """
    B, C, H, W = f1.shape
    md = max_displacement
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = f2p[:, :, md + dy:md + dy + H, md + dx:md + dx + W]
            outs.append(jnp.mean(f1 * shifted, axis=1))
    return jnp.stack(outs, axis=1)
