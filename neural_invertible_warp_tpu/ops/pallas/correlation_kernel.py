"""Local-correlation cost volume as a Pallas TPU kernel.

Replaces the reference's CuPy-JIT CUDA kernels
(third_party/DenseMatching/.../correlation.py:42-112) for the PDC-Net matcher
(inference-only in the reference — SURVEY.md §2.2, so forward-only here; the
XLA implementation in ops/correlation.py is the differentiable fallback).

One grid step per batch item: both feature maps stay in VMEM and the 81
shifted multiply-reduce passes read them without ever re-touching HBM
(the CUDA version re-reads the rearranged tensor per output pixel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(f1_ref, f2p_ref, out_ref, *, md, H, W):
    f1 = f1_ref[0]            # [C, H, W]
    f2p = f2p_ref[0]          # [C, H+2md, W+2md]
    C = f1.shape[0]
    d = 0
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            window = f2p[:, md + dy:md + dy + H, md + dx:md + dx + W]
            out_ref[0, d] = jnp.sum(f1 * window, axis=0) / C
            d += 1


def local_correlation_pallas(f1, f2, max_displacement=4, interpret=False):
    """[B,C,H,W] x2 -> [B,(2md+1)^2,H,W]; forward-only (stop_gradient)."""
    B, C, H, W = f1.shape
    md = max_displacement
    D = (2 * md + 1) ** 2
    f2p = jnp.pad(f2, ((0, 0), (0, 0), (md, md), (md, md)))
    kernel = functools.partial(_corr_kernel, md=md, H=H, W=W)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, H + 2 * md, W + 2 * md),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, H, W), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W), f1.dtype),
        interpret=interpret,
    )(jax.lax.stop_gradient(f1), jax.lax.stop_gradient(f2p))
    return out
