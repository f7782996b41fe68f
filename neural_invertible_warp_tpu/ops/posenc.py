"""Positional encodings: plain NeRF PE, BARF coarse-to-fine mask, and the
Nerfies-style annealed embedder used by the invertible warp.

Layout parity:
* ``positional_encoding`` matches reference model/nerf.py:476-483 — per input
  dim d the output is [sin(f_0 x_d)..sin(f_{L-1} x_d), cos(f_0 x_d)..cos(...)],
  flattened to [..., 2*D*L]; frequencies f_k = 2^k * pi.
* ``barf_c2f_weights`` matches model/barf.py:256-268.
* ``annealed_embed`` matches model/nvp/embedder.py:41-50 — output layout is
  [x, sin(f_0 x), cos(f_0 x), ..., sin(f_{L-1} x), cos(f_{L-1} x)] with a
  cosine-easing window per frequency driven by ``alpha_ratio``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encoding(x, L):
    """[...,D] -> [...,2*D*L] sin/cos encoding (no identity term)."""
    freq = (2.0 ** jnp.arange(L, dtype=x.dtype)) * jnp.pi          # [L]
    spectrum = x[..., None] * freq                                 # [...,D,L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)  # [...,D,2,L]
    return enc.reshape(x.shape[:-1] + (-1,))


def barf_c2f_weights(progress, L, c2f, dtype=jnp.float32):
    """Per-frequency weights for the BARF coarse-to-fine schedule.

    weight_k = (1 - cos(pi * clamp(alpha - k, 0, 1))) / 2 with
    alpha = (progress - start) / (end - start) * L.
    """
    start, end = c2f
    alpha = (progress - start) / (end - start) * L
    k = jnp.arange(L, dtype=dtype)
    return (1 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * np.pi)) / 2


def positional_encoding_c2f(x, L, progress=None, c2f=None):
    """PE with optional BARF c2f masking. Returns [...,2*D*L]."""
    freq = (2.0 ** jnp.arange(L, dtype=x.dtype)) * jnp.pi
    spectrum = x[..., None] * freq                                 # [...,D,L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)  # [...,D,2,L]
    if c2f is not None:
        w = barf_c2f_weights(progress, L, c2f, dtype=x.dtype)      # [L]
        enc = enc * w                                              # broadcast over last axis
    return enc.reshape(x.shape[:-1] + (-1,))


def annealed_embed_dim(multires, input_dims):
    """Output width of ``annealed_embed`` (include_input + sin/cos per freq)."""
    return input_dims * (1 + 2 * multires)


def annealed_embed_reference(x, multires, alpha_ratio):
    """BUG-FOR-BUG parity mode of the INN's annealed PE.

    The reference's Embedder.embed (model/nvp/embedder.py:44-50) writes
    ``output[:, slice] *= w`` intending to window frequency-band COLUMNS —
    but the network calls it with 4-D ``(B, N, 1, d)`` inputs
    (model/nvp/nvp_ndr.py:415,432 via input_pts.unsqueeze(2)), so the slice
    indexes the POINT axis: point rows (2i+1)*d .. (2i+3)*d have their
    ENTIRE feature vector (identity passthrough included) scaled by the
    band-i window, and every other point gets full-frequency PE from step 0.
    The coarse-to-fine anneal the paper describes never actually runs; what
    runs is a weak early-training damping of ~24 fixed row indices (fresh
    random rays each step). Discovered via the round-3 matched-weight
    control runs (tools/ref_control/): the torch reference RECOVERS poses on
    scenes where the intended band-windowing attractors, and the behavioral
    difference bisects to exactly this (EVIDENCE_r3.md).

    x: [B, N, d] -> [B, N, d*(1+2L)], scaling point rows of the N axis.
    """
    D = x.shape[-1]
    N = x.shape[-2]
    full = annealed_embed(x, multires, 1.0)        # unwindowed embed
    i = jnp.arange(multires, dtype=x.dtype)
    w = (1 - jnp.cos(np.pi * jnp.clip(alpha_ratio * multires - i,
                                      0.0, 1.0))) * 0.5          # [L]
    # row r is scaled by w[i] iff (2i+1)*D <= r < (2i+3)*D (torch slicing
    # clips out-of-range rows; the per-band slices are disjoint)
    row_w = jnp.ones((N,), x.dtype)
    rows = jnp.arange(N)
    for b in range(multires):
        lo, hi = (2 * b + 1) * D, (2 * b + 3) * D
        in_band = (rows >= lo) & (rows < hi)
        row_w = row_w * jnp.where(in_band, w[b], 1.0)
    return full * row_w[:, None]


def annealed_embed(x, multires, alpha_ratio):
    """Nerfies-windowed PE used inside the INN warp. [...,D] -> [...,D*(1+2L)].

    alpha_ratio=0 masks all frequency bands (identity-ish), 1 enables all.
    Frequencies are 2^linspace(0, multires-1, multires) * pi.
    """
    D = x.shape[-1]
    freqs = (2.0 ** jnp.linspace(0.0, multires - 1, multires).astype(x.dtype)) * jnp.pi  # [L]
    spectrum = x[..., None, :] * freqs[:, None]                    # [...,L,D]
    sin = jnp.sin(spectrum)
    cos = jnp.cos(spectrum)
    # window per frequency band i
    i = jnp.arange(multires, dtype=x.dtype)
    w = (1 - jnp.cos(np.pi * jnp.clip(alpha_ratio * multires - i, 0.0, 1.0))) * 0.5  # [L]
    sin = sin * w[:, None]
    cos = cos * w[:, None]
    bands = jnp.stack([sin, cos], axis=-2)                         # [...,L,2,D]
    bands = bands.reshape(x.shape[:-1] + (2 * multires * D,))
    return jnp.concatenate([x, bands], axis=-1)
