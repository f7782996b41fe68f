"""Fused PE + NeRF field kernel, round-2 layout rework (NOTES_r1.md item 1).

The round-1 fused field kernel (fused_field.py) still streams the positional
encodings through HBM: [N,64] point PE + [N,32] view PE in, and their
gradients back out — ~100 MB/step of pure glue at the bench workload. The
round-1 full-fusion attempt (raymarch.py) moved PE in-kernel but built it
from [n,1]-wide per-coordinate columns, which fragment in Mosaic (32 ms/step
vs 17 ms).

This kernel keeps PE in-kernel but expresses it on full 64/32-lane tiles:

    pts @ F           one [n,3]@[3,64] MXU matmul against a constant
                      frequency matrix F (identity columns for the raw
                      coords, 2^k*pi scaled columns for the bands), then
    xp = m_id*(pts@F) + w_sin*sin(pts@F) + w_cos*cos(pts@F)

with [1,64] mask/weight rows (the BARF c2f schedule folds into w_sin/w_cos
outside the kernel). Point construction folds into the same matmul:
pts@F = center@F + (ray@F) * depth, so the kernel reads only [R,3] centers,
[R,3] rays and [R,K] depths per block — the per-sample encodings never touch
HBM in either direction. The view encoding is computed per RAY (not per
sample) and broadcast, removing a 128x redundancy the XLA path pays.

Backward recomputes the forward per block (VMEM-resident), reuses the MLP
backward from fused_field, and reduces the PE cotangents over the sample
axis to per-ray [R,3] center/ray gradients. Depth and the mask rows are
non-differentiable inputs (stratified samples are detached by construction;
the wrapper stop-gradients them).

Replaces the reference hot loop model/nerf.py:449-474 (forward_samples) +
positional_encoding (model/nerf.py:476-483).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fused_field as ff

L3D = 10
LVIEW = 4
D_IN = ff.D_IN          # 64
D_VIEW = ff.D_VIEW      # 32

R_BLK = 8               # rays per grid step (n = R_BLK * K points);
                        # Mosaic requires sublane block dims divisible by 8
                        # (r3 sweep: 16 is slower, 32 fails to compile)
MLP_SUB = 512           # backward recompute sub-chunk. VMEM bound: the
                        # 8-layer activation cache is ~3296 cols x SUB x 4B
                        # (6.8 MB at 512); 1024 fails to compile. r3 sweep on
                        # v5e: 512 beats 256 by 0.64 ms fwd+bwd at 2048x128
                        # (fewer chunk-loop iterations, larger matmuls)


def set_ray_block(r_blk):
    global R_BLK
    R_BLK = int(r_blk)


def set_mlp_sub(n):
    global MLP_SUB
    MLP_SUB = int(n)


def _pe_constants(L, d_pad):
    """Constant F [3,d_pad] + id/sin/cos column masks [1,d_pad] for the
    ops.posenc.positional_encoding_c2f layout: [x, per-dim (sin f0..fL-1,
    cos f0..fL-1)]."""
    F = np.zeros((3, d_pad), np.float32)
    m_id = np.zeros((1, d_pad), np.float32)
    sin_sel = np.zeros((1, d_pad), np.float32)
    cos_sel = np.zeros((1, d_pad), np.float32)
    band = np.zeros(d_pad, np.int32)     # frequency index per column
    for c in range(3):
        F[c, c] = 1.0
        m_id[0, c] = 1.0
    for d in range(3):
        for e in range(2 * L):
            j = 3 + d * 2 * L + e
            k = e % L
            # match ops/posenc.py exactly: f32(2^k) * f32(pi) — rounding the
            # f64 product instead is 1 ulp off at high bands
            F[d, j] = np.float32(2.0 ** k) * np.float32(np.pi)
            band[j] = k
            if e < L:
                sin_sel[0, j] = 1.0
            else:
                cos_sel[0, j] = 1.0
    return F, m_id, sin_sel, cos_sel, band


_F3D, _MID3D, _SIN3D, _COS3D, _BAND3D = _pe_constants(L3D, D_IN)
_FV, _MIDV, _SINV, _COSV, _BANDV = _pe_constants(LVIEW, D_VIEW)


def pe_mask_rows(progress, c2f, dtype=jnp.float32):
    """(w_sin3d, w_cos3d, w_sinv, w_cosv) [1,64]/[1,32] rows with the BARF
    c2f weights folded in (ops/posenc.py::barf_c2f_weights)."""
    from .. import posenc as posenc_ops

    def rows(sin_sel, cos_sel, band, L):
        if c2f is None:
            return jnp.asarray(sin_sel), jnp.asarray(cos_sel)
        w = posenc_ops.barf_c2f_weights(progress, L, c2f, dtype=dtype)  # [L]
        wcol = w[band][None]                                  # [1,d_pad]
        return jnp.asarray(sin_sel) * wcol, jnp.asarray(cos_sel) * wcol

    ws3, wc3 = rows(_SIN3D, _COS3D, _BAND3D, L3D)
    wsv, wcv = rows(_SINV, _COSV, _BANDV, LVIEW)
    return ws3, wc3, wsv, wcv


def _encode_block(center, ray, depth, mid3, ws3, wc3, midv, wsv, wcv,
                  F3, Fv):
    """One block's (xp [n,64], vi [n,32]) plus residuals for backward.

    pts are built explicitly ([n,3], two narrow ops) and THEN projected by
    one [n,3]@[3,64] matmul: the one-hot F columns make each output a single
    fp32 product, so values match the jnp reference exactly (the
    algebraically-equal cF + rF*d form reassociates the rounding at high
    frequencies, ~5e-4 relative). The projection runs at HIGHEST precision
    (ff._dot_pe): a DEFAULT bf16 pass here quantizes POSITIONS, which the
    finest c2f bands amplify into O(2pi) phase noise — see fused_field.py::
    _PE_PRECISION for the full story."""
    R, K = depth.shape
    n = R * K
    c3 = jnp.broadcast_to(center[:, None, :], (R, K, 3)).reshape(n, 3)
    r3 = jnp.broadcast_to(ray[:, None, :], (R, K, 3)).reshape(n, 3)
    d3 = jnp.broadcast_to(depth[:, :, None], (R, K, 3)).reshape(n, 3)
    pts = c3 + r3 * d3                                        # [n,3]
    xp_pre = ff._dot_pe(pts, F3)                                 # [n,64]
    xp = mid3 * xp_pre + ws3 * jnp.sin(xp_pre) + wc3 * jnp.cos(xp_pre)

    # per-ray view encoding (reference: ray_unit = ray / clip(|ray|, 1e-12));
    # divide (not reciprocal-multiply) for bit parity with the jnp path
    norm = jnp.sqrt(jnp.sum(ray * ray, axis=1, keepdims=True))
    inv = 1.0 / jnp.maximum(norm, 1e-12)
    ru = ray / jnp.maximum(norm, 1e-12)                       # [R,3]
    vF = ff._dot_pe(ru, Fv)                                      # [R,32]
    vi_r = midv * vF + wsv * jnp.sin(vF) + wcv * jnp.cos(vF)  # [R,32]
    vi = jnp.broadcast_to(vi_r[:, None, :], (R, K, D_VIEW)).reshape(n, D_VIEW)
    return xp, vi, (xp_pre, d3, vF, ru, inv)


def _fwd_pe_kernel(cdt, activ, has_noise, center_ref, ray_ref, depth_ref,
                   mid3_ref, ws3_ref, wc3_ref, midv_ref, wsv_ref, wcv_ref,
                   F3_ref, Fv_ref, *wrefs):
    n_w = len(ff._ORDER)
    w = {name: wrefs[i][:] for i, name in enumerate(ff._ORDER)}
    out_ref = wrefs[-1]
    noise_vec = None
    if has_noise:   # tail: [noise [R,K], I [K,K]] between weights and output
        noise_ref, I_ref = wrefs[n_w], wrefs[n_w + 1]
        R = depth_ref.shape[0]
        noise_vec = _rows_to_cols(I_ref[:], noise_ref[:], R)[:, 0]   # [n]
    xp, vi, _ = _encode_block(center_ref[:], ray_ref[:], depth_ref[:],
                              mid3_ref[:], ws3_ref[:], wc3_ref[:],
                              midv_ref[:], wsv_ref[:], wcv_ref[:],
                              F3_ref[:], Fv_ref[:])
    out, _ = ff._forward_block(xp, vi, w, cdt=cdt, activ=activ,
                               noise=noise_vec)
    out_ref[:] = out


def _bwd_pe_kernel(cdt, activ, has_noise, center_ref, ray_ref, depth_ref,
                   mid3_ref, ws3_ref, wc3_ref, midv_ref, wsv_ref, wcv_ref,
                   F3_ref, Fv_ref, g_ref, *refs):
    w = {name: refs[i][:] for i, name in enumerate(ff._ORDER)}
    n_w = len(ff._ORDER)
    noise_col = None
    if has_noise:   # tail: [noise [R,K], I [K,K]] between weights and outputs
        noise_col = _rows_to_cols(refs[n_w + 1][:], refs[n_w][:],
                                  depth_ref.shape[0])            # [n,1]
        n_w += 2
    dcenter_ref, dray_ref = refs[n_w], refs[n_w + 1]
    dw_refs = {name: refs[n_w + 2 + i] for i, name in enumerate(ff._ORDER)}

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for name in ff._ORDER:
            dw_refs[name][:] = jnp.zeros_like(dw_refs[name])

    def accumulate(name, value):
        dw_refs[name][:] += value

    center, ray, depth = center_ref[:], ray_ref[:], depth_ref[:]
    mid3, ws3, wc3 = mid3_ref[:], ws3_ref[:], wc3_ref[:]
    midv, wsv, wcv = midv_ref[:], wsv_ref[:], wcv_ref[:]
    F3, Fv = F3_ref[:], Fv_ref[:]
    xp, vi, res = _encode_block(center, ray, depth, mid3, ws3, wc3,
                                midv, wsv, wcv, F3, Fv)
    xp_pre, d3, vF, ru, inv = res
    R, K = depth.shape

    # MLP backward in sub-chunks: the per-layer activation cache for the
    # full n = R*K block would not fit VMEM
    n = R * K
    g = g_ref[:]
    sub = min(MLP_SUB, n)
    dxp_parts, dview_parts = [], []
    for s0 in range(0, n, sub):
        noise_s = None if noise_col is None else noise_col[s0:s0 + sub, 0]
        dxp_s, dview_s = ff._mlp_backward(xp[s0:s0 + sub], vi[s0:s0 + sub],
                                          w, g[s0:s0 + sub], accumulate,
                                          cdt=cdt, activ=activ, noise=noise_s)
        dxp_parts.append(dxp_s)
        dview_parts.append(dview_s)
    dxp = jnp.concatenate(dxp_parts, axis=0)
    dview = jnp.concatenate(dview_parts, axis=0)

    # PE backward: xp = m_id*pre + w_sin*sin(pre) + w_cos*cos(pre)
    dxp_pre = (mid3 + ws3 * jnp.cos(xp_pre) - wc3 * jnp.sin(xp_pre)) * dxp
    dpts = ff._dot_nt_pe(dxp_pre, F3)                            # [n,3]
    dcenter = jnp.sum(dpts.reshape(R, K, 3), axis=1)          # [R,3]
    dray = jnp.sum((dpts * d3).reshape(R, K, 3), axis=1)

    # view backward (per-ray): vi_r = m*vF + ws*sin(vF) + wc*cos(vF)
    dvi_r = jnp.sum(dview.reshape(R, K, D_VIEW), axis=1)      # [R,32]
    dvF = (midv + wsv * jnp.cos(vF) - wcv * jnp.sin(vF)) * dvi_r
    dru = ff._dot_nt_pe(dvF, Fv)                                 # [R,3]
    # ru = ray * inv, inv = 1/max(|ray|, 1e-12)
    dray = dray + dru * inv \
        - ru * (jnp.sum(dru * ru, axis=1, keepdims=True) * inv)

    dcenter_ref[:] = dcenter
    dray_ref[:] = dray


def _ray_spec(width, r_blk):
    return pl.BlockSpec((r_blk, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(width):
    return pl.BlockSpec((1, width), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _w_specs():
    return [ff._full_spec(ff._WEIGHT_SHAPES.get(k) or ff._BIAS_SHAPES[k])
            for k in ff._ORDER]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7))
def fused_mlp_pe(center, ray, depth, interpret, compute_dtype, masks,
                 weights, activ="softplus", noise=None):
    """Fused PE + field MLP.

    center/ray: [R,3]; depth: [R,K]; masks: (ws3 [1,64], wc3 [1,64],
    wsv [1,32], wcv [1,32]) — non-differentiable; weights: fused_field
    padded dict. noise: optional [R,K] pre-activation density noise
    (density_noise_reg * randn, generated in XLA — lane-dense per-ray rows,
    cast to the [n,1] point column in-kernel via the identity-dot trick).
    Returns [R*K, 4] (rgb sigmoid, density softplus), sample index = r*K + k.
    R must be a multiple of the ray block.
    """
    out, _ = _fused_pe_fwd(center, ray, depth, interpret, compute_dtype,
                           masks, weights, activ, noise)
    return out


def _fused_pe_fwd(center, ray, depth, interpret, compute_dtype, masks,
                  weights, activ="softplus", noise=None):
    R, K = depth.shape
    assert R % R_BLK == 0, (R, R_BLK)
    grid = (R // R_BLK,)
    ws3, wc3, wsv, wcv = masks
    w_list = [weights[k] for k in ff._ORDER]
    has_noise = noise is not None
    extra_specs = ([_ray_spec(K, R_BLK), ff._full_spec((K, K))]
                   if has_noise else [])
    extra_args = ((noise, jnp.asarray(np.eye(K, dtype=np.float32)))
                  if has_noise else ())
    out = pl.pallas_call(
        functools.partial(_fwd_pe_kernel,
                          ff.resolve_compute_dtype(compute_dtype), activ,
                          has_noise),
        grid=grid,
        in_specs=[_ray_spec(3, R_BLK), _ray_spec(3, R_BLK),
                  _ray_spec(K, R_BLK),
                  _row_spec(D_IN), _row_spec(D_IN), _row_spec(D_IN),
                  _row_spec(D_VIEW), _row_spec(D_VIEW), _row_spec(D_VIEW),
                  ff._full_spec((3, D_IN)), ff._full_spec((3, D_VIEW))] +
                 _w_specs() + extra_specs,
        out_specs=pl.BlockSpec((R_BLK * K, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R * K, 4), jnp.float32),
        interpret=interpret,
    )(center, ray, depth, jnp.asarray(_MID3D), ws3, wc3,
      jnp.asarray(_MIDV), wsv, wcv,
      jnp.asarray(_F3D), jnp.asarray(_FV), *w_list, *extra_args)
    return out, (center, ray, depth, masks, weights, noise)


def _fused_pe_bwd(interpret, compute_dtype, activ, res, g):
    center, ray, depth, masks, weights, noise = res
    R, K = depth.shape
    grid = (R // R_BLK,)
    ws3, wc3, wsv, wcv = masks
    w_list = [weights[k] for k in ff._ORDER]
    has_noise = noise is not None
    extra_specs = ([_ray_spec(K, R_BLK), ff._full_spec((K, K))]
                   if has_noise else [])
    extra_args = ((noise, jnp.asarray(np.eye(K, dtype=np.float32)))
                  if has_noise else ())
    out_shapes = (
        [jax.ShapeDtypeStruct((R, 3), jnp.float32),
         jax.ShapeDtypeStruct((R, 3), jnp.float32)] +
        [jax.ShapeDtypeStruct(ff._WEIGHT_SHAPES.get(k) or ff._BIAS_SHAPES[k],
                              jnp.float32) for k in ff._ORDER])
    out_specs = ([_ray_spec(3, R_BLK), _ray_spec(3, R_BLK)] + _w_specs())
    outs = pl.pallas_call(
        functools.partial(_bwd_pe_kernel,
                          ff.resolve_compute_dtype(compute_dtype), activ,
                          has_noise),
        grid=grid,
        in_specs=[_ray_spec(3, R_BLK), _ray_spec(3, R_BLK),
                  _ray_spec(K, R_BLK),
                  _row_spec(D_IN), _row_spec(D_IN), _row_spec(D_IN),
                  _row_spec(D_VIEW), _row_spec(D_VIEW), _row_spec(D_VIEW),
                  ff._full_spec((3, D_IN)), ff._full_spec((3, D_VIEW)),
                  pl.BlockSpec((R_BLK * K, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + _w_specs()
                 + extra_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(center, ray, depth, jnp.asarray(_MID3D), ws3, wc3,
      jnp.asarray(_MIDV), wsv, wcv,
      jnp.asarray(_F3D), jnp.asarray(_FV), g, *w_list, *extra_args)
    dcenter, dray = outs[0], outs[1]
    dw = {k: outs[2 + i] for i, k in enumerate(ff._ORDER)}
    zero_masks = tuple(jnp.zeros_like(m) for m in masks)
    d_noise = jnp.zeros_like(noise) if has_noise else None
    return dcenter, dray, jnp.zeros_like(depth), zero_masks, dw, d_noise


fused_mlp_pe.defvjp(_fused_pe_fwd, _fused_pe_bwd)


# ---------------------------------------------------------------------------
# drop-in wrapper (same contract as fused_field.fused_apply_nerf_samples)
# ---------------------------------------------------------------------------

def fused_apply_nerf_samples_pe(params, arch, center, ray, depth, *,
                                view_dep=True, density_activ="softplus",
                                progress=None, barf_c2f=None,
                                density_noise_reg=None, noise_key=None,
                                interpret=False, compute_dtype="float32"):
    """PE-fused drop-in for ops.nerf_mlp.apply_nerf_samples.

    Requirements: the fused_field arch contract plus a sample count K that
    is a multiple of 8 (lane-tiled reshapes); the paper config uses K=128.
    density_noise_reg + noise_key: pre-activation density noise — the draw
    is jax.random.normal(noise_key, [B,R,K]) * reg, BITWISE the jnp path's
    (ops/nerf_mlp.py:129-131), generated here in XLA and passed into the
    kernel as a lane-dense [R,K] operand.
    """
    assert density_activ in ("softplus", "relu") and view_dep
    out, n_rays, (B, R_img, K) = _dispatch_mlp_pe(
        params, center, ray, depth, density_noise_reg, noise_key,
        progress, barf_c2f, interpret, compute_dtype, density_activ)
    rgb = out[:, :3].reshape(B, R_img, K, 3)
    density = out[:, 3].reshape(B, R_img, K)
    return rgb, density


def _dispatch_mlp_pe(params, center, ray, depth, density_noise_reg,
                     noise_key, progress, barf_c2f, interpret,
                     compute_dtype, density_activ):
    """Shared prep + dispatch for the per-sample PE kernel wrappers:
    flatten rays, draw the (optional) density noise, pad to the block/shard
    multiple, and run ``fused_mlp_pe`` — per-shard via shard_map when a ray
    mesh is active (GSPMD treats pallas_call as opaque and would otherwise
    all-gather the rays and replicate the kernel; the weight cotangents are
    psum'd by shard_map's replicated-input transpose, exactly as the rm
    wrappers below). Returns (out [n_rays*K, 4], n_rays, (B, R_img, K))."""
    B, R_img = center.shape[0], center.shape[1]
    K = depth.shape[2]
    n_rays = B * R_img
    mesh, n_sh = _mesh_shards()
    c = center.reshape(n_rays, 3)
    r = ray.reshape(n_rays, 3)
    d = jax.lax.stop_gradient(depth.reshape(n_rays, K))
    noise = _make_noise(density_noise_reg, noise_key, (B, R_img, K))
    pad = (-n_rays) % (R_BLK * n_sh)
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad, 3), c.dtype)], axis=0)
        # unit-z pad rays: zero rays would hit the norm clamp, which is fine
        # numerically but produces a degenerate view encoding — keep it clean
        r = jnp.concatenate(
            [r, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], r.dtype), (pad, 1))],
            axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, K), d.dtype)], axis=0)
        if noise is not None:
            noise = jnp.concatenate(
                [noise, jnp.zeros((pad, K), noise.dtype)], axis=0)
    masks = tuple(jax.lax.stop_gradient(m)
                  for m in pe_mask_rows(progress if progress is not None
                                        else 1.0, barf_c2f))
    weights = ff.pack_weights(params)
    if mesh is not None:
        shard_map = _shard_map_fn()
        from jax.sharding import PartitionSpec as P
        rowspec = _shard_spec(1)
        rep = jax.tree_util.tree_map(lambda _: P(), (masks, weights))
        n_args = () if noise is None else (noise,)
        n_specs = () if noise is None else (rowspec,)
        out = shard_map(
            lambda cc, rr, dd, mm, ww, *nn: fused_mlp_pe(
                cc, rr, dd, interpret, compute_dtype, mm, ww,
                density_activ, nn[0] if nn else None),
            mesh=mesh,
            in_specs=(rowspec, rowspec, rowspec, rep[0], rep[1]) + n_specs,
            out_specs=rowspec, check_rep=False,
        )(c, r, d, masks, weights, *n_args)
    else:
        out = fused_mlp_pe(c, r, d, interpret, compute_dtype, masks,
                           weights, density_activ, noise)
    return out[:n_rays * K], n_rays, (B, R_img, K)


def _make_noise(density_noise_reg, noise_key, shape):
    """The reference's density_noise_reg draw, flattened to per-ray rows.

    Matches ops/nerf_mlp.py:129-131 bitwise: normal(noise_key, [B,R,K]) *
    reg (row-major reshape to [B*R, K] preserves the draw order)."""
    if not density_noise_reg or noise_key is None:
        return None
    B, R_img, K = shape
    noise = jax.random.normal(noise_key, (B, R_img, K), jnp.float32)
    return (noise * density_noise_reg).reshape(B * R_img, K)


def fused_apply_nerf_samples_pe_soa(params, arch, center, ray, depth, *,
                                    view_dep=True, density_activ="softplus",
                                    progress=None, barf_c2f=None,
                                    density_noise_reg=None, noise_key=None,
                                    interpret=False, compute_dtype="float32"):
    """Channel-separated (SoA) variant of fused_apply_nerf_samples_pe.

    Returns ((r, g, b) each [B,R,K], density [B,R,K]) for
    ops.render.composite_soa. Rationale: the AoS return shapes put 3/4
    channels on the 128-lane minor axis, so every downstream XLA op runs on
    tensors physically padded 3->128 lanes ([N,4] at the bench shape is
    132 MB of tile traffic for 4 MB of data) — ~1.9 ms/step of compositing
    glue, profiled r3. Here the [N,4] kernel output is read ONCE (one fused
    4-way column split) into lane-dense [B,R,K] per-channel arrays; the
    backward re-assembles the [N,4] cotangent in one fused write.
    """
    assert density_activ in ("softplus", "relu") and view_dep
    out, n_rays, (B, R_img, K) = _dispatch_mlp_pe(
        params, center, ray, depth, density_noise_reg, noise_key,
        progress, barf_c2f, interpret, compute_dtype, density_activ)
    chans = tuple(out[:, ch].reshape(B, R_img, K) for ch in range(3))
    density = out[:, 3].reshape(B, R_img, K)
    return chans, density


def supports(arch, opt_nerf, sample_intvs=None):
    """Whether the PE-fused kernel covers this configuration."""
    if not ff.supports(arch, opt_nerf):
        return False
    K = sample_intvs if sample_intvs is not None else opt_nerf.sample_intvs
    return K % 8 == 0 and (R_BLK * K) % 8 == 0


# ---------------------------------------------------------------------------
# fully-fused variant: + alpha compositing in-kernel, per-RAY [R,8] outputs
# (r3 rework; the r2 version emitted per-point [n,8] contributions and read
# [n,1] dist/depth columns — every such [N,small] tensor is lane-padded
# small->128 on TPU, 132-264 MB of physical tile traffic per step at the
# bench shape, and the XLA-side column splits/assemblies around the r2
# fused_pe path cost ~2.4 ms/step, profiled. Here NOTHING [N,*]-shaped
# crosses the kernel boundary: quadrature (intv * ||ray||) happens in-kernel
# from depth [R,K], and the [R,K] lane-space <-> [n,1] sublane-column
# shape-cast Mosaic lacks is expressed as identity-matrix MXU dots)
# ---------------------------------------------------------------------------


def _cast_row_to_col(I, row):
    """[1,K] lane vector -> [K,1] sublane column via an MXU identity dot
    (Mosaic has no lanes<->sublanes relayout; the dot reduction against a
    one-hot row adds exactly one zero-product per output and is fp-exact)."""
    return ff._dot_nt(I, row)


def _rows_to_cols(I, mat, rays_blk):
    """[R,K] -> [R*K,1] row-major column (per-ray MXU transposes)."""
    return jnp.concatenate(
        [_cast_row_to_col(I, mat[r:r + 1]) for r in range(rays_blk)], axis=0)


def _cols_to_rows(I, col, rays_blk, K):
    """[R*K,1] row-major column -> [R,K] rows (per-ray MXU transposes,
    the exact inverse layout move of _rows_to_cols; fp-exact)."""
    return jnp.concatenate(
        [ff._dot_tn(col[r * K:(r + 1) * K], I) for r in range(rays_blk)],
        axis=0)


def _per_ray_sums(vals, rays_blk, K):
    """[R*K,C] -> [R,C]: sum each ray's K contiguous rows (sublane reduce)."""
    return jnp.concatenate(
        [jnp.sum(vals[r * K:(r + 1) * K], axis=0, keepdims=True)
         for r in range(rays_blk)], axis=0)


def _broadcast_rows(g, rays_blk, K):
    """[R,C] -> [R*K,C]: repeat each ray row K times (sublane broadcast)."""
    return jnp.concatenate(
        [jnp.broadcast_to(g[r:r + 1], (K, g.shape[1]))
         for r in range(rays_blk)], axis=0)


def _quadrature(ray, depth):
    """In-kernel dist/raylen: intv_i = d_{i+1}-d_i (last 1e10), scaled by
    ||ray|| (ops/render.py::composite semantics). Returns ([R,K], [R,1])."""
    intv = jnp.concatenate(
        [depth[:, 1:] - depth[:, :-1],
         jnp.full_like(depth[:, :1], 1e10)], axis=1)
    ray_len = jnp.sqrt(jnp.sum(ray * ray, axis=1, keepdims=True))
    return intv * ray_len, ray_len

def _prefix_mat_lower(K):
    """[K,K] strict lower triangular: (L @ s_r)[i] = sum_{j<i} s_r[j].

    Round-2 used the full [n,n] = I_R (x) L block-diagonal matvec (Mosaic
    cannot shape-cast (n,1) sublanes <-> (R,K) lanes and has no cumsum
    lowering; cumsum(s)-s would also cancel catastrophically against the
    sigma*1e10 last-interval term). That matvec was 127/128 zeros and
    ~4.3 ms/step of MXU-starved work (NOTES_r2.md:136-146). Decomposed
    per-ray it is R_BLK [K,K]@[K,1] matvecs on static sublane slices —
    identical FP values (zero terms don't perturb the dot reduction), 8x
    less MXU work and a 64 KB operand instead of 4 MB of VMEM."""
    L = np.zeros((K, K), np.float32)
    for i in range(1, K):
        L[i, :i] = 1.0
    return L


def _prefix_blockdiag(L, s, rays_blk, K):
    """(I_R (x) L) @ s for s [R*K, 1], via per-ray [K,K]@[K,1] matvecs.

    (Batching the rays as columns of one [K,K]@[K,R] matmul fails to lower
    in Mosaic — the [128,1]-piece lane-concat has no legal relayout; the
    matvec loop measures within 0.4 ms/step of a no-prefix ablation, so
    there is nothing left to win here.)"""
    return jnp.concatenate(
        [ff._dot(L, s[r * K:(r + 1) * K]) for r in range(rays_blk)], axis=0)


def _prefix_blockdiag_t(L, g, rays_blk, K):
    """(I_R (x) L)^T @ g (the backward transpose), per-ray."""
    return jnp.concatenate(
        [ff._dot_tn(L, g[r * K:(r + 1) * K]) for r in range(rays_blk)],
        axis=0)


def _rm_fwd_pe_kernel(cdt, activ, center_ref, ray_ref, depth_ref,
                      mid3_ref, ws3_ref, wc3_ref, midv_ref, wsv_ref, wcv_ref,
                      F3_ref, Fv_ref, L_ref, I_ref, *wrefs):
    out_ref = wrefs[-1]
    w = {name: wrefs[i][:] for i, name in enumerate(ff._ORDER)}
    center, ray, depth = center_ref[:], ray_ref[:], depth_ref[:]
    xp, vi, _ = _encode_block(center, ray, depth,
                              mid3_ref[:], ws3_ref[:], wc3_ref[:],
                              midv_ref[:], wsv_ref[:], wcv_ref[:],
                              F3_ref[:], Fv_ref[:])
    out4, _ = ff._forward_block(xp, vi, w, cdt=cdt, activ=activ)
    rgb = out4[:, :3]
    sigma = out4[:, 3:4]
    R, K = depth.shape
    I = I_ref[:]
    dist_rk, _ = _quadrature(ray, depth)
    dist = _rows_to_cols(I, dist_rk, R)                        # [n,1]
    d_col = _rows_to_cols(I, depth, R)                         # [n,1]
    s = sigma * dist
    alpha = 1.0 - jnp.exp(-s)
    prefix = _prefix_blockdiag(L_ref[:], s, R, K)
    wgt = jnp.exp(-prefix) * alpha                             # [n,1]
    n = xp.shape[0]
    contrib = jnp.concatenate(
        [wgt * rgb, wgt * d_col, wgt,
         jnp.zeros((n, 3), jnp.float32)], axis=-1)             # [n,8]
    out_ref[:] = _per_ray_sums(contrib, R, K)                  # [R,8]


def _rm_bwd_pe_kernel(cdt, activ, center_ref, ray_ref, depth_ref,
                      mid3_ref, ws3_ref, wc3_ref, midv_ref, wsv_ref, wcv_ref,
                      F3_ref, Fv_ref, L_ref, I_ref, g_ref, *refs):
    w = {name: refs[i][:] for i, name in enumerate(ff._ORDER)}
    n_w = len(ff._ORDER)
    dcenter_ref, dray_ref = refs[n_w], refs[n_w + 1]
    dw_refs = {name: refs[n_w + 2 + i] for i, name in enumerate(ff._ORDER)}

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for name in ff._ORDER:
            dw_refs[name][:] = jnp.zeros_like(dw_refs[name])

    def accumulate(name, value):
        dw_refs[name][:] += value

    center, ray, depth = center_ref[:], ray_ref[:], depth_ref[:]
    mid3, ws3, wc3 = mid3_ref[:], ws3_ref[:], wc3_ref[:]
    midv, wsv, wcv = midv_ref[:], wsv_ref[:], wcv_ref[:]
    F3, Fv = F3_ref[:], Fv_ref[:]
    xp, vi, res = _encode_block(center, ray, depth, mid3, ws3, wc3,
                                midv, wsv, wcv, F3, Fv)
    xp_pre, d3, vF, ru, inv = res
    R, K = depth.shape
    n = R * K

    I = I_ref[:]
    dist_rk, ray_len = _quadrature(ray, depth)
    dist = _rows_to_cols(I, dist_rk, R)                        # [n,1]
    d_col = _rows_to_cols(I, depth, R)                         # [n,1]
    L = L_ref[:]
    g_pt = _broadcast_rows(g_ref[:], R, K)                     # [n,8]

    # One fused pass per sub-chunk: forward (kept), composite backward, MLP
    # backward reusing the SAME activation cache. Chunks hold whole rays
    # (sub is a K-multiple) so the per-ray transmittance coupling stays
    # chunk-local; this removes the full-block duplicate forward the round-2
    # version paid (~2.6 ms/step at the bench shape).
    m = max(1, min(MLP_SUB, n) // K)
    while R % m:     # chunks must tile the block exactly (static shapes)
        m -= 1
    sub = m * K
    dxp_parts, dview_parts, gdist_parts = [], [], []
    for s0 in range(0, n, sub):
        sl = slice(s0, s0 + sub)
        fwd = ff._forward_block(xp[sl], vi[sl], w, keep=True, cdt=cdt,
                                activ=activ)
        out4 = fwd[0]
        rgb = out4[:, :3]
        sigma = out4[:, 3:4]
        s = sigma * dist[sl]
        alpha = 1.0 - jnp.exp(-s)
        r_sub = sub // K
        prefix = _prefix_blockdiag(L, s, r_sub, K)
        T = jnp.exp(-prefix)
        wgt = T * alpha

        # composite backward (the per-ray output sum broadcasts its
        # cotangent row to every sample row — g_pt above)
        gr, gd, go = g_pt[sl, :3], g_pt[sl, 3:4], g_pt[sl, 4:5]
        g_wgt = jnp.sum(gr * rgb, axis=-1, keepdims=True) \
            + gd * d_col[sl] + go
        g_rgb = wgt * gr
        g_alpha = g_wgt * T
        g_prefix = -(g_wgt * alpha) * T
        g_s = g_alpha * jnp.exp(-s) + _prefix_blockdiag_t(L, g_prefix,
                                                          r_sub, K)
        gdist_parts.append(g_s * sigma)   # dist cotangent (-> ||ray|| chain)
        g4 = jnp.concatenate([g_rgb, g_s * dist[sl]], axis=-1)  # [sub,4]

        dxp_s, dview_s = ff._mlp_backward(xp[sl], vi[sl], w, g4, accumulate,
                                          cdt=cdt, fwd=fwd, activ=activ)
        dxp_parts.append(dxp_s)
        dview_parts.append(dview_s)
    # quadrature chain, in-kernel: dist = intv * ||ray||, so
    # d/dray = (sum_k g_dist[k] * intv[k]) * ray/||ray||, and
    # sum g_dist*intv = sum(g_dist * dist) / ||ray||
    g_dist = jnp.concatenate(gdist_parts, axis=0)              # [n,1]
    g_len = _per_ray_sums(g_dist * dist, R, K) / ray_len       # [R,1]
    dray_quad = ray * (g_len / ray_len)                        # [R,3]
    dxp = jnp.concatenate(dxp_parts, axis=0)
    dview = jnp.concatenate(dview_parts, axis=0)

    dxp_pre = (mid3 + ws3 * jnp.cos(xp_pre) - wc3 * jnp.sin(xp_pre)) * dxp
    dpts = ff._dot_nt_pe(dxp_pre, F3)
    dcenter = jnp.sum(dpts.reshape(R, K, 3), axis=1)
    dray = jnp.sum((dpts * d3).reshape(R, K, 3), axis=1)

    dvi_r = jnp.sum(dview.reshape(R, K, D_VIEW), axis=1)
    dvF = (midv + wsv * jnp.cos(vF) - wcv * jnp.sin(vF)) * dvi_r
    dru = ff._dot_nt_pe(dvF, Fv)
    dray = dray + dru * inv \
        - ru * (jnp.sum(dru * ru, axis=1, keepdims=True) * inv)

    dcenter_ref[:] = dcenter
    dray_ref[:] = dray + dray_quad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 7))
def fused_mlp_pe_rm(center, ray, depth, interpret, compute_dtype, masks,
                    weights, activ="softplus"):
    """Fused PE + field MLP + alpha compositing, per-RAY outputs.

    center/ray: [R,3]; depth: [R,K] sorted ascending (pts construction +
    in-kernel quadrature; non-diff — stratified samples are detached).
    Returns per-ray composited [R,8] = (rgb, depth, opacity, 0,0,0); the
    ||ray|| quadrature chain is differentiated in-kernel into dray.
    """
    out, _ = _fused_pe_rm_fwd(center, ray, depth, interpret, compute_dtype,
                              masks, weights, activ)
    return out


def _rm_consts(K):
    return (jnp.asarray(_prefix_mat_lower(K)),
            jnp.asarray(np.eye(K, dtype=np.float32)))


def _fused_pe_rm_fwd(center, ray, depth, interpret, compute_dtype, masks,
                     weights, activ="softplus"):
    R, K = depth.shape
    assert R % R_BLK == 0, (R, R_BLK)
    grid = (R // R_BLK,)
    ws3, wc3, wsv, wcv = masks
    w_list = [weights[k] for k in ff._ORDER]
    L, I = _rm_consts(K)
    out = pl.pallas_call(
        functools.partial(_rm_fwd_pe_kernel,
                          ff.resolve_compute_dtype(compute_dtype), activ),
        grid=grid,
        in_specs=[_ray_spec(3, R_BLK), _ray_spec(3, R_BLK),
                  _ray_spec(K, R_BLK),
                  _row_spec(D_IN), _row_spec(D_IN), _row_spec(D_IN),
                  _row_spec(D_VIEW), _row_spec(D_VIEW), _row_spec(D_VIEW),
                  ff._full_spec((3, D_IN)), ff._full_spec((3, D_VIEW)),
                  ff._full_spec((K, K)), ff._full_spec((K, K))] + _w_specs(),
        out_specs=_ray_spec(8, R_BLK),
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.float32),
        interpret=interpret,
    )(center, ray, depth, jnp.asarray(_MID3D), ws3, wc3,
      jnp.asarray(_MIDV), wsv, wcv,
      jnp.asarray(_F3D), jnp.asarray(_FV), L, I, *w_list)
    return out, (center, ray, depth, masks, weights)


def _fused_pe_rm_bwd(interpret, compute_dtype, activ, res, g):
    center, ray, depth, masks, weights = res
    R, K = depth.shape
    grid = (R // R_BLK,)
    ws3, wc3, wsv, wcv = masks
    w_list = [weights[k] for k in ff._ORDER]
    L, I = _rm_consts(K)
    out_shapes = (
        [jax.ShapeDtypeStruct((R, 3), jnp.float32),
         jax.ShapeDtypeStruct((R, 3), jnp.float32)] +
        [jax.ShapeDtypeStruct(ff._WEIGHT_SHAPES.get(k) or ff._BIAS_SHAPES[k],
                              jnp.float32) for k in ff._ORDER])
    out_specs = ([_ray_spec(3, R_BLK), _ray_spec(3, R_BLK)] + _w_specs())
    outs = pl.pallas_call(
        functools.partial(_rm_bwd_pe_kernel,
                          ff.resolve_compute_dtype(compute_dtype), activ),
        grid=grid,
        in_specs=[_ray_spec(3, R_BLK), _ray_spec(3, R_BLK),
                  _ray_spec(K, R_BLK),
                  _row_spec(D_IN), _row_spec(D_IN), _row_spec(D_IN),
                  _row_spec(D_VIEW), _row_spec(D_VIEW), _row_spec(D_VIEW),
                  ff._full_spec((3, D_IN)), ff._full_spec((3, D_VIEW)),
                  ff._full_spec((K, K)), ff._full_spec((K, K)),
                  _ray_spec(8, R_BLK)] + _w_specs(),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(center, ray, depth, jnp.asarray(_MID3D), ws3, wc3,
      jnp.asarray(_MIDV), wsv, wcv,
      jnp.asarray(_F3D), jnp.asarray(_FV), L, I, g, *w_list)
    dcenter, dray = outs[0], outs[1]
    dw = {k: outs[2 + i] for i, k in enumerate(ff._ORDER)}
    zero_masks = tuple(jnp.zeros_like(m) for m in masks)
    return dcenter, dray, jnp.zeros_like(depth), zero_masks, dw


fused_mlp_pe_rm.defvjp(_fused_pe_rm_fwd, _fused_pe_rm_bwd)


def _mesh_shards():
    """(mesh, n_shards) when ray-axis sharding is active, else (None, 1).

    GSPMD treats pallas_call as opaque (it would all-gather the rays and
    run every chip over the FULL set — correct but unscaled), so the rm
    wrappers dispatch through shard_map over the flattened ray axis when a
    mesh is active: each chip runs the kernel on its ray shard; weight
    cotangents are psum'd by shard_map's replicated-input transpose."""
    from ...parallel import mesh as mesh_lib
    mesh = mesh_lib.active_mesh()
    if mesh is None or mesh.size <= 1:
        return None, 1
    return mesh, int(mesh.size)


def _shard_map_fn():
    """jax.shard_map (>=0.8, check_vma kwarg) or the legacy experimental
    API (check_rep kwarg), normalized to accept check_rep."""
    import functools as _ft
    new = getattr(jax, "shard_map", None)
    if new is not None:
        def wrap(f, *, mesh, in_specs, out_specs, check_rep=True):
            return new(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       check_vma=check_rep)
        return wrap
    from jax.experimental.shard_map import shard_map as old
    return old


def _shard_spec(n_trailing):
    """PartitionSpec sharding axis 0 over the ray mesh axis."""
    from jax.sharding import PartitionSpec as P
    from ...parallel.mesh import RAY_AXIS
    return P(RAY_AXIS, *([None] * n_trailing))


def fused_render_rays_pe(params, arch, center, ray, depth, *,
                         progress=None, barf_c2f=None, setbg_opaque=False,
                         bgcolor=None, interpret=False,
                         compute_dtype="float32", density_activ="softplus"):
    """Drop-in for the sample->field->composite core (no fine sampling).

    center/ray: [B,R,3]; depth: [B,R,K,1] sorted ascending.
    Returns (rgb [B,R,3], depth [B,R,1], opacity [B,R,1]). The only
    XLA-side tensors are the [n_rays,3]/[n_rays,8] ray-level ones.
    """
    B, R_img, K = depth.shape[0], depth.shape[1], depth.shape[2]
    n_rays = B * R_img
    mesh, n_sh = _mesh_shards()
    c = center.reshape(n_rays, 3)
    r = ray.reshape(n_rays, 3)
    d = jax.lax.stop_gradient(depth.reshape(n_rays, K))
    pad = (-n_rays) % (R_BLK * n_sh)
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad, 3), c.dtype)], axis=0)
        r = jnp.concatenate(
            [r, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], r.dtype), (pad, 1))],
            axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, K), d.dtype)], axis=0)
    masks = tuple(jax.lax.stop_gradient(m)
                  for m in pe_mask_rows(progress if progress is not None
                                        else 1.0, barf_c2f))
    weights = ff.pack_weights(params)
    if mesh is not None:
        shard_map = _shard_map_fn()
        from jax.sharding import PartitionSpec as P
        rowspec = _shard_spec(1)
        rep = jax.tree_util.tree_map(lambda _: P(), (masks, weights))
        out = shard_map(
            lambda cc, rr, dd, mm, ww: fused_mlp_pe_rm(
                cc, rr, dd, interpret, compute_dtype, mm, ww,
                density_activ),
            mesh=mesh,
            in_specs=(rowspec, rowspec, rowspec, rep[0], rep[1]),
            out_specs=rowspec, check_rep=False,
        )(c, r, d, masks, weights)[:n_rays]
    else:
        out = fused_mlp_pe_rm(c, r, d, interpret, compute_dtype,
                              masks, weights, density_activ)[:n_rays]
    rgb = out[:, :3].reshape(B, R_img, 3)
    depth_out = out[:, 3:4].reshape(B, R_img, 1)
    opacity = out[:, 4:5].reshape(B, R_img, 1)
    if setbg_opaque:
        rgb = rgb + bgcolor * (1 - opacity)
    return rgb, depth_out, opacity


# ---------------------------------------------------------------------------
# fused TRAIN kernel: forward + in-kernel MSE cotangent + backward in ONE
# pallas call (r3). In training, fused_mlp_pe_rm dispatches a forward kernel
# AND a backward kernel that recomputes the whole forward anyway — but the
# photometric-MSE cotangent is analytic given the target pixels, and the
# backward's recompute chunks hold whole rays, so the cotangent can be formed
# chunk-locally in-kernel. That makes the separate forward kernel redundant
# (~2.75 ms/step of the 10.3 ms step at the bench shape). The op returns the
# raw squared-error sum as the ONLY differentiable output; rgb/depth/opacity
# come out for metrics and must be treated as constants (the wrapper
# stop-gradients them). The VJP is exact: the kernel's gradients are
# d(sq_sum)/d(inputs), and the incoming scalar cotangent (loss weight /
# normalizer) just scales them.
# ---------------------------------------------------------------------------


def _rm_train_pe_kernel(cdt, bg, activ, has_noise, want_prob, center_ref,
                        ray_ref, depth_ref, mid3_ref, ws3_ref, wc3_ref,
                        midv_ref, wsv_ref, wcv_ref, F3_ref, Fv_ref, L_ref,
                        I_ref, tgt_ref, *refs):
    w = {name: refs[i][:] for i, name in enumerate(ff._ORDER)}
    n_w = len(ff._ORDER)
    noise_ref = None
    if has_noise:   # tail: [noise [R,K]] between weights and outputs
        noise_ref = refs[n_w]
        n_w += 1
    out_ref = refs[n_w]
    off = n_w + 1
    prob_ref = None
    if want_prob:   # per-sample compositing weights [R,K] (stop-grad, for
        prob_ref = refs[off]   # the fine-sampling CDF resample downstream)
        off += 1
    dcenter_ref, dray_ref = refs[off], refs[off + 1]
    dw_refs = {name: refs[off + 2 + i] for i, name in enumerate(ff._ORDER)}

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for name in ff._ORDER:
            dw_refs[name][:] = jnp.zeros_like(dw_refs[name])

    def accumulate(name, value):
        dw_refs[name][:] += value

    center, ray, depth = center_ref[:], ray_ref[:], depth_ref[:]
    mid3, ws3, wc3 = mid3_ref[:], ws3_ref[:], wc3_ref[:]
    midv, wsv, wcv = midv_ref[:], wsv_ref[:], wcv_ref[:]
    F3, Fv = F3_ref[:], Fv_ref[:]
    xp, vi, res = _encode_block(center, ray, depth, mid3, ws3, wc3,
                                midv, wsv, wcv, F3, Fv)
    xp_pre, d3, vF, ru, inv = res
    R, K = depth.shape
    n = R * K

    I = I_ref[:]
    dist_rk, ray_len = _quadrature(ray, depth)
    dist = _rows_to_cols(I, dist_rk, R)                        # [n,1]
    d_col = _rows_to_cols(I, depth, R)                         # [n,1]
    L = L_ref[:]
    tgt_all = tgt_ref[:]                                       # [R,8]
    noise_col = (None if noise_ref is None
                 else _rows_to_cols(I, noise_ref[:], R))       # [n,1]

    m = max(1, min(MLP_SUB, n) // K)
    while R % m:     # chunks must tile the block exactly (static shapes)
        m -= 1
    sub = m * K
    out_parts, dxp_parts, dview_parts, gdist_parts = [], [], [], []
    prob_parts = []
    for s0 in range(0, n, sub):
        sl = slice(s0, s0 + sub)
        rs = s0 // K
        noise_s = None if noise_col is None else noise_col[sl, 0]
        fwd = ff._forward_block(xp[sl], vi[sl], w, keep=True, cdt=cdt,
                                activ=activ, noise=noise_s)
        out4 = fwd[0]
        rgb = out4[:, :3]
        sigma = out4[:, 3:4]
        s = sigma * dist[sl]
        alpha = 1.0 - jnp.exp(-s)
        r_sub = sub // K
        prefix = _prefix_blockdiag(L, s, r_sub, K)
        T = jnp.exp(-prefix)
        wgt = T * alpha
        if want_prob:
            prob_parts.append(_cols_to_rows(I, wgt, r_sub, K))

        # composite FORWARD for this chunk's (whole) rays. The concat runs
        # at [sub,*] granularity into the full 8-wide tile (the narrow
        # [r_sub,3]+[r_sub,1] lane-concat fails to lower in Mosaic —
        # vpad offset mismatch — so no per-ray-row concats anywhere here)
        contrib = jnp.concatenate(
            [wgt * rgb, wgt * d_col[sl], wgt,
             jnp.zeros((sub, 3), jnp.float32)], axis=-1)       # [sub,8]
        sums = _per_ray_sums(contrib, r_sub, K)                # [r_sub,8]
        rgb_ray = sums[:, :3]
        out_parts.append(sums)

        # in-kernel MSE cotangent: g = 2*valid*(rgb_final - target); the
        # valid flag (target col 3) zeroes padded rays so their work never
        # reaches the weight-gradient accumulators
        op_ray = sums[:, 4:5]
        tgt = tgt_all[rs:rs + r_sub]
        rgb_fin = rgb_ray if bg is None else rgb_ray + bg * (1.0 - op_ray)
        valid = tgt[:, 3:4]
        g_rgb_ray = 2.0 * valid * (rgb_fin - tgt[:, :3])       # [r_sub,3]
        if bg is None:
            g_op_ray = jnp.zeros_like(op_ray)
        else:
            g_op_ray = -jnp.sum(g_rgb_ray * bg, axis=1, keepdims=True)

        # composite backward (identical to _rm_bwd_pe_kernel; the depth
        # output has no training cotangent — depth metrics are
        # stop-gradient — so the gd term drops)
        gr = _broadcast_rows(g_rgb_ray, r_sub, K)              # [sub,3]
        go = _broadcast_rows(g_op_ray, r_sub, K)               # [sub,1]
        g_wgt = jnp.sum(gr * rgb, axis=-1, keepdims=True) + go
        g_rgb = wgt * gr
        g_alpha = g_wgt * T
        g_prefix = -(g_wgt * alpha) * T
        g_s = g_alpha * jnp.exp(-s) + _prefix_blockdiag_t(L, g_prefix,
                                                          r_sub, K)
        gdist_parts.append(g_s * sigma)
        g4 = jnp.concatenate([g_rgb, g_s * dist[sl]], axis=-1)  # [sub,4]

        dxp_s, dview_s = ff._mlp_backward(xp[sl], vi[sl], w, g4, accumulate,
                                          cdt=cdt, fwd=fwd, activ=activ,
                                          noise=noise_s)
        dxp_parts.append(dxp_s)
        dview_parts.append(dview_s)

    out_ref[:] = jnp.concatenate(out_parts, axis=0)            # [R,8]
    if want_prob:
        prob_ref[:] = jnp.concatenate(prob_parts, axis=0)      # [R,K]

    # quadrature chain (see _rm_bwd_pe_kernel)
    g_dist = jnp.concatenate(gdist_parts, axis=0)              # [n,1]
    g_len = _per_ray_sums(g_dist * dist, R, K) / ray_len       # [R,1]
    dray_quad = ray * (g_len / ray_len)                        # [R,3]
    dxp = jnp.concatenate(dxp_parts, axis=0)
    dview = jnp.concatenate(dview_parts, axis=0)

    dxp_pre = (mid3 + ws3 * jnp.cos(xp_pre) - wc3 * jnp.sin(xp_pre)) * dxp
    dpts = ff._dot_nt_pe(dxp_pre, F3)
    dcenter = jnp.sum(dpts.reshape(R, K, 3), axis=1)
    dray = jnp.sum((dpts * d3).reshape(R, K, 3), axis=1)

    dvi_r = jnp.sum(dview.reshape(R, K, D_VIEW), axis=1)
    dvF = (midv + wsv * jnp.cos(vF) - wcv * jnp.sin(vF)) * dvi_r
    dru = ff._dot_nt_pe(dvF, Fv)
    dray = dray + dru * inv \
        - ru * (jnp.sum(dru * ru, axis=1, keepdims=True) * inv)

    dcenter_ref[:] = dcenter
    dray_ref[:] = dray + dray_quad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 9, 11))
def fused_mlp_pe_rm_train(center, ray, depth, target8, interpret,
                          compute_dtype, bg, masks, weights,
                          activ="softplus", noise=None, want_prob=False):
    """One-call training render: returns (sq_sum, out [R,8][, prob [R,K]]).

    sq_sum = sum over valid rays of |rgb_final - target|^2 (unnormalized) —
    the ONLY differentiable output. out carries (rgb, depth, opacity, 0,0,0)
    per ray for metrics and MUST be stop-gradiented by the caller (its
    cotangent is ignored by the VJP). target8: [R,8] with target rgb in
    cols 0:3 and the valid flag in col 3. bg: static float background color
    (setbg_opaque compositing happens inside the loss) or None.
    want_prob (static): additionally return the per-sample compositing
    weights [R,K] (T*alpha) — non-differentiable, for the fine-sampling
    CDF resample, which the reference runs under torch.no_grad()
    (model/nerf.py:311-315), so dropping its cotangent is exact parity.
    """
    res = _fused_pe_rm_train_fwd(center, ray, depth, target8,
                                 interpret, compute_dtype, bg,
                                 masks, weights, activ, noise, want_prob)
    return res[0]


def _fused_pe_rm_train_fwd(center, ray, depth, target8, interpret,
                           compute_dtype, bg, masks, weights,
                           activ="softplus", noise=None, want_prob=False):
    R, K = depth.shape
    assert R % R_BLK == 0, (R, R_BLK)
    grid = (R // R_BLK,)
    ws3, wc3, wsv, wcv = masks
    w_list = [weights[k] for k in ff._ORDER]
    L, I = _rm_consts(K)
    has_noise = noise is not None
    extra_specs = [_ray_spec(K, R_BLK)] if has_noise else []
    extra_args = (noise,) if has_noise else ()
    prob_shapes = ([jax.ShapeDtypeStruct((R, K), jnp.float32)]
                   if want_prob else [])
    prob_specs = [_ray_spec(K, R_BLK)] if want_prob else []
    n_lead = 2 + len(prob_shapes)   # out [, prob], dcenter, dray, then dw
    out_shapes = (
        [jax.ShapeDtypeStruct((R, 8), jnp.float32)] + prob_shapes +
        [jax.ShapeDtypeStruct((R, 3), jnp.float32),
         jax.ShapeDtypeStruct((R, 3), jnp.float32)] +
        [jax.ShapeDtypeStruct(ff._WEIGHT_SHAPES.get(k) or ff._BIAS_SHAPES[k],
                              jnp.float32) for k in ff._ORDER])
    out_specs = ([_ray_spec(8, R_BLK)] + prob_specs +
                 [_ray_spec(3, R_BLK), _ray_spec(3, R_BLK)] + _w_specs())
    outs = pl.pallas_call(
        functools.partial(_rm_train_pe_kernel,
                          ff.resolve_compute_dtype(compute_dtype), bg,
                          activ, has_noise, want_prob),
        grid=grid,
        in_specs=[_ray_spec(3, R_BLK), _ray_spec(3, R_BLK),
                  _ray_spec(K, R_BLK),
                  _row_spec(D_IN), _row_spec(D_IN), _row_spec(D_IN),
                  _row_spec(D_VIEW), _row_spec(D_VIEW), _row_spec(D_VIEW),
                  ff._full_spec((3, D_IN)), ff._full_spec((3, D_VIEW)),
                  ff._full_spec((K, K)), ff._full_spec((K, K)),
                  _ray_spec(8, R_BLK)] + _w_specs() + extra_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(center, ray, depth, jnp.asarray(_MID3D), ws3, wc3,
      jnp.asarray(_MIDV), wsv, wcv,
      jnp.asarray(_F3D), jnp.asarray(_FV), L, I, target8, *w_list,
      *extra_args)
    out = outs[0]
    prob = outs[1] if want_prob else None
    dcenter, dray = outs[n_lead - 1], outs[n_lead]
    dw = {k: outs[n_lead + 1 + i] for i, k in enumerate(ff._ORDER)}
    # loss value in XLA from the per-ray outputs (cheap [R,*] ops); uses the
    # same fp32 quantities the kernel's cotangent used
    rgb = out[:, :3]
    rgb_fin = rgb if bg is None else rgb + bg * (1.0 - out[:, 4:5])
    sq = jnp.sum(target8[:, 3:4] * (rgb_fin - target8[:, :3]) ** 2)
    primal = (sq, out, prob) if want_prob else (sq, out)
    return primal, (dcenter, dray, dw, depth, target8, masks, noise)


def _fused_pe_rm_train_bwd(interpret, compute_dtype, bg, activ, want_prob,
                           res, g):
    g_sq = g[0]   # out (and prob) are metrics/resample-only; the wrapper
    # stop-gradients them (the reference's resample is under no_grad)
    dcenter, dray, dw, depth, target8, masks, noise = res
    zero_masks = tuple(jnp.zeros_like(m) for m in masks)
    d_noise = None if noise is None else jnp.zeros_like(noise)
    return (dcenter * g_sq, dray * g_sq, jnp.zeros_like(depth),
            jnp.zeros_like(target8), zero_masks,
            {k: v * g_sq for k, v in dw.items()}, d_noise)


fused_mlp_pe_rm_train.defvjp(_fused_pe_rm_train_fwd, _fused_pe_rm_train_bwd)


def fused_render_rays_pe_train(params, arch, center, ray, depth, target, *,
                               progress=None, barf_c2f=None,
                               setbg_opaque=False, bgcolor=None,
                               interpret=False, compute_dtype="float32",
                               density_activ="softplus",
                               density_noise_reg=None, noise_key=None,
                               want_prob=False):
    """Training-only fused render+MSE.

    center/ray: [B,R,3]; depth: [B,R,K,1] sorted ascending; target [B,R,3].
    Returns (out_dict, sq_sum, n_terms): out_dict's rgb/depth/opacity are
    stop-gradiented (metrics only); losses['render'] = sq_sum / n_terms is
    the differentiable photometric MSE, with gradients flowing to
    center/ray (the pose/warp chain) and the field weights through the
    single fused kernel. want_prob=True (static) additionally returns the
    per-sample compositing weights as out_dict['prob'] [B,R,K]
    (stop-gradiented — the reference resamples under torch.no_grad,
    model/nerf.py:311-315), letting the COARSE network of a fine-sampling
    config train through this one-call kernel too.
    """
    B, R_img, K = depth.shape[0], depth.shape[1], depth.shape[2]
    n_rays = B * R_img
    mesh, n_sh = _mesh_shards()
    c = center.reshape(n_rays, 3)
    r = ray.reshape(n_rays, 3)
    d = jax.lax.stop_gradient(depth.reshape(n_rays, K))
    noise = _make_noise(density_noise_reg, noise_key, (B, R_img, K))
    t8 = jnp.concatenate(
        [target.reshape(n_rays, 3),
         jnp.ones((n_rays, 1), jnp.float32),
         jnp.zeros((n_rays, 4), jnp.float32)], axis=1)
    pad = (-n_rays) % (R_BLK * n_sh)
    if pad:
        c = jnp.concatenate([c, jnp.zeros((pad, 3), c.dtype)], axis=0)
        r = jnp.concatenate(
            [r, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], r.dtype), (pad, 1))],
            axis=0)
        d = jnp.concatenate([d, jnp.ones((pad, K), d.dtype)], axis=0)
        t8 = jnp.concatenate([t8, jnp.zeros((pad, 8), t8.dtype)], axis=0)
        if noise is not None:
            noise = jnp.concatenate(
                [noise, jnp.zeros((pad, K), noise.dtype)], axis=0)
    masks = tuple(jax.lax.stop_gradient(m)
                  for m in pe_mask_rows(progress if progress is not None
                                        else 1.0, barf_c2f))
    bg = float(bgcolor) if setbg_opaque else None
    t8 = jax.lax.stop_gradient(t8)
    weights = ff.pack_weights(params)
    if mesh is not None:
        shard_map = _shard_map_fn()
        from jax.sharding import PartitionSpec as P
        from ...parallel.mesh import RAY_AXIS
        rowspec = _shard_spec(1)
        rep = jax.tree_util.tree_map(lambda _: P(), (masks, weights))

        def _local(cc, rr, dd, tt, mm, ww, *nn):
            res_l = fused_mlp_pe_rm_train(
                cc, rr, dd, tt, interpret, compute_dtype, bg, mm, ww,
                density_activ, nn[0] if nn else None, want_prob)
            return (jax.lax.psum(res_l[0], RAY_AXIS),) + res_l[1:]

        n_args = () if noise is None else (noise,)
        n_specs = () if noise is None else (rowspec,)
        o_specs = ((P(), rowspec, rowspec) if want_prob
                   else (P(), rowspec))
        res = shard_map(
            _local, mesh=mesh,
            in_specs=(rowspec, rowspec, rowspec, rowspec, rep[0], rep[1])
            + n_specs,
            out_specs=o_specs, check_rep=False,
        )(c, r, d, t8, masks, weights, *n_args)
    else:
        res = fused_mlp_pe_rm_train(
            c, r, d, t8, interpret, compute_dtype, bg, masks, weights,
            density_activ, noise, want_prob)
    sq, out = res[0], res[1]
    out = jax.lax.stop_gradient(out)[:n_rays]
    rgb = out[:, :3].reshape(B, R_img, 3)
    depth_out = out[:, 3:4].reshape(B, R_img, 1)
    opacity = out[:, 4:5].reshape(B, R_img, 1)
    if setbg_opaque:
        rgb = rgb + bgcolor * (1 - opacity)
    out_dict = dict(rgb=rgb, depth=depth_out, opacity=opacity)
    if want_prob:
        out_dict["prob"] = jax.lax.stop_gradient(
            res[2])[:n_rays].reshape(B, R_img, K)
    return out_dict, sq, float(n_rays * 3)
