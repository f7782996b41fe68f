"""Fused NeRF field evaluation as Pallas TPU kernels.

The XLA path materializes every 256-wide trunk activation in HBM
(~10 tensors x [N,256] x fp32 per step — the train step is HBM-bound, see
bench notes). This kernel keeps the whole trunk + heads resident in VMEM per
ray-block: HBM traffic collapses to the [N,64]/[N,32] encoded inputs and the
[N,4] (rgb, density) outputs.

Scope: the reference architecture exactly — 8x256 trunk, skip concat at layer
4, density channel on the last trunk layer (softplus), 128-wide view-dependent
rgb head (sigmoid). Positional encoding (+BARF c2f mask) happens OUTSIDE the
kernel in jnp (cheap, autodiffed), so the custom VJP only has to handle the
dense MLP: the backward kernel recomputes activations per block (VMEM-resident)
and accumulates weight gradients across the sequential TPU grid into
constant-mapped output blocks.

Weight layout (padded for the 128-lane MXU; zero-padding is applied by the
jnp wrapper and grads flow back through the unpad slice):
    W0  [64, 256]   (63-wide PE input + 1 zero column)
    W1..W3 [256,256]
    W4  [320, 256]  (skip concat: [h3(256); Xp(64)])
    W5, W6 [256,256]
    W7  [256, 384]  (col 0 = density, cols 1..256 = features, rest zero)
    Wr0 [288, 128]  ([feat(256); view_enc(32, 27 used)])
    Wr1 [128, 128]  (cols 0..2 = rgb, rest zero)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256          # points (rays*samples) per grid step (backward kernel)
FWD_BLK = 256      # measured best on v5e (larger blocks hurt DMA overlap)
N_TRUNK = 8        # trunk layers (reference arch.layers_feat)

# MXU operand dtype for the trunk/head matmuls (accumulation is always f32,
# via preferred_element_type). "bfloat16" roughly matches the effective
# precision of the reference on A100, where torch runs fp32 matmuls as TF32
# (10-bit mantissa) by default; "float32" is the bit-exact-parity mode.
# Plumbed EXPLICITLY through every kernel entry point as a static argument
# (a module global is read at trace time of the cached custom_vjp and
# silently ignores later changes — the round-2 bf16 experiment failed on
# exactly that, NOTES_r2.md:45-49).

# padded dims
D_IN = 64          # PE(3D) 63 -> 64
D_HID = 256
D_SKIP = 320       # 256 + 64
D_OUT7 = 384       # 257 -> 384
D_VIEW = 32        # PE(view) 27 -> 32
D_HEAD_IN = 288    # 256 + 32
D_HEAD = 128

_WEIGHT_SHAPES = dict(
    W0=(D_IN, D_HID), W1=(D_HID, D_HID), W2=(D_HID, D_HID), W3=(D_HID, D_HID),
    W4=(D_SKIP, D_HID), W5=(D_HID, D_HID), W6=(D_HID, D_HID),
    W7=(D_HID, D_OUT7), Wr0=(D_HEAD_IN, D_HEAD), Wr1=(D_HEAD, D_HEAD),
)
_BIAS_SHAPES = dict(
    b0=(1, D_HID), b1=(1, D_HID), b2=(1, D_HID), b3=(1, D_HID),
    b4=(1, D_HID), b5=(1, D_HID), b6=(1, D_HID), b7=(1, D_OUT7),
    br0=(1, D_HEAD), br1=(1, D_HEAD),
)
_ORDER = ["W0", "W1", "W2", "W3", "W4", "W5", "W6", "W7", "Wr0", "Wr1",
          "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "br0", "br1"]


# Kernel dots pin precision=DEFAULT explicitly: the framework sets the
# GLOBAL jax_default_matmul_precision to 'highest' for the XLA path
# (EVIDENCE_r3.md §4 — the INN warp needs it), and without the pin that
# global leaks into Mosaic's dot lowering at trace time, switching the
# in-kernel f32 matmuls to multi-pass fp32 — +2.4x matmul passes and a
# VMEM blow-up past the 16MB scoped limit at the bench shape. DEFAULT here
# is the kernels' round-2 behavior (bf16x3-class passes with f32
# accumulate), whose end-to-end adequacy is pinned by the on-device parity
# tests and the SE3-BARF recovery runs.
_KERNEL_PRECISION = jax.lax.Precision.DEFAULT


def _dot(a, b, cdt=jnp.float32):
    return jnp.dot(a.astype(cdt), b.astype(cdt),
                   preferred_element_type=jnp.float32,
                   precision=_KERNEL_PRECISION)


def _dot_tn(a, b, cdt=jnp.float32):
    """a^T @ b without materializing the transpose (MXU contraction dims)."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_KERNEL_PRECISION)


def _dot_nt(a, b, cdt=jnp.float32):
    """a @ b^T without materializing the transpose."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_KERNEL_PRECISION)


# The PE frequency projections must NOT run at DEFAULT precision: the MXU's
# bf16 operand pass costs ~2^-9 relative error on the POSITIONS, and the
# finest c2f band multiplies positions by 2^9*pi — turning that rounding
# into O(2pi) phase noise, i.e. the finest PE features become spatial
# garbage the moment the BARF c2f schedule opens them. Empirically this
# kicks a converged joint pose+field solution out of its basin at
# ~0.42*max_iter and resettles it ~8 deg off (r3 kick study, NOTES_r3).
# These dots have a contraction dim of only 3 (fwd) / 64 (bwd transpose),
# so HIGHEST (multi-pass f32) costs nothing measurable — unlike the big
# MLP dots, where the global 'highest' flag blew scoped VMEM (above).
_PE_PRECISION = jax.lax.Precision.HIGHEST


def _dot_pe(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_PE_PRECISION)


def _dot_nt_pe(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_PE_PRECISION)


def _forward_block(xp, view, w, keep=False, cdt=jnp.float32,
                   activ="softplus", noise=None):
    """Shared forward math on one block. Returns (out, cache-or-None).
    activ: static density activation, "softplus" (flagship configs) or
    "relu" (NeRF-paper *_repr configs). noise: optional [BLK] pre-activation
    density noise (the reference's density_noise_reg randn draw, generated
    OUTSIDE the kernel in XLA and passed in so forward and the backward
    recompute see identical values)."""
    hs = []
    h = jax.nn.relu(_dot(xp, w["W0"], cdt) + w["b0"])
    hs.append(h)
    for i in (1, 2, 3):
        h = jax.nn.relu(_dot(h, w["W{}".format(i)], cdt) + w["b{}".format(i)])
        hs.append(h)
    c4 = jnp.concatenate([h, xp], axis=-1)                    # [BLK, 320]
    h = jax.nn.relu(_dot(c4, w["W4"], cdt) + w["b4"])
    hs.append(h)
    for i in (5, 6):
        h = jax.nn.relu(_dot(h, w["W{}".format(i)], cdt) + w["b{}".format(i)])
        hs.append(h)
    t = _dot(h, w["W7"], cdt) + w["b7"]                       # [BLK, 384]
    density_pre = t[:, 0] if noise is None else t[:, 0] + noise
    feat = jax.nn.relu(t[:, 1:D_HID + 1])
    v = jnp.concatenate([feat, view], axis=-1)                # [BLK, 288]
    r0 = jax.nn.relu(_dot(v, w["Wr0"], cdt) + w["br0"])
    rgb_pre = _dot(r0, w["Wr1"], cdt) + w["br1"]              # [BLK, 128]
    rgb = jax.nn.sigmoid(rgb_pre[:, :3])
    density = (jax.nn.softplus(density_pre) if activ == "softplus"
               else jax.nn.relu(density_pre))
    out = jnp.concatenate([rgb, density[:, None]], axis=-1)   # [BLK, 4]
    cache = (hs, c4, t, feat, v, r0, rgb_pre) if keep else None
    return out, cache


def _fwd_kernel(cdt, activ, xp_ref, view_ref, *wrefs):
    out_ref = wrefs[-1]
    w = {name: wrefs[i][:] for i, name in enumerate(_ORDER)}
    out, _ = _forward_block(xp_ref[:], view_ref[:], w, cdt=cdt, activ=activ)
    out_ref[:] = out


def _mlp_backward(xp, view, w, g, accumulate, cdt=jnp.float32, fwd=None,
                  activ="softplus", noise=None):
    """Shared MLP backward on one block.

    Args:
        g: [n, 4] cotangents of (rgb, density).
        accumulate: fn(name, value) accumulating a weight/bias gradient.
        fwd: optional precomputed (out, cache) from _forward_block(keep=True)
             — callers that already ran the forward for this exact chunk
             (e.g. the composited kernel's per-chunk backward) pass it to
             avoid a duplicate recompute.
        noise: optional [n] pre-activation density noise — must be the SAME
             values the forward saw (the activation derivative is evaluated
             at the noised pre-activation).
    Returns:
        (dxp [n, D_IN], dview [n, D_VIEW])
    """
    n = xp.shape[0]
    out, cache = fwd if fwd is not None else _forward_block(
        xp, view, w, keep=True, cdt=cdt, activ=activ, noise=noise)
    hs, c4, t, feat, v, r0, rgb_pre = cache
    rgb = out[:, :3]

    # heads (pad instead of scatter: Pallas TPU has no scatter lowering)
    g_rgb_pre = jnp.pad(g[:, :3] * rgb * (1 - rgb),
                        ((0, 0), (0, D_HEAD - 3)))
    accumulate("Wr1", _dot_tn(r0, g_rgb_pre, cdt))
    accumulate("br1", jnp.sum(g_rgb_pre, axis=0, keepdims=True))
    g_r0 = _dot_nt(g_rgb_pre, w["Wr1"], cdt) * (r0 > 0)
    accumulate("Wr0", _dot_tn(v, g_r0, cdt))
    accumulate("br0", jnp.sum(g_r0, axis=0, keepdims=True))
    g_v = _dot_nt(g_r0, w["Wr0"], cdt)                              # [n, 288]
    g_feat = g_v[:, :D_HID]
    dview = g_v[:, D_HID:]

    # density head: softplus' = sigmoid(pre); relu' = 1[pre > 0] — evaluated
    # at the NOISED pre-activation when density_noise_reg is active
    pre = t[:, 0] if noise is None else t[:, 0] + noise
    g_density_pre = g[:, 3] * (jax.nn.sigmoid(pre) if activ == "softplus"
                               else (pre > 0).astype(jnp.float32))
    g_t = jnp.concatenate([
        g_density_pre[:, None],
        g_feat * (feat > 0),
        jnp.zeros((n, D_OUT7 - D_HID - 1), jnp.float32),
    ], axis=-1)
    accumulate("W7", _dot_tn(hs[6], g_t, cdt))
    accumulate("b7", jnp.sum(g_t, axis=0, keepdims=True))
    g_h = _dot_nt(g_t, w["W7"], cdt) * (hs[6] > 0)                  # grad at h6

    for i in (6, 5):
        accumulate("W{}".format(i), _dot_tn(hs[i - 1], g_h, cdt))
        accumulate("b{}".format(i), jnp.sum(g_h, axis=0, keepdims=True))
        g_h = _dot_nt(g_h, w["W{}".format(i)], cdt) * (hs[i - 1] > 0)

    # skip layer: input was c4 = [h3; xp]
    accumulate("W4", _dot_tn(c4, g_h, cdt))
    accumulate("b4", jnp.sum(g_h, axis=0, keepdims=True))
    g_c4 = _dot_nt(g_h, w["W4"], cdt)                               # [n, 320]
    g_xp = g_c4[:, D_HID:]
    g_h = g_c4[:, :D_HID] * (hs[3] > 0)

    for i in (3, 2, 1):
        accumulate("W{}".format(i), _dot_tn(hs[i - 1], g_h, cdt))
        accumulate("b{}".format(i), jnp.sum(g_h, axis=0, keepdims=True))
        g_h = _dot_nt(g_h, w["W{}".format(i)], cdt) * (hs[i - 1] > 0)

    accumulate("W0", _dot_tn(xp, g_h, cdt))
    accumulate("b0", jnp.sum(g_h, axis=0, keepdims=True))
    dxp = g_xp + _dot_nt(g_h, w["W0"], cdt)
    return dxp, dview


def _bwd_kernel(cdt, activ, xp_ref, view_ref, g_ref, *refs):
    """Recompute forward, backprop; accumulate dW/db across the grid."""
    w = {name: refs[i][:] for i, name in enumerate(_ORDER)}
    n_w = len(_ORDER)
    dxp_ref, dview_ref = refs[n_w], refs[n_w + 1]
    dw_refs = {name: refs[n_w + 2 + i] for i, name in enumerate(_ORDER)}

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for name in _ORDER:
            dw_refs[name][:] = jnp.zeros_like(dw_refs[name])

    def accumulate(name, value):
        dw_refs[name][:] += value

    dxp, dview = _mlp_backward(xp_ref[:], view_ref[:], w, g_ref[:],
                               accumulate, cdt=cdt, activ=activ)
    dxp_ref[:] = dxp
    dview_ref[:] = dview


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                        memory_space=pltpu.VMEM)


def _blk_spec(width, blk=BLK):
    return pl.BlockSpec((blk, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def resolve_compute_dtype(compute_dtype):
    """'float32'/'bfloat16' (or None) -> jnp dtype for the MXU operands."""
    return jnp.dtype(compute_dtype or "float32")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mlp(xp, view, weights, interpret=False, compute_dtype="float32",
              activ="softplus"):
    """Fused field MLP. xp: [N,64] encoded points; view: [N,32] encoded dirs;
    weights: dict of padded arrays (see module docstring); compute_dtype:
    static MXU operand dtype for the matmuls (f32 accumulation either way);
    activ: static density activation ("softplus"|"relu").
    Returns [N,4] = (rgb sigmoid, density activ). N must be a BLK multiple."""
    out, _ = _fused_fwd(xp, view, weights, interpret, compute_dtype, activ)
    return out


def _fused_fwd(xp, view, weights, interpret, compute_dtype, activ):
    N = xp.shape[0]
    assert N % BLK == 0, N
    fwd_blk = FWD_BLK if N % FWD_BLK == 0 else BLK
    grid = (N // fwd_blk,)
    w_list = [weights[k] for k in _ORDER]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, resolve_compute_dtype(compute_dtype),
                          activ),
        grid=grid,
        in_specs=[_blk_spec(D_IN, fwd_blk), _blk_spec(D_VIEW, fwd_blk)] +
                 [_full_spec(_WEIGHT_SHAPES.get(k) or _BIAS_SHAPES[k])
                  for k in _ORDER],
        out_specs=_blk_spec(4, fwd_blk),
        out_shape=jax.ShapeDtypeStruct((N, 4), jnp.float32),
        interpret=interpret,
    )(xp, view, *w_list)
    return out, (xp, view, weights)


def _fused_bwd(interpret, compute_dtype, activ, res, g):
    xp, view, weights = res
    N = xp.shape[0]
    grid = (N // BLK,)
    w_list = [weights[k] for k in _ORDER]
    out_shapes = (
        [jax.ShapeDtypeStruct((N, D_IN), jnp.float32),
         jax.ShapeDtypeStruct((N, D_VIEW), jnp.float32)] +
        [jax.ShapeDtypeStruct(_WEIGHT_SHAPES.get(k) or _BIAS_SHAPES[k],
                              jnp.float32) for k in _ORDER])
    out_specs = ([_blk_spec(D_IN), _blk_spec(D_VIEW)] +
                 [_full_spec(_WEIGHT_SHAPES.get(k) or _BIAS_SHAPES[k])
                  for k in _ORDER])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, resolve_compute_dtype(compute_dtype),
                          activ),
        grid=grid,
        in_specs=[_blk_spec(D_IN), _blk_spec(D_VIEW), _blk_spec(4)] +
                 [_full_spec(_WEIGHT_SHAPES.get(k) or _BIAS_SHAPES[k])
                  for k in _ORDER],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xp, view, g, *w_list)
    dxp, dview = outs[0], outs[1]
    dw = {k: outs[2 + i] for i, k in enumerate(_ORDER)}
    return dxp, dview, dw


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# jnp wrapper: pack reference params -> padded kernel weights, PE outside
# ---------------------------------------------------------------------------

def pack_weights(params):
    """Reference param pytree (ops.nerf_mlp layout) -> padded kernel weights.

    Differentiable (pure pad/concat), so gradients flow back to the original
    pytree through this function.
    """
    f = params["feat"]
    r = params["rgb"]
    def pad(w, rows, cols):
        return jnp.pad(w, ((0, rows - w.shape[0]), (0, cols - w.shape[1])))
    def padb(b, cols):
        return jnp.pad(b, (0, cols - b.shape[0]))[None]
    out = dict(
        W0=pad(f[0]["w"], D_IN, D_HID), b0=padb(f[0]["b"], D_HID),
        W1=pad(f[1]["w"], D_HID, D_HID), b1=padb(f[1]["b"], D_HID),
        W2=pad(f[2]["w"], D_HID, D_HID), b2=padb(f[2]["b"], D_HID),
        W3=pad(f[3]["w"], D_HID, D_HID), b3=padb(f[3]["b"], D_HID),
        W5=pad(f[5]["w"], D_HID, D_HID), b5=padb(f[5]["b"], D_HID),
        W6=pad(f[6]["w"], D_HID, D_HID), b6=padb(f[6]["b"], D_HID),
    )
    # skip layer input order: reference concatenates [feat, points_enc]
    # with points_enc 63-wide; kernel uses [h3(256); xp(64)]
    w4 = f[4]["w"]                                   # [256+63, 256]
    w4_h = w4[:D_HID]
    w4_x = jnp.pad(w4[D_HID:], ((0, D_IN - (w4.shape[0] - D_HID)), (0, 0)))
    out["W4"] = jnp.concatenate([w4_h, w4_x], axis=0)
    out["b4"] = padb(f[4]["b"], D_HID)
    # last trunk layer: reference column 0 is density, 1.. are features
    out["W7"] = pad(f[7]["w"], D_HID, D_OUT7)
    out["b7"] = padb(f[7]["b"], D_OUT7)
    # rgb head layer 0: [feat(256); view_enc(27->32)]
    wr0 = r[0]["w"]                                  # [256+27, 128]
    wr0_f = wr0[:D_HID]
    wr0_v = jnp.pad(wr0[D_HID:], ((0, D_VIEW - (wr0.shape[0] - D_HID)), (0, 0)))
    out["Wr0"] = jnp.concatenate([wr0_f, wr0_v], axis=0)
    out["br0"] = padb(r[0]["b"], D_HEAD)
    out["Wr1"] = pad(r[1]["w"], D_HEAD, D_HEAD)
    out["br1"] = padb(r[1]["b"], D_HEAD)
    return out


def fused_apply_nerf_samples(params, arch, center, ray, depth, *,
                             view_dep=True, density_activ="softplus",
                             progress=None, barf_c2f=None,
                             density_noise_reg=None, noise_key=None,
                             interpret=False, compute_dtype="float32"):
    """Drop-in for ops.nerf_mlp.apply_nerf_samples using the fused kernel.

    Requirements (reference default arch): layers_feat 8x256 skip [4],
    layers_rgb [*,128,3], posenc L_3D=10/L_view=4, view_dep, softplus or
    relu density.
    """
    from .. import posenc as posenc_ops
    assert density_activ in ("softplus", "relu") and view_dep
    B, R = center.shape[0], center.shape[1]
    K = depth.shape[2]
    pts = center[..., None, :] + ray[..., None, :] * depth      # [B,R,K,3]
    ray_unit = ray / jnp.clip(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                              1e-12, None)
    ray_unit = jnp.broadcast_to(ray_unit[..., None, :], pts.shape)
    # encode outside the kernel (autodiffed)
    enc3d = posenc_ops.positional_encoding_c2f(pts, arch.posenc.L_3D,
                                               progress, barf_c2f)
    xp = jnp.concatenate([pts, enc3d], axis=-1).reshape(-1, 63)
    encv = posenc_ops.positional_encoding_c2f(ray_unit, arch.posenc.L_view,
                                              progress, barf_c2f)
    vi = jnp.concatenate([ray_unit, encv], axis=-1).reshape(-1, 27)
    N = xp.shape[0]
    N_pad = -(-N // FWD_BLK) * FWD_BLK if N >= FWD_BLK else -(-N // BLK) * BLK
    xp = jnp.pad(xp, ((0, N_pad - N), (0, D_IN - 63)))
    vi = jnp.pad(vi, ((0, N_pad - N), (0, D_VIEW - 27)))
    out = fused_mlp(xp, vi, pack_weights(params), interpret,
                    compute_dtype, density_activ)[:N]
    rgb = out[:, :3].reshape(B, R, K, 3)
    density = out[:, 3].reshape(B, R, K)
    if density_noise_reg and noise_key is not None:
        # reference adds the noise BEFORE the density activation; matching that
        # inside the kernel would need the noise as an input — keep the fused
        # path for noise-free configs and fall back otherwise (system checks).
        raise NotImplementedError("density_noise_reg with fused kernel")
    return rgb, density


def supports(arch, opt_nerf):
    """Whether the fused kernel covers this configuration."""
    try:
        return (list(arch.layers_feat) == [None] + [256] * 8
                and list(arch.layers_rgb) == [None, 128, 3]
                and list(arch.skip) == [4]
                and arch.posenc and arch.posenc.L_3D == 10
                and arch.posenc.L_view == 4
                and arch.get("density_activ", "softplus") in ("softplus",
                                                              "relu")
                and opt_nerf.view_dep)
        # NB density_noise_reg is deliberately NOT checked here: since r4 the
        # pre-activation noise rides into every PE kernel as a lane-dense
        # [R,K] operand (drawn in XLA, bitwise the jnp draw), so noise-active
        # TRAIN calls stay on the fused kernels; only the noise-FREE eval
        # kernel path gates on it at the call site (models/system.py).
    except Exception:
        return False
