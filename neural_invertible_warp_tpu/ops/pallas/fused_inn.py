"""Fused INN deformation warp as a Pallas TPU kernel.

The XLA path (ops/inn.py::deform_forward) runs the 3-block coupling network
as ~50 small ops on [B,N,*] tensors; at the bench shape that is ~0.4 ms/step
of fixed per-op overhead plus its share of scheduler idle (r3 profile) for
~2 GFLOP of actual work. This kernel evaluates all three coupling blocks in
one pallas_call (forward) and one for the backward, with the whole chain
VMEM-resident — including WEIGHT NORMALIZATION, so the XLA side streams the
raw (v, g, b) parameters with zero per-step preprocessing (the first fused
version folded/normalized weights in XLA each step: ~30 small ops that ate
the whole win).

Key restructurings (everything stays wide or folds into matmuls — the
round-1 raymarch lesson: narrow per-coordinate lane concats fragment in
Mosaic):

* The annealed-PE "reference" row-window (posenc.annealed_embed_reference)
  is a PER-ROW scalar, so it commutes with the first-layer matmul:
  (rw * emb) @ W == rw * (emb @ W). The [N] row weights are computed
  outside (traced alpha_ratio) and streamed as a [P,1] column.
* The PE evaluation keeps the embed's OWN column order (per band l:
  sin_l over dims, cos_l over dims), so the first-layer weight splits into
  three CONTIGUOUS row slices (raw dims / PE bands / latent):
      ang[:, col]  = 2^l*pi * x_d          (one-hot broadcast-muls, exact)
      trig         = msin*sin(ang) + mcos*cos(ang)
      E            = x@W[:D] + trig@W[D:D+2LD] + code@W[-d_feat:]
  No embed concat and no weight-row gather exist anywhere.
* Weight normalization W = v*g/||v||_col runs per grid step in-kernel
  (column norms are [1,128] sublane reduces); its backward runs as a
  LAST-grid-step epilogue on the accumulated dW.

Forward math per block (reference model/nvp/nvp_ndr.py:348-468, functional
form in ops/inn.py):
    s       = MLP_a([emb(other)*rw2, code])       focus' = focus - s
    (th, t) = MLP_b([emb(focus')*rw1, code])
    other'  = R(-th) @ (other - t)
The backward kernel recomputes the forward per block and applies the exact
reverse chain (d_theta = do0'*o1' - do1'*o0', rotation transpose, MLP
transposes), accumulating weight gradients across the grid like
fused_field.py.

Scope: multires=6, actfn=softplus(beta=100), n_layers=1 (the paper
configuration, reference model/barf_inn_llff.py:54-55), anneal="reference".
The wrapper falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fused_field as ff

P_BLK = 512          # points per grid step
D_HID = 128
D_OUT = 8            # padded MLP output lanes (a uses col 0; b uses 0..2)
def _rows_a(d_feat):       # 2 raw + 24 PE + d_feat latent, padded to 8
    return -(-(2 + 24 + d_feat) // 8) * 8


def _rows_b(d_feat):       # 1 raw + 12 PE + d_feat latent, padded to 8
    return -(-(1 + 12 + d_feat) // 8) * 8

# (focus_axis, other_axes) per block index (ops/inn.py::_AXES for 3 blocks)
_BLOCK_AXES = [(2, (0, 1)), (1, (0, 2)), (0, (1, 2))]


def _pe_consts(multires, D):
    """Angle matrix + sin/cos column masks in the EMBED's own column order:
    col (l*2 + s)*D + d holds angle 2^l*pi*x_d, s=0 -> sin, s=1 -> cos."""
    n = 2 * multires * D
    F = np.zeros((D, n), np.float32)
    msin = np.zeros((1, n), np.float32)
    mcos = np.zeros((1, n), np.float32)
    for l in range(multires):
        for s in range(2):
            for d in range(D):
                j = (l * 2 + s) * D + d
                F[d, j] = np.float32(2.0 ** l) * np.float32(np.pi)
                (msin if s == 0 else mcos)[0, j] = 1.0
    return F, msin, mcos


def _act(x):
    return jax.nn.softplus(100.0 * x) / 100.0


def _act_d(x):
    return jax.nn.sigmoid(100.0 * x)


# per block i, branch x in {a, b}: raw weight-normalized first layer
# (v [ROWS,128], g [1,128], b0 [1,128]) + plain output layer (w1 [128,8],
# b1 [1,8]); row layout of v: [raw dims | PE bands | latent | zero pad]
_W_NAMES = []
for _i in range(3):
    for _br in ("a", "b"):
        _W_NAMES += ["{}_v{}".format(_br, _i), "{}_g{}".format(_br, _i),
                     "{}_b0{}".format(_br, _i), "{}_w1{}".format(_br, _i),
                     "{}_b1{}".format(_br, _i)]


def _w_shapes(d_feat):
    sh = {}
    for i in range(3):
        for br, rows in (("a", _rows_a(d_feat)), ("b", _rows_b(d_feat))):
            sh["{}_v{}".format(br, i)] = (rows, D_HID)
            sh["{}_g{}".format(br, i)] = (1, D_HID)
            sh["{}_b0{}".format(br, i)] = (1, D_HID)
            sh["{}_w1{}".format(br, i)] = (D_HID, D_OUT)
            sh["{}_b1{}".format(br, i)] = (1, D_OUT)
    return sh


def _wn(v, g):
    """Effective weight-normalized matrix (ops/inn.py::_wn_weight; padded
    rows are zero and do not perturb the column norms)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    return v * (g / jnp.maximum(norm, 1e-12))


def _wn_bwd(dW, v, g):
    """(dW, v, g) -> (dv, dg) for W = v*g/max(||v||_col, 1e-12)."""
    norm = jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)),
                       1e-12)
    s = g / norm
    t = jnp.sum(dW * v, axis=0, keepdims=True)          # [1,128]
    dg = t / norm
    dv = dW * s - v * (g * t / (norm * norm * norm))
    return dv, dg


def _block_forward(i, L, w, code, x0, x1, x2, rw1, rw2, consts, keep=False):
    """One coupling block on column triple (x0,x1,x2). Returns new triple
    (+ cache when keep)."""
    F2, ms2, mc2, F1, ms1, mc1 = consts
    fx, (oa, ob) = _BLOCK_AXES[i]
    cols = [x0, x1, x2]
    focus = cols[fx]
    o0, o1 = cols[oa], cols[ob]
    Wa = _wn(w["a_v{}".format(i)], w["a_g{}".format(i)])      # [160,128]
    Wb = _wn(w["b_v{}".format(i)], w["b_g{}".format(i)])      # [144,128]
    n2 = 4 * L                                                # 24
    n1 = 2 * L                                                # 12
    # branch a
    ang2 = o0 * F2[0:1] + o1 * F2[1:2]                        # [p,24]
    s2, c2 = jnp.sin(ang2), jnp.cos(ang2)
    trig2 = ms2 * s2 + mc2 * c2
    d_feat = code.shape[1]
    # the row window scales ONLY the embed part (the latent columns of h
    # are not windowed in annealed_embed_reference)
    Ea = o0 * Wa[0:1] + o1 * Wa[1:2] + ff._dot(trig2, Wa[2:2 + n2])
    ha_pre = rw2 * Ea + ff._dot(code, Wa[2 + n2:2 + n2 + d_feat]) \
        + w["a_b0{}".format(i)]
    ha = _act(ha_pre)
    sa = ff._dot(ha, w["a_w1{}".format(i)]) + w["a_b1{}".format(i)]  # [p,8]
    focus_n = focus - sa[:, 0:1]
    # branch b
    ang1 = focus_n * F1[0:1]                                  # [p,12]
    s1, c1 = jnp.sin(ang1), jnp.cos(ang1)
    trig1 = ms1 * s1 + mc1 * c1
    Eb = focus_n * Wb[0:1] + ff._dot(trig1, Wb[1:1 + n1])
    hb_pre = rw1 * Eb + ff._dot(code, Wb[1 + n1:1 + n1 + d_feat]) \
        + w["b_b0{}".format(i)]
    hb = _act(hb_pre)
    out = ff._dot(hb, w["b_w1{}".format(i)]) + w["b_b1{}".format(i)]  # [p,8]
    th = out[:, 0:1]
    t0, t1 = out[:, 1:2], out[:, 2:3]
    cth, sth = jnp.cos(th), jnp.sin(th)
    u0, u1 = o0 - t0, o1 - t1
    on0 = cth * u0 + sth * u1
    on1 = -sth * u0 + cth * u1
    cols_n = [None, None, None]
    cols_n[fx] = focus_n
    cols_n[oa], cols_n[ob] = on0, on1
    cache = (o0, o1, s2, c2, trig2, ha_pre, ha, focus_n, s1, c1, trig1,
             hb_pre, hb, cth, sth, on0, on1, Wa, Wb) if keep else None
    return cols_n[0], cols_n[1], cols_n[2], cache


def _fwd_kernel(multires, pts_ref, rw1_ref, rw2_ref, c0_ref, c1_ref, c2_ref,
                F2_ref, ms2_ref, mc2_ref, F1_ref, ms1_ref, mc1_ref, *refs):
    out_ref = refs[-1]
    w = {name: refs[j][:] for j, name in enumerate(_W_NAMES)}
    pts = pts_ref[:]
    x0, x1, x2 = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]
    rw1, rw2 = rw1_ref[:], rw2_ref[:]
    codes = (c0_ref[:], c1_ref[:], c2_ref[:])
    consts = (F2_ref[:], ms2_ref[:], mc2_ref[:],
              F1_ref[:], ms1_ref[:], mc1_ref[:])
    for i in range(3):
        x0, x1, x2, _ = _block_forward(i, multires, w, codes[i], x0, x1, x2,
                                       rw1, rw2, consts)
    out_ref[:] = jnp.concatenate([x0, x1, x2], axis=1)


def _block_backward(i, L, w, code, cache, dxc, rw1, rw2, consts, acc):
    """Reverse one block: output-column cotangents -> input-column
    cotangents + dcode; accumulates dW (post-normalization) per tensor."""
    F2, ms2, mc2, F1, ms1, mc1 = consts
    fx, (oa, ob) = _BLOCK_AXES[i]
    (o0, o1, s2, c2, trig2, ha_pre, ha, focus_n, s1, c1, trig1,
     hb_pre, hb, cth, sth, on0, on1, Wa, Wb) = cache
    n2, n1 = 4 * L, 2 * L
    d_feat = code.shape[1]
    dfocus_n = dxc[fx]
    don0, don1 = dxc[oa], dxc[ob]
    # rotation backward
    dth = don0 * on1 - don1 * on0
    du0 = cth * don0 - sth * don1
    du1 = sth * don0 + cth * don1
    do0, do1 = du0, du1
    n = dth.shape[0]
    dout = jnp.concatenate(
        [dth, -du0, -du1, jnp.zeros((n, D_OUT - 3), jnp.float32)], axis=1)
    acc("b_w1{}".format(i), ff._dot_tn(hb, dout))
    acc("b_b1{}".format(i), jnp.sum(dout, axis=0, keepdims=True))
    dhb = ff._dot_nt(dout, w["b_w1{}".format(i)]) * _act_d(hb_pre)
    acc("b_b0{}".format(i), jnp.sum(dhb, axis=0, keepdims=True))
    dEb = rw1 * dhb                  # window applies to the embed part only
    # dWb rows: [focus_n | trig1 | code | zero pad]
    dWb = jnp.concatenate(
        [ff._dot_tn(focus_n, dEb), ff._dot_tn(trig1, dEb),
         ff._dot_tn(code, dhb),
         jnp.zeros((_rows_b(d_feat) - 1 - n1 - d_feat, D_HID),
                   jnp.float32)], axis=0)
    acc("b_v{}".format(i), dWb)      # post-wn dW; epilogue converts to dv,dg
    dcode = ff._dot_nt(dhb, Wb[1 + n1:1 + n1 + d_feat])
    dtrig1 = ff._dot_nt(dEb, Wb[1:1 + n1])
    dang1 = dtrig1 * (ms1 * c1 - mc1 * s1)
    dfocus_n = dfocus_n \
        + jnp.sum(dEb * Wb[0:1], axis=1, keepdims=True) \
        + jnp.sum(dang1 * F1[0:1], axis=1, keepdims=True)
    # focus' = focus - sa[:,0]
    dsa = jnp.concatenate(
        [-dfocus_n, jnp.zeros((n, D_OUT - 1), jnp.float32)], axis=1)
    acc("a_w1{}".format(i), ff._dot_tn(ha, dsa))
    acc("a_b1{}".format(i), jnp.sum(dsa, axis=0, keepdims=True))
    dha = ff._dot_nt(dsa, w["a_w1{}".format(i)]) * _act_d(ha_pre)
    acc("a_b0{}".format(i), jnp.sum(dha, axis=0, keepdims=True))
    dEa = rw2 * dha                  # window applies to the embed part only
    dWa = jnp.concatenate(
        [ff._dot_tn(o0, dEa), ff._dot_tn(o1, dEa), ff._dot_tn(trig2, dEa),
         ff._dot_tn(code, dha),
         jnp.zeros((_rows_a(d_feat) - 2 - n2 - d_feat, D_HID),
                   jnp.float32)], axis=0)
    acc("a_v{}".format(i), dWa)
    dcode = dcode + ff._dot_nt(dha, Wa[2 + n2:2 + n2 + d_feat])
    dtrig2 = ff._dot_nt(dEa, Wa[2:2 + n2])
    dang2 = dtrig2 * (ms2 * c2 - mc2 * s2)
    do0 = do0 + jnp.sum(dEa * Wa[0:1], axis=1, keepdims=True) \
        + jnp.sum(dang2 * F2[0:1], axis=1, keepdims=True)
    do1 = do1 + jnp.sum(dEa * Wa[1:2], axis=1, keepdims=True) \
        + jnp.sum(dang2 * F2[1:2], axis=1, keepdims=True)
    dxp = [None, None, None]
    dxp[fx] = dfocus_n
    dxp[oa], dxp[ob] = do0, do1
    return dxp, dcode


def _bwd_kernel(multires, n_steps, pts_ref, rw1_ref, rw2_ref, c0_ref,
                c1_ref, c2_ref, F2_ref, ms2_ref, mc2_ref, F1_ref, ms1_ref,
                mc1_ref, g_ref, *refs):
    w = {name: refs[j][:] for j, name in enumerate(_W_NAMES)}
    n_w = len(_W_NAMES)
    dpts_ref = refs[n_w]
    dc_refs = (refs[n_w + 1], refs[n_w + 2], refs[n_w + 3])
    dw_refs = {name: refs[n_w + 4 + j] for j, name in enumerate(_W_NAMES)}

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for name in _W_NAMES:
            dw_refs[name][:] = jnp.zeros_like(dw_refs[name])

    def acc(name, value):
        dw_refs[name][:] += value

    pts = pts_ref[:]
    x0, x1, x2 = pts[:, 0:1], pts[:, 1:2], pts[:, 2:3]
    rw1, rw2 = rw1_ref[:], rw2_ref[:]
    codes = (c0_ref[:], c1_ref[:], c2_ref[:])
    consts = (F2_ref[:], ms2_ref[:], mc2_ref[:],
              F1_ref[:], ms1_ref[:], mc1_ref[:])
    caches = []
    for i in range(3):
        x0, x1, x2, cache = _block_forward(i, multires, w, codes[i],
                                           x0, x1, x2, rw1, rw2, consts,
                                           keep=True)
        caches.append(cache)
    g = g_ref[:]
    dxc = [g[:, 0:1], g[:, 1:2], g[:, 2:3]]
    for i in reversed(range(3)):
        dxc, dcode = _block_backward(i, multires, w, codes[i], caches[i],
                                     dxc, rw1, rw2, consts, acc)
        dc_refs[i][:] = dcode
    dpts_ref[:] = jnp.concatenate(dxc, axis=1)

    # last-step epilogue: convert the accumulated post-normalization dW
    # (stored in the *_v refs) into (dv, dg) through the weight-norm chain
    @pl.when(step == n_steps - 1)
    def _epilogue():
        for i in range(3):
            for br in ("a", "b"):
                vn, gn = "{}_v{}".format(br, i), "{}_g{}".format(br, i)
                dv, dg = _wn_bwd(dw_refs[vn][:], w[vn], w[gn])
                dw_refs[vn][:] = dv
                dw_refs[gn][:] = dg


def _specs(d_feat, p_blk):
    col = pl.BlockSpec((p_blk, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    pts = pl.BlockSpec((p_blk, 3), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    code = pl.BlockSpec((p_blk, d_feat), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    sh = _w_shapes(d_feat)
    w_specs = [ff._full_spec(sh[k]) for k in _W_NAMES]
    return pts, col, code, w_specs, sh


def _const_specs(L):
    return [ff._full_spec((2, 4 * L)), ff._full_spec((1, 4 * L)),
            ff._full_spec((1, 4 * L)), ff._full_spec((1, 2 * L)),
            ff._full_spec((1, 2 * L)), ff._full_spec((1, 2 * L))]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_deform(pts, rw1, rw2, codes, multires, interpret, weights):
    """Fused 3-block INN warp. pts [P,3]; rw1/rw2 [P,1] row windows;
    codes: 3x [P,d_feat] per-block latent rows; weights: raw padded
    (v,g,b0,w1,b1) dict (_w_shapes — weight normalization happens
    in-kernel). Returns warped [P,3]. P must be a P_BLK multiple."""
    out, _ = _fused_deform_fwd(pts, rw1, rw2, codes, multires, interpret,
                               weights)
    return out


def _pe_operands(multires):
    F2, ms2, mc2 = _pe_consts(multires, 2)
    F1, ms1, mc1 = _pe_consts(multires, 1)
    return [jnp.asarray(x) for x in (F2, ms2, mc2, F1, ms1, mc1)]


def _fused_deform_fwd(pts, rw1, rw2, codes, multires, interpret, weights):
    P = pts.shape[0]
    d_feat = codes[0].shape[1]
    assert P % P_BLK == 0, (P, P_BLK)
    grid = (P // P_BLK,)
    pts_s, col_s, code_s, w_specs, sh = _specs(d_feat, P_BLK)
    w_list = [weights[k] for k in _W_NAMES]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, multires),
        grid=grid,
        in_specs=[pts_s, col_s, col_s, code_s, code_s, code_s] +
                 _const_specs(multires) + w_specs,
        out_specs=pts_s,
        out_shape=jax.ShapeDtypeStruct((P, 3), jnp.float32),
        interpret=interpret,
    )(pts, rw1, rw2, codes[0], codes[1], codes[2],
      *_pe_operands(multires), *w_list)
    return out, (pts, rw1, rw2, codes, weights)


def _fused_deform_bwd(multires, interpret, res, g):
    pts, rw1, rw2, codes, weights = res
    P = pts.shape[0]
    d_feat = codes[0].shape[1]
    grid = (P // P_BLK,)
    pts_s, col_s, code_s, w_specs, sh = _specs(d_feat, P_BLK)
    w_list = [weights[k] for k in _W_NAMES]
    out_shapes = ([jax.ShapeDtypeStruct((P, 3), jnp.float32)] +
                  [jax.ShapeDtypeStruct((P, d_feat), jnp.float32)] * 3 +
                  [jax.ShapeDtypeStruct(sh[k], jnp.float32)
                   for k in _W_NAMES])
    out_specs = [pts_s, code_s, code_s, code_s] + w_specs
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, multires, P // P_BLK),
        grid=grid,
        in_specs=[pts_s, col_s, col_s, code_s, code_s, code_s] +
                 _const_specs(multires) + [pts_s] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(pts, rw1, rw2, codes[0], codes[1], codes[2],
      *_pe_operands(multires), g, *w_list)
    dpts = outs[0]
    dcodes = (outs[1], outs[2], outs[3])
    dw = {k: outs[4 + j] for j, k in enumerate(_W_NAMES)}
    return (dpts, jnp.zeros_like(rw1), jnp.zeros_like(rw2), dcodes, dw)


fused_deform.defvjp(_fused_deform_fwd, _fused_deform_bwd)


# ---------------------------------------------------------------------------
# wrapper: ops.inn.deform_forward drop-in (anneal="reference" only)
# ---------------------------------------------------------------------------

def supports(params, multires, actfn, anneal):
    blocks = params["blocks"]
    return (anneal == "reference" and actfn == "softplus" and multires == 6
            and len(blocks) == 3
            and all(len(b["a"]) == 2 and len(b["b"]) == 2 for b in blocks))


def pack_params(params):
    """Reference INN pytree -> raw padded kernel dict (pure pad, exact,
    differentiable — gradients flow back through the unpad slice)."""
    out = {}
    d_feat = (params["blocks"][0]["a"][0]["v"].shape[0] - 26)
    for i, block in enumerate(params["blocks"]):
        for br, rows in (("a", _rows_a(d_feat)), ("b", _rows_b(d_feat))):
            l0, l1 = block[br][0], block[br][1]
            out["{}_v{}".format(br, i)] = jnp.pad(
                l0["v"], ((0, rows - l0["v"].shape[0]), (0, 0)))
            out["{}_g{}".format(br, i)] = l0["g"][None]
            out["{}_b0{}".format(br, i)] = l0["b"][None]
            out["{}_w1{}".format(br, i)] = jnp.pad(
                l1["w"], ((0, 0), (0, D_OUT - l1["w"].shape[1])))
            out["{}_b1{}".format(br, i)] = jnp.pad(
                l1["b"], (0, D_OUT - l1["b"].shape[0]))[None]
    return out


def _row_windows(N, D, multires, alpha_ratio, dtype=jnp.float32):
    """The reference row-window (posenc.annealed_embed_reference) as a [N]
    vector (shared across images)."""
    i = jnp.arange(multires, dtype=dtype)
    w = (1 - jnp.cos(np.pi * jnp.clip(alpha_ratio * multires - i,
                                      0.0, 1.0))) * 0.5
    rows = jnp.arange(N)
    row_w = jnp.ones((N,), dtype)
    for b in range(multires):
        lo, hi = (2 * b + 1) * D, (2 * b + 3) * D
        in_band = (rows >= lo) & (rows < hi)
        row_w = row_w * jnp.where(in_band, w[b], 1.0)
    return row_w


def fused_deform_forward(params, code, pts, alpha_ratio, *, multires=6,
                         actfn="softplus", anneal="reference",
                         interpret=False):
    """Drop-in for ops.inn.deform_forward on the supported configuration.

    code: [B,D]; pts: [B,N,3] -> [B,N,3].
    """
    from ..inn import _block_code
    B, N = pts.shape[0], pts.shape[1]
    P = B * N
    pad = (-P) % P_BLK
    flat = pts.reshape(P, 3)
    rw1 = jnp.tile(_row_windows(N, 1, multires, alpha_ratio), (B,))[:, None]
    rw2 = jnp.tile(_row_windows(N, 2, multires, alpha_ratio), (B,))[:, None]
    codes = []
    for block in params["blocks"]:
        code_ib = _block_code(block, code)           # [B,D]
        codes.append(jnp.repeat(code_ib, N, axis=0))  # [P,D]
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, 3), flat.dtype)], axis=0)
        rw1 = jnp.concatenate([rw1, jnp.ones((pad, 1), rw1.dtype)], axis=0)
        rw2 = jnp.concatenate([rw2, jnp.ones((pad, 1), rw2.dtype)], axis=0)
        codes = [jnp.concatenate(
            [c, jnp.zeros((pad, c.shape[1]), c.dtype)], axis=0)
            for c in codes]
    out = fused_deform(flat, rw1, rw2, tuple(codes), multires,
                       interpret, pack_params(params))
    return out[:P].reshape(B, N, 3)
