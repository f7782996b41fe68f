"""On-device A/B of the fine-sampling EVAL path (round 4).

Renders the same rays through ``NerfSystem.render_rays(mode="eval")`` with
the fused kernels on (default) and off (--tpu.fused_raymarch! etc.) at the
blender_fine shape (64 coarse + 192-sample fine, relu density) and reports
max|delta| / PSNR-style agreement plus wall-clock per render call.

DECISION 2026-08-19: an experimental eval branch routing the fine net
through the forward-only composited rm kernel at K=192 measured **45.0 ms
vs 12.5 ms per 1024-ray render** (3.6x SLOWER than the SoA field kernel +
XLA compositing) with 55.6 dB agreement (CDF-resample amplification of the
coarse-path jnp-vs-kernel deltas). The branch was reverted the same day —
training keeps the one-call train kernel (its start cost amortizes over the
fused backward; a forward-only call's does not), eval keeps SoA. This tool
remains as the A/B instrument; it now reports instead of asserting.

Usage: python tools/check_fine_eval_fused.py  (runs on the default platform —
the real TPU under axon).
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.models import get_system_class


def build(fused):
    opt = config.load_options("options/nerf_blender_repr.yaml")
    over = config.parse_arguments([
        "--model=nerf", "--yaml=nerf_blender_repr",
        "--data.image_size=[64,64]",
        "--nerf.rand_rays=1024", "--nerf.sample_stratified!",
    ] + ([] if fused else ["--tpu.fused_kernel!", "--tpu.fused_pe!",
                           "--tpu.fused_raymarch!", "--tpu.fused_train!"]))
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 64, 64
    rng = np.random.RandomState(0)
    arrays = dict(
        image=rng.rand(2, 64, 64, 3).astype(np.float32),
        intr=np.tile(np.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]],
                              np.float32), (2, 1, 1)),
        pose=np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1)),
        idx=np.arange(2, dtype=np.int32))
    system = get_system_class("nerf")(opt)
    system.attach_data(dict(arrays), dict(arrays))
    state = system.init_state(jax.random.PRNGKey(0))
    return system, state


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    rng = np.random.RandomState(7)
    B, R = 1, 1024
    center = jnp.asarray(rng.randn(B, R, 3).astype(np.float32) * 0.1)
    ray = jnp.asarray(
        (rng.randn(B, R, 3) * 0.2 + np.array([0, 0, 1.0])).astype(np.float32))

    outs = {}
    for fused in (True, False):
        system, state = build(fused)
        fn = jax.jit(lambda p, c, r: system.render_rays(
            p, c, r, jax.random.PRNGKey(3), mode="eval", progress=0.7))
        out = fn(state["params"], center, ray)
        rgbf = np.asarray(out["rgb_fine"])
        t0 = time.time()
        for _ in range(20):
            out = fn(state["params"], center, ray)
        _ = float(out["rgb_fine"][0, 0, 0])   # hard sync through the tunnel
        dt = (time.time() - t0) / 20
        outs[fused] = (rgbf, np.asarray(out["depth_fine"]), dt)
        print("fused={}: mode={}, {:.2f} ms/render-call".format(
            fused, system._use_fused_field(), dt * 1e3), flush=True)

    (rf, df, _), (rr, dr, _) = outs[True], outs[False]
    d_rgb = float(np.max(np.abs(rf - rr)))
    d_dep = float(np.max(np.abs(df - dr)))
    mse = float(np.mean((rf - rr) ** 2))
    psnr = -10 * np.log10(mse) if mse > 0 else float("inf")
    print("rgb_fine max|delta| {:.3e}  agreement {:.1f} dB  "
          "depth_fine max|delta| {:.3e}".format(d_rgb, psnr, d_dep))


if __name__ == "__main__":
    main()
