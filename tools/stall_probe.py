"""Pin down the in-program kernel-start stall (NOTES_r3 Mosaic writeup,
VERDICT r3 Next #4).

Measures the one-call train kernel (fused_mlp_pe_rm_train, the flagship's
dominant cost) at the bench shape inside ONE jit program as a lax.scan of
N links, in three regimes:

  serial     — each link's input depends on the previous link's loss
               (the real training step's regime: pose update -> next warp)
  pipelined  — links are independent (what back-to-back host dispatches
               measured in r3: cross-call overlap hides the start stall)
  serial, split-k — each link issues k INDEPENDENT kernels over 1/k of the
               rays; links remain serially dependent. If Mosaic overlaps
               the k dispatches' prologues, the per-link stall amortizes.

Usage: python tools/stall_probe.py [--steps 50] [--reps 5] [--splits 1,2,4]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--splits", default="1,2,4")
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--samples", type=int, default=128)
    # the scan wrapper's stack costs ~0.7M more scoped VMEM than the real
    # train program; SUB=512 (the production setting) exceeds the 16M limit
    # here, so the probe defaults to 256 (r3 sweep: 512 beats 256 by
    # ~0.64 ms absolute on this kernel family — the serial/pipelined/split
    # STRUCTURE transfers)
    ap.add_argument("--mlp-sub", type=int, default=256)
    ap.add_argument("--r-blk", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.dotdict import DotDict
    from neural_invertible_warp_tpu.ops import nerf_mlp
    from neural_invertible_warp_tpu.ops.pallas import fused_field as ff
    from neural_invertible_warp_tpu.ops.pallas import fused_pe as fp

    ARCH = DotDict(dict(
        layers_feat=[None] + [256] * 8, layers_rgb=[None, 128, 3], skip=[4],
        posenc=dict(L_3D=10, L_view=4), density_activ="softplus",
        tf_init=True))
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), ARCH)
    w = jax.tree_util.tree_map(jnp.asarray, ff.pack_weights(params))

    R, K = args.rays, args.samples
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(R, 3).astype(np.float32) * 0.2)
    r = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    d = jnp.asarray(np.sort(rng.rand(R, K), 1).astype(np.float32) * 3 + 1)
    t8 = jnp.concatenate(
        [jnp.asarray(rng.rand(R, 3).astype(np.float32)),
         jnp.ones((R, 1), jnp.float32),
         jnp.zeros((R, 4), jnp.float32)], axis=1)
    masks = tuple(jax.lax.stop_gradient(m) for m in fp.pe_mask_rows(1.0, None))
    cdt = "float32"
    fp.set_ray_block(args.r_blk)
    fp.set_mlp_sub(args.mlp_sub)

    def one_link(c_eff, split):
        n = R // split
        sq = 0.0
        for s in range(split):
            sl = slice(s * n, (s + 1) * n)
            sq_s, _ = fp.fused_mlp_pe_rm_train(
                c_eff[sl], r[sl], d[sl], t8[sl], False, cdt, None, masks, w)
            sq = sq + sq_s
        return sq

    def make(split, serial):
        def body(carry, _):
            # serial: next link's centers depend on this link's loss (the
            # training regime). pipelined: no dependency between links.
            c_eff = c * (1.0 + 1e-12 * carry) if serial else c
            sq = one_link(c_eff, split)
            return (sq if serial else carry), sq
        def run():
            _, sqs = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=args.steps)
            return jnp.sum(sqs)
        return jax.jit(run)

    def timeit(fn):
        float(fn())          # compile + warm (hard sync via value fetch)
        t0 = time.time()
        for _ in range(args.reps):
            v = fn()
        float(v)
        return (time.time() - t0) / args.reps / args.steps * 1000

    base = None
    for split in (int(x) for x in args.splits.split(",")):
        t_ser = timeit(make(split, True))
        t_pip = timeit(make(split, False))
        if split == 1:
            base = t_ser
        print("split={:d}: serial {:7.3f} ms/link   pipelined {:7.3f} "
              "ms/link   stall(ser-pip) {:+6.3f} ms   vs split1-serial "
              "{:+6.3f} ms".format(split, t_ser, t_pip, t_ser - t_pip,
                                   t_ser - base), flush=True)


if __name__ == "__main__":
    main()
