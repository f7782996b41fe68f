"""Isolated timings of the fused field kernels on the real chip.

Measures fwd and fwd+bwd wall time at the bench workload shape for the
MLP-only kernel (fused_field), the PE-fused kernel (fused_pe) and the
composited kernel (fused_pe_rm), each at f32 and bf16 MXU operand dtype.
Hard-syncs by fetching values (axon tunnel)."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--r-blks", default="8")
    ap.add_argument("--mlp-subs", default="256")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--skip-ff", action="store_true")
    ap.add_argument("--skip-pe", action="store_true")
    ap.add_argument("--skip-rm", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
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
    w = ff.pack_weights(params)
    w = jax.tree_util.tree_map(jnp.asarray, w)

    n_rays, K = 2048, 128
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(n_rays, 3).astype(np.float32) * 0.2)
    r = jnp.asarray(rng.randn(n_rays, 3).astype(np.float32))
    d = jnp.asarray(np.sort(rng.rand(n_rays, K), 1).astype(np.float32) * 3 + 1)
    masks = tuple(jax.lax.stop_gradient(m) for m in fp.pe_mask_rows(1.0, None))
    N = n_rays * K
    xp = jnp.asarray(rng.randn(N, 64).astype(np.float32))
    vi = jnp.asarray(rng.randn(N, 32).astype(np.float32))
    g = jnp.asarray(rng.randn(N, 4).astype(np.float32))
    d_col = d.reshape(-1, 1)
    intv = jnp.concatenate([d[:, 1:] - d[:, :-1],
                            jnp.full_like(d[:, :1], 1e10)], axis=1)
    ray_len = jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True))
    dist = (intv * ray_len).reshape(-1, 1)
    g_ray = jnp.asarray(rng.randn(n_rays, 8).astype(np.float32))

    def scalarize(fn):
        """Reduce all outputs to ONE scalar inside the jit: a single value
        fetch is the only reliable sync through the axon tunnel, and per-leaf
        fetches would add ~2 ms tunnel latency per leaf."""
        def run(*a):
            out = fn(*a)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l) for l in leaves)
        return jax.jit(run)

    def timeit(fn, *a, reps=args.reps):
        float(fn(*a))
        t0 = time.time()
        for _ in range(reps):
            v = fn(*a)
        float(v)
        return (time.time() - t0) / reps * 1000

    dtypes = args.dtypes.split(",")
    if not args.skip_ff:
        for cdt in dtypes:
            f_fwd = scalarize(lambda xp, vi, w: ff.fused_mlp(
                xp, vi, w, False, cdt))
            f_vjp = scalarize(lambda xp, vi, w, g: jax.vjp(
                lambda a, b, ww: ff.fused_mlp(a, b, ww, False, cdt),
                xp, vi, w)[1](g))
            print("ff  {:9s} fwd: {:6.2f} ms   fwd+bwd: {:6.2f} ms".format(
                cdt, timeit(f_fwd, xp, vi, w), timeit(f_vjp, xp, vi, w, g)),
                flush=True)

    for r_blk in (int(x) for x in args.r_blks.split(",")):
        fp.set_ray_block(r_blk)
        for mlp_sub in (() if args.skip_pe else
                        tuple(int(x) for x in args.mlp_subs.split(","))):
            fp.set_mlp_sub(mlp_sub)
            for cdt in dtypes:
                p_fwd = scalarize(lambda c, r, d, w: fp.fused_mlp_pe(
                    c, r, d, False, cdt, masks, w))
                p_vjp = scalarize(lambda c, r, d, w, g: jax.vjp(
                    lambda a, b, dd, ww: fp.fused_mlp_pe(a, b, dd, False, cdt,
                                                         masks, ww),
                    c, r, d, w)[1](g))
                try:
                    t1 = timeit(p_fwd, c, r, d, w)
                    t2 = timeit(p_vjp, c, r, d, w, g)
                    print("pe  R_BLK={:2d} SUB={:4d} {:9s} fwd: {:6.2f} ms   "
                          "fwd+bwd: {:6.2f} ms".format(
                              r_blk, mlp_sub, cdt, t1, t2), flush=True)
                except Exception as e:
                    print("pe  R_BLK={:2d} SUB={:4d} {} FAILED: {}".format(
                        r_blk, mlp_sub, cdt, str(e)[:200]), flush=True)
        fp.set_mlp_sub(512)

        for mlp_sub in (() if args.skip_rm else
                        tuple(int(x) for x in args.mlp_subs.split(","))):
            fp.set_mlp_sub(mlp_sub)
            for cdt in dtypes:
                m_fwd = scalarize(lambda c, r, d, w: fp.fused_mlp_pe_rm(
                    c, r, d, False, cdt, masks, w))
                m_vjp = scalarize(lambda c, r, d, w, g: jax.vjp(
                    lambda a, b, dd, ww: fp.fused_mlp_pe_rm(
                        a, b, dd, False, cdt, masks, ww),
                    c, r, d, w)[1](g))
                try:
                    t1 = timeit(m_fwd, c, r, d, w)
                    t2 = timeit(m_vjp, c, r, d, w, g_ray)
                    print("rm  R_BLK={:2d} SUB={:4d} {:9s} fwd: {:6.2f} ms   "
                          "fwd+bwd: {:6.2f} ms".format(
                              r_blk, mlp_sub, cdt, t1, t2), flush=True)
                except Exception as e:
                    print("rm  R_BLK={:2d} SUB={:4d} {} FAILED: {}".format(
                        r_blk, mlp_sub, cdt, str(e)[:200]), flush=True)
        for mlp_sub in (() if args.skip_train else
                        tuple(int(x) for x in args.mlp_subs.split(","))):
            fp.set_mlp_sub(mlp_sub)
            t8 = jnp.concatenate(
                [jnp.asarray(rng.rand(n_rays, 3).astype(np.float32)),
                 jnp.ones((n_rays, 1), jnp.float32),
                 jnp.zeros((n_rays, 4), jnp.float32)], axis=1)
            for cdt in dtypes:
                tr = scalarize(lambda c, r, d, t, w: fp.fused_mlp_pe_rm_train(
                    c, r, d, t, False, cdt, None, masks, w))
                try:
                    t1 = timeit(tr, c, r, d, t8, w)
                    print("train R_BLK={:2d} SUB={:4d} {:9s} "
                          "fwd+cot+bwd: {:6.2f} ms".format(
                              r_blk, mlp_sub, cdt, t1), flush=True)
                except Exception as e:
                    print("train R_BLK={:2d} SUB={:4d} {} FAILED: {}".format(
                        r_blk, mlp_sub, cdt, str(e)[:200]), flush=True)
    fp.set_ray_block(8)
    fp.set_mlp_sub(512)


if __name__ == "__main__":
    main()
