"""Isolated timings of the fused field kernels on the real chip.

Measures fwd and fwd+bwd wall time at the bench workload shape for the
MLP-only kernel (fused_field) and the PE-fused kernel (fused_pe) at various
ray-block sizes. Hard-syncs by fetching values (axon tunnel)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
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

    def scalarize(fn):
        """Reduce all outputs to ONE scalar inside the jit: a single value
        fetch is the only reliable sync through the axon tunnel, and per-leaf
        fetches would add ~2 ms tunnel latency per leaf."""
        def run(*args):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l) for l in leaves)
        return jax.jit(run)

    def timeit(fn, *args, reps=20):
        float(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            v = fn(*args)
        float(v)
        return (time.time() - t0) / reps * 1000

    # fused_field (round 1)
    f_fwd = scalarize(lambda xp, vi, w: ff.fused_mlp(xp, vi, w, False))
    print("ff fwd:      {:.2f} ms".format(timeit(f_fwd, xp, vi, w)))
    f_vjp = scalarize(lambda xp, vi, w, g: jax.vjp(
        lambda a, b, ww: ff.fused_mlp(a, b, ww, False), xp, vi, w)[1](g))
    print("ff fwd+bwd:  {:.2f} ms".format(timeit(f_vjp, xp, vi, w, g)))

    g_rays = jnp.asarray(rng.randn(N, 4).astype(np.float32))
    for r_blk in (8, 16, 32):
        fp.set_ray_block(r_blk)
        p_fwd = scalarize(lambda c, r, d, w: fp.fused_mlp_pe(
            c, r, d, False, masks, w))
        p_vjp = scalarize(lambda c, r, d, w, g: jax.vjp(
            lambda a, b, dd, ww: fp.fused_mlp_pe(a, b, dd, False, masks, ww),
            c, r, d, w)[1](g))
        try:
            t1 = timeit(p_fwd, c, r, d, w)
            t2 = timeit(p_vjp, c, r, d, w, g_rays)
            print("pe R_BLK={:2d} fwd: {:.2f} ms   fwd+bwd: {:.2f} ms".format(
                r_blk, t1, t2))
        except Exception as e:
            print("pe R_BLK={:2d} FAILED: {}".format(r_blk, str(e)[:200]))
    fp.set_ray_block(8)


if __name__ == "__main__":
    main()
