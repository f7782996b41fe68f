"""Per-leaf gradient comparison for the composited kernel on-device:
XLA chain vs Mosaic-compiled vs interpret, same inputs (progress 0.05)."""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.dotdict import DotDict
    from neural_invertible_warp_tpu.ops import nerf_mlp
    from neural_invertible_warp_tpu.ops import render as render_ops
    from neural_invertible_warp_tpu.ops.pallas import fused_pe as fp

    ARCH = DotDict(dict(
        layers_feat=[None] + [256] * 8, layers_rgb=[None, 128, 3], skip=[4],
        posenc=dict(L_3D=10, L_view=4), density_activ="softplus",
        tf_init=True))
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), ARCH)
    rng = np.random.RandomState(0)
    B, R, K = 2, 16, 128
    center = jnp.array(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.array(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.array(np.sort(rng.rand(B, R, K, 1), 2).astype(np.float32)
                      * 3 + 1)
    progress = 0.05

    def loss_ref(params, center, ray):
        rgb_s, dens = nerf_mlp.apply_nerf_samples(
            params, ARCH, center, ray, depth, view_dep=True,
            density_activ="softplus", progress=progress, barf_c2f=(0.1, 0.5))
        rgb, d, op, _ = render_ops.composite(ray, rgb_s, dens, depth)
        return jnp.mean(rgb ** 2) + 0.1 * jnp.mean(d) + jnp.mean(op)

    def loss_fused(interp):
        def f(params, center, ray):
            rgb, d, op = fp.fused_render_rays_pe(
                params, ARCH, center, ray, depth,
                progress=progress, barf_c2f=(0.1, 0.5), interpret=interp)
            return jnp.mean(rgb ** 2) + 0.1 * jnp.mean(d) + jnp.mean(op)
        return f

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(
        params, center, ray)
    g_dev = jax.jit(jax.grad(loss_fused(False), argnums=(0, 1, 2)))(
        params, center, ray)
    g_int = jax.grad(loss_fused(True), argnums=(0, 1, 2))(
        params, center, ray)

    def rel(a, b):
        num = float(jnp.linalg.norm((a - b).ravel()))
        den = max(float(jnp.linalg.norm(b.ravel())), 1e-10)
        return num / den

    names = ["params", "center", "ray"]
    for i, nm in enumerate(names):
        la = jax.tree_util.tree_leaves_with_path(g_dev[i])
        lb = jax.tree_util.tree_leaves_with_path(g_ref[i])
        lc = jax.tree_util.tree_leaves_with_path(g_int[i])
        for (pa, a), (_, b), (_, c) in zip(la, lb, lc):
            print("{:8s} {:40s} dev-vs-ref {:.2e}  int-vs-ref {:.2e}  "
                  "dev-vs-int {:.2e}  |ref| {:.3e}".format(
                      nm, jax.tree_util.keystr(pa), rel(a, b), rel(c, b),
                      rel(a, c), float(jnp.linalg.norm(b.ravel()))))


if __name__ == "__main__":
    main()
