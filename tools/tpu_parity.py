"""On-device (compiled Mosaic) parity check of the fused Pallas kernels
against the XLA path — value AND gradient, in the c2f regime the training
loop actually runs in.

Why this exists: interpret-mode tests (tests/test_fused_*.py) validate the
kernel MATH but not the Mosaic lowering. And with the c2f mask OFF, pose
gradients through band-9 PE (x1608 amplification of fp32 noise) decorrelate
between ANY two implementations — comparisons are only meaningful with the
coarse-to-fine mask active (which is how training always starts). Run on a
real chip: python tools/tpu_parity.py
"""

import sys

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
    rng = np.random.RandomState(0)
    B, R, K = 2, 16, 128
    center = jnp.array(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.array(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.array(np.sort(rng.rand(B, R, K, 1), 2).astype(np.float32)
                      * 3 + 1)
    def make_loss(apply, progress):
        def loss(params, center, ray):
            rgb, dens = apply(params, ARCH, center, ray, depth,
                              view_dep=True, density_activ="softplus",
                              progress=progress, barf_c2f=(0.1, 0.5))
            return jnp.mean(rgb ** 2) + 0.01 * jnp.mean(dens)
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    failures = 0
    # Tolerances per regime. The correctness gate is the fully-coarse
    # regime (progress 0.05: only the raw-coordinate channel active) where
    # every implementation must agree tightly. With higher bands active,
    # the kernel's in-body FMA of center+ray*depth differs from XLA's
    # rounded product by 1 ulp, and band-k pose-gradient elements
    # (~2^k*pi*cos(2^k*pi*x)) decorrelate between the two (equally valid)
    # functions — measured up to ~0.2 rel-L2 at progress 0.25 while
    # dev==interpret==CPU for each path individually, and end-to-end
    # training (BARF to 0.7 deg) is unaffected. The loose bound below just
    # guards against order-of-magnitude regressions.
    for progress, tol in ((0.05, 1e-3), (0.25, 0.5)):
        ref = make_loss(nerf_mlp.apply_nerf_samples, progress)
        v0, g0 = ref(params, center, ray)
        for name, apply in (("fused_field", ff.fused_apply_nerf_samples),
                            ("fused_pe", fp.fused_apply_nerf_samples_pe)):
            v1, g1 = make_loss(apply, progress)(params, center, ray)
            dv = abs(float(v1) - float(v0)) / max(abs(float(v0)), 1e-12)
            worst = 0.0
            for a, b in zip(jax.tree_util.tree_leaves(g1),
                            jax.tree_util.tree_leaves(g0)):
                num = float(jnp.linalg.norm((a - b).ravel()))
                den = max(float(jnp.linalg.norm(b.ravel())), 1e-10)
                worst = max(worst, num / den)
            ok = dv < 1e-3 and worst < tol
            failures += 0 if ok else 1
            print("progress {:.2f} {:12s} loss rel diff {:.2e} | worst "
                  "grad rel-L2 {:.2e} | {}".format(
                      progress, name, dv, worst, "OK" if ok else "FAIL"))

    # train op (fwd + in-kernel MSE cotangent + bwd in one pallas call):
    # photometric-MSE loss value + all gradients vs the XLA chain
    from neural_invertible_warp_tpu.ops import render
    target = jnp.array(rng.rand(B, R, 3).astype(np.float32))

    def make_mse(progress):
        def ref_loss(params, center, ray):
            rgb_s, dens = nerf_mlp.apply_nerf_samples(
                params, ARCH, center, ray, depth, view_dep=True,
                density_activ="softplus", progress=progress,
                barf_c2f=(0.1, 0.5))
            rgb, _, _, _ = render.composite(ray, rgb_s, dens, depth)
            return jnp.mean((rgb - target) ** 2)

        def train_loss(params, center, ray):
            _, sq, n = fp.fused_render_rays_pe_train(
                params, ARCH, center, ray, depth, target,
                progress=progress, barf_c2f=(0.1, 0.5))
            return sq / n
        return (jax.jit(jax.value_and_grad(ref_loss, argnums=(0, 1, 2))),
                jax.jit(jax.value_and_grad(train_loss, argnums=(0, 1, 2))))

    for progress, tol in ((0.05, 1e-3), (0.25, 0.5)):
        ref, tr = make_mse(progress)
        v0, g0 = ref(params, center, ray)
        v1, g1 = tr(params, center, ray)
        dv = abs(float(v1) - float(v0)) / max(abs(float(v0)), 1e-12)
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g0)):
            num = float(jnp.linalg.norm((a - b).ravel()))
            den = max(float(jnp.linalg.norm(b.ravel())), 1e-10)
            worst = max(worst, num / den)
        ok = dv < 1e-3 and worst < tol
        failures += 0 if ok else 1
        print("progress {:.2f} {:12s} loss rel diff {:.2e} | worst "
              "grad rel-L2 {:.2e} | {}".format(
                  progress, "train_kernel", dv, worst, "OK" if ok else "FAIL"))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
