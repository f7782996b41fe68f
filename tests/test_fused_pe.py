"""PE-fused field kernel (ops/pallas/fused_pe.py): value + gradient parity
vs the jnp reference path, interpreter mode on CPU.

Tolerances: the kernel body fuses ``center + ray*depth`` into an FMA while
the jnp reference path rounds the product first — a 1-ulp difference in the
point coordinate that the band-9 PE frequency (2^9*pi ~ 1.6e3) amplifies to
~5e-4 in the encoding (verified bit-exact once the FMA is accounted for:
the PE matmul, masks, and view encoding all match exactly). On TPU hardware
both paths emit the same VPU FMA.

Depth gradients are intentionally zero in the fused path (stratified samples
are detached by construction), so parity is checked for center / ray /
params gradients only."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.ops import nerf_mlp
from neural_invertible_warp_tpu.ops.pallas import fused_pe

ARCH = DotDict(dict(
    layers_feat=[None, 256, 256, 256, 256, 256, 256, 256, 256],
    layers_rgb=[None, 128, 3],
    skip=[4],
    posenc=dict(L_3D=10, L_view=4),
    density_activ="softplus",
    tf_init=True,
))


@pytest.fixture(scope="module")
def setup():
    params = nerf_mlp.init_nerf_params(jax.random.PRNGKey(0), ARCH)
    rng = np.random.RandomState(0)
    B, R, K = 2, 3, 128   # 6 rays (3 blocks at R_BLK=2), 768 points
    center = jnp.array(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.array(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.array(np.sort(rng.rand(B, R, K, 1), axis=2).astype(np.float32)
                      * 3 + 1)
    return params, center, ray, depth


def _reference(params, center, ray, depth, progress=None, c2f=None,
               activ="softplus"):
    return nerf_mlp.apply_nerf_samples(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ=activ, progress=progress, barf_c2f=c2f)


def _fused(params, center, ray, depth, progress=None, c2f=None):
    return fused_pe.fused_apply_nerf_samples_pe(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ="softplus", progress=progress, barf_c2f=c2f,
        interpret=True)


def test_supports():
    assert fused_pe.supports(
        ARCH, DotDict(dict(view_dep=True, density_noise_reg=None,
                           sample_intvs=128)))
    assert not fused_pe.supports(
        ARCH, DotDict(dict(view_dep=True, density_noise_reg=None,
                           sample_intvs=13)))


def test_forward_parity(setup):
    params, center, ray, depth = setup
    rgb_ref, dens_ref = _reference(params, center, ray, depth)
    rgb_f, dens_f = _fused(params, center, ray, depth)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               rtol=1e-3, atol=1e-3)


def test_forward_parity_c2f(setup):
    params, center, ray, depth = setup
    rgb_ref, dens_ref = _reference(params, center, ray, depth,
                                   progress=0.3, c2f=(0.1, 0.5))
    rgb_f, dens_f = _fused(params, center, ray, depth,
                           progress=0.3, c2f=(0.1, 0.5))
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               rtol=1e-3, atol=1e-3)


def _grads(params, center, ray, depth):
    def loss(fn):
        def run(params, center, ray):
            rgb, dens = fn(params, center, ray, depth,
                           progress=0.4, c2f=(0.1, 0.5))
            return jnp.mean(rgb ** 2) + 0.01 * jnp.mean(dens)
        return run
    g_ref = jax.grad(loss(_reference), argnums=(0, 1, 2))(params, center, ray)
    g_f = jax.grad(loss(_fused), argnums=(0, 1, 2))(params, center, ray)
    return g_ref, g_f


def test_gradient_parity_exact(setup):
    """Power-of-two depths make ray*depth exact, removing the FMA rounding
    difference — gradients must then match tightly (proves the backward
    math itself is right, not just close)."""
    params, center, ray, _ = setup
    rng = np.random.RandomState(3)
    B, R, K = center.shape[0], center.shape[1], 128
    depth = jnp.array(rng.choice([0.25, 0.5, 1.0, 2.0],
                                 (B, R, K, 1)).astype(np.float32))
    g_ref, g_f = _grads(params, center, ray, depth)
    for a, b, name in ((g_ref[1], g_f[1], "center"),
                       (g_ref[2], g_f[2], "ray")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg=name)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref[0])
    flat_f = jax.tree_util.tree_leaves_with_path(g_f[0])
    for (pa, a), (pb, b) in zip(flat_ref, flat_f):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(pa))


def test_gradient_parity_realistic(setup):
    """Realistic depths: the FMA-vs-rounded pts difference (1 ulp) is
    amplified by the band-9 PE derivative (f*cos(fx), f~1.6e3), so
    elementwise bounds are meaningless — check relative L2 agreement."""
    params, center, ray, depth = setup
    g_ref, g_f = _grads(params, center, ray, depth)

    def rel_l2(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)

    assert rel_l2(g_ref[1], g_f[1]) < 2e-2   # center
    assert rel_l2(g_ref[2], g_f[2]) < 2e-2   # ray
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref[0]),
            jax.tree_util.tree_leaves_with_path(g_f[0])):
        assert rel_l2(a, b) < 2e-2, jax.tree_util.keystr(pa)


def test_forward_parity_density_noise(setup):
    """r4: density_noise_reg as a kernel operand — the wrapper draws the
    exact jnp-path noise (normal(noise_key,[B,R,K]) * reg), so density
    parity holds at the usual FMA tolerance; rgb is noise-independent."""
    params, center, ray, depth = setup
    key = jax.random.PRNGKey(5)
    rgb_ref, dens_ref = nerf_mlp.apply_nerf_samples(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ="softplus", density_noise_reg=0.7, noise_key=key)
    rgb_f, dens_f = fused_pe.fused_apply_nerf_samples_pe(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ="softplus", density_noise_reg=0.7, noise_key=key,
        interpret=True)
    # the noise must actually differ from the noise-free density
    _, dens_clean = fused_pe.fused_apply_nerf_samples_pe(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ="softplus", interpret=True)
    assert float(jnp.max(jnp.abs(dens_f - dens_clean))) > 0.1
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               rtol=1e-3, atol=1e-3)


def test_ray_padding(setup):
    """n_rays not a multiple of the ray block: padded rays must not leak."""
    params, center, ray, depth = setup
    # 1x3 rays = 3 rays, not a multiple of R_BLK=2
    c1, r1, d1 = center[:1], ray[:1], depth[:1]
    rgb_ref, dens_ref = _reference(params, c1, r1, d1)
    rgb_f, dens_f = _fused(params, c1, r1, d1)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dens_f), np.asarray(dens_ref),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# composited variant (fused_mlp_pe_rm / fused_render_rays_pe)
# ---------------------------------------------------------------------------

def _composite_reference(params, center, ray, depth, progress=None,
                         c2f=None, activ="softplus"):
    from neural_invertible_warp_tpu.ops import render
    rgb_s, dens = _reference(params, center, ray, depth,
                             progress=progress, c2f=c2f, activ=activ)
    return render.composite(ray, rgb_s, dens, depth)


def _composite_fused(params, center, ray, depth, progress=None, c2f=None):
    return fused_pe.fused_render_rays_pe(
        params, ARCH, center, ray, depth, progress=progress, barf_c2f=c2f,
        interpret=True)


def test_composited_forward_parity(setup):
    params, center, ray, depth = setup
    rgb_r, d_r, op_r, _ = _composite_reference(params, center, ray, depth,
                                               progress=0.3, c2f=(0.1, 0.5))
    rgb_f, d_f, op_f = _composite_fused(params, center, ray, depth,
                                        progress=0.3, c2f=(0.1, 0.5))
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_r),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(op_f), np.asarray(op_r),
                               rtol=1e-3, atol=1e-3)


def test_composited_gradient_parity_exact(setup):
    """Power-of-two depths (exact FMA agreement, see module docstring):
    gradients through the full composite must match the XLA chain tightly."""
    params, center, ray, _ = setup
    rng = np.random.RandomState(5)
    B, R, K = center.shape[0], center.shape[1], 128
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    depth = jnp.asarray(base[..., None].astype(np.float32))

    def loss_of(fn):
        def run(params, center, ray):
            rgb, d, op = fn(params, center, ray)
            return jnp.mean(rgb ** 2) + 0.1 * jnp.mean(d) + jnp.mean(op)
        return run

    def ref_fn(params, center, ray):
        rgb, d, op, _ = _composite_reference(params, center, ray, depth,
                                             progress=0.4, c2f=(0.1, 0.5))
        return rgb, d, op

    def fused_fn(params, center, ray):
        return _composite_fused(params, center, ray, depth,
                                progress=0.4, c2f=(0.1, 0.5))

    g_ref = jax.grad(loss_of(ref_fn), argnums=(0, 1, 2))(params, center, ray)
    g_f = jax.grad(loss_of(fused_fn), argnums=(0, 1, 2))(params, center, ray)
    for a, b, name in ((g_ref[1], g_f[1], "center"),
                       (g_ref[2], g_f[2], "ray")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-6, err_msg=name)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref[0]),
            jax.tree_util.tree_leaves_with_path(g_f[0])):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-6,
            err_msg=jax.tree_util.keystr(pa))


def test_composited_ray_padding(setup):
    params, center, ray, depth = setup
    c1, r1, d1 = center[:1], ray[:1], depth[:1]   # 3 rays, pad to 8
    rgb_r, d_r, op_r, _ = _composite_reference(params, c1, r1, d1)
    rgb_f, d_f, op_f = _composite_fused(params, c1, r1, d1)
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(op_f), np.asarray(op_r),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# train variant (fused_mlp_pe_rm_train / fused_render_rays_pe_train):
# one kernel computing forward + in-kernel MSE cotangent + backward
# ---------------------------------------------------------------------------

def _train_reference_loss(params, center, ray, depth, target, *,
                          setbg=False, bgcolor=None, progress=0.4,
                          c2f=(0.1, 0.5)):
    """jnp-chain MSE through the full sample->field->composite core."""
    rgb, d, op, _ = _composite_reference(params, center, ray, depth,
                                         progress=progress, c2f=c2f)
    if setbg:
        rgb = rgb + bgcolor * (1 - op)
    return jnp.mean((rgb - target) ** 2)


def _train_fused(params, center, ray, depth, target, *, setbg=False,
                 bgcolor=None, progress=0.4, c2f=(0.1, 0.5)):
    out, sq, n = fused_pe.fused_render_rays_pe_train(
        params, ARCH, center, ray, depth, target, progress=progress,
        barf_c2f=c2f, setbg_opaque=setbg, bgcolor=bgcolor, interpret=True)
    return sq / n, out


@pytest.mark.parametrize("setbg", [False, True])
def test_train_kernel_loss_and_grad_parity(setup, setbg):
    """Exact-FMA depths: loss value and ALL gradients (params, center, ray)
    of the fused train kernel must match the jnp chain tightly — including
    through the in-kernel cotangent and the setbg_opaque background chain."""
    params, center, ray, _ = setup
    rng = np.random.RandomState(7)
    B, R, K = center.shape[0], center.shape[1], 128
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    depth = jnp.asarray(base[..., None].astype(np.float32))
    target = jnp.asarray(rng.rand(B, R, 3).astype(np.float32))
    bg = 1.0 if setbg else None

    def ref(params, center, ray):
        return _train_reference_loss(params, center, ray, depth, target,
                                     setbg=setbg, bgcolor=bg)

    def fused(params, center, ray):
        return _train_fused(params, center, ray, depth, target,
                            setbg=setbg, bgcolor=bg)[0]

    l_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1, 2))(
        params, center, ray)
    l_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2))(
        params, center, ray)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for a, b, name in ((g_ref[1], g_f[1], "center"),
                       (g_ref[2], g_f[2], "ray")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-7, err_msg=name)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref[0]),
            jax.tree_util.tree_leaves_with_path(g_f[0])):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-7,
            err_msg=jax.tree_util.keystr(pa))


def test_train_kernel_outputs_match_fwd_kernel(setup):
    """The train kernel's metric outputs must equal the plain composited
    forward kernel's (same compositing math, chunked per-ray)."""
    params, center, ray, depth = setup
    rng = np.random.RandomState(9)
    B, R = center.shape[0], center.shape[1]
    target = jnp.asarray(rng.rand(B, R, 3).astype(np.float32))
    rgb_f, d_f, op_f = _composite_fused(params, center, ray, depth,
                                        progress=0.4, c2f=(0.1, 0.5))
    _, out = _train_fused(params, center, ray, depth, target)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(rgb_f),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out["depth"]), np.asarray(d_f),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["opacity"]), np.asarray(op_f),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n_dev,R", [
    (2, 3),   # 6 rays, divisible across 2 shards
    (8, 3),   # 6 rays < 8 shards: pad rays must stay inert on every shard
    (8, 5),   # 10 rays, NOT divisible by 8: uneven pad split
])
def test_kernels_under_ray_mesh(setup, n_dev, R):
    """shard_map dispatch (active ray mesh): the rm wrappers must produce
    the same values AND gradients as the unsharded call — GSPMD treats
    pallas_call as opaque, so the wrappers shard the flattened ray axis
    explicitly and psum the loss / weight cotangents. Covers n=8 and
    non-divisible ray counts (VERDICT r3 Next #2c)."""
    from neural_invertible_warp_tpu.parallel import mesh as mesh_lib
    params, center, ray, _ = setup
    rng = np.random.RandomState(13)
    B, K = center.shape[0], 128
    center = jnp.asarray(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.asarray(rng.randn(B, R, 3).astype(np.float32))
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    depth = jnp.asarray(base[..., None].astype(np.float32))
    target = jnp.asarray(rng.rand(B, R, 3).astype(np.float32))

    def train_loss(params, center, ray):
        return _train_fused(params, center, ray, depth, target)[0]

    def eval_probe(params, center, ray):
        rgb, d, op = _composite_fused(params, center, ray, depth,
                                      progress=0.4, c2f=(0.1, 0.5))
        return jnp.mean(rgb ** 2) + jnp.mean(op), rgb

    l0, g0 = jax.value_and_grad(train_loss, argnums=(0, 1, 2))(
        params, center, ray)
    (e0, rgb0), ge0 = jax.value_and_grad(eval_probe, argnums=(0, 2),
                                         has_aux=True)(params, center, ray)
    mesh = mesh_lib.make_mesh(n_devices=n_dev)
    with mesh_lib.use_mesh(mesh):
        l1, g1 = jax.value_and_grad(train_loss, argnums=(0, 1, 2))(
            params, center, ray)
        (e1, rgb1), ge1 = jax.value_and_grad(eval_probe, argnums=(0, 2),
                                             has_aux=True)(params, center,
                                                           ray)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves((g0, ge0)),
                    jax.tree_util.tree_leaves((g1, ge1))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6)
    # (gradient tolerance absorbs psum reduction-order noise at n=8: the
    # per-shard partial sums accumulate in a different order than the
    # unsharded kernel — observed max 1.4e-5 relative on one leaf)


@pytest.mark.parametrize("n_dev,R,noise_reg", [
    (2, 3, None),
    (8, 5, None),    # 10 rays, NOT divisible by 8: uneven pad split
    (8, 5, 0.8),     # + density noise sharded alongside the rays
])
def test_soa_kernel_under_ray_mesh(setup, n_dev, R, noise_reg):
    """The per-sample SoA wrapper (the fine-sampling coarse path and
    _field_composite) must also dispatch per-shard under an active ray mesh
    (r4) — before, only the rm wrappers did, so fine-sampling configs on a
    mesh would all-gather the rays and run the coarse kernel replicated.
    Values and gradients must match the unsharded call; the noise draw
    happens OUTSIDE shard_map, so it is bitwise identical either way."""
    from neural_invertible_warp_tpu.parallel import mesh as mesh_lib
    from neural_invertible_warp_tpu.ops import render
    params, center, ray, _ = setup
    rng = np.random.RandomState(17)
    B, K = center.shape[0], 128
    center = jnp.asarray(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.asarray(rng.randn(B, R, 3).astype(np.float32))
    depth = jnp.asarray(
        np.sort(rng.rand(B, R, K, 1), axis=2).astype(np.float32) * 3 + 1)
    key = jax.random.PRNGKey(3)

    def probe(params, center, ray):
        chans, dens = fused_pe.fused_apply_nerf_samples_pe_soa(
            params, ARCH, center, ray, depth, view_dep=True,
            density_activ="softplus", progress=0.4, barf_c2f=(0.1, 0.5),
            density_noise_reg=noise_reg, noise_key=key, interpret=True)
        rgb, d, op, _ = render.composite_soa(ray, chans, dens, depth)
        return jnp.mean(rgb ** 2) + jnp.mean(op) + jnp.mean(d), rgb

    (l0, rgb0), g0 = jax.value_and_grad(probe, argnums=(0, 1, 2),
                                        has_aux=True)(params, center, ray)
    mesh = mesh_lib.make_mesh(n_devices=n_dev)
    with mesh_lib.use_mesh(mesh):
        (l1, rgb1), g1 = jax.value_and_grad(probe, argnums=(0, 1, 2),
                                            has_aux=True)(params, center,
                                                          ray)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6)


def test_train_kernel_padding_does_not_leak(setup):
    """Padded rays (valid=0) must contribute nothing: same weight gradients
    with 3 rays (padded to 8) as the jnp chain on exactly those 3 rays."""
    params, center, ray, _ = setup
    rng = np.random.RandomState(11)
    B, R, K = 1, 3, 128
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    depth = jnp.asarray(base[..., None].astype(np.float32))
    c1, r1 = center[:1], ray[:1]
    target = jnp.asarray(rng.rand(B, R, 3).astype(np.float32))

    g_ref = jax.grad(lambda p: _train_reference_loss(
        p, c1, r1, depth, target))(params)
    g_f = jax.grad(lambda p: _train_fused(
        p, c1, r1, depth, target)[0])(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-7,
            err_msg=jax.tree_util.keystr(pa))


def test_pe_projection_precision_tripwire():
    """The PE frequency projections MUST run at HIGHEST precision on TPU.

    Regression tripwire for the late-phase kick (EVIDENCE_r3.md §5d): at
    DEFAULT precision the MXU's bf16 operand pass quantizes POSITIONS to
    8 mantissa bits, and the finest c2f band (2^9*pi) amplifies that to
    ~10 radians of phase noise — which kicks a converged joint pose+field
    solution out of its basin at ~0.42*max_iter. Device-specific, so the
    interpret-mode parity tests above cannot catch a reversion; pin the
    constant instead.
    """
    from neural_invertible_warp_tpu.ops.pallas import fused_field as ff
    assert ff._PE_PRECISION is jax.lax.Precision.HIGHEST
    # and the PE call sites actually route through the _pe variants
    import inspect
    src = inspect.getsource(fused_pe)
    assert "ff._dot_pe(pts, F3)" in src
    assert "ff._dot_pe(ru, Fv)" in src
    assert "ff._dot_nt_pe(dxp_pre, F3)" in src
    assert "ff._dot_nt_pe(dvF, Fv)" in src
    assert "ff._dot(pts, F3)" not in src.replace("ff._dot_pe(pts, F3)", "")


def test_train_kernel_relu_density_parity(setup):
    """relu density through the ONE-call train kernel (fwd + in-kernel
    cotangent + bwd): loss and all gradients vs the jnp chain."""
    params, center, ray, _ = setup
    rng = np.random.RandomState(11)
    B, R, K = center.shape[0], center.shape[1], 128
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    depth = jnp.asarray(base[..., None].astype(np.float32))
    target = jnp.asarray(rng.rand(B, R, 3).astype(np.float32))

    def ref(params, center, ray):
        rgb, d, op, _ = _composite_reference(params, center, ray, depth,
                                             progress=0.4, c2f=(0.1, 0.5),
                                             activ="relu")
        return jnp.mean((rgb - target) ** 2)

    def fused(params, center, ray):
        _, sq, n = fused_pe.fused_render_rays_pe_train(
            params, ARCH, center, ray, depth, target, progress=0.4,
            barf_c2f=(0.1, 0.5), interpret=True, density_activ="relu")
        return sq / n

    l_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1, 2))(
        params, center, ray)
    l_f, g_f = jax.value_and_grad(fused, argnums=(0, 1, 2))(
        params, center, ray)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    assert float(l_f) != 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-7)


# ---------------------------------------------------------------------------
# relu density parity for the remaining kernel entry points (round-4 ADVICE):
# the train kernel is covered above; these pin the eval composited kernel
# (fused_render_rays_pe) and the non-composited field kernels (AoS + SoA),
# forward AND gradients, so the activ threading is test-verified everywhere.
# ---------------------------------------------------------------------------

def _pow2_depth(B, R, K, seed=13):
    rng = np.random.RandomState(seed)
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    return jnp.asarray(base[..., None].astype(np.float32))


def test_field_kernel_relu_parity(setup):
    """fused_apply_nerf_samples_pe, density_activ=relu: forward + grads."""
    params, center, ray, _ = setup
    depth = _pow2_depth(center.shape[0], center.shape[1], 128)

    def ref_fn(params, center, ray):
        rgb, dens = _reference(params, center, ray, depth,
                               progress=0.4, c2f=(0.1, 0.5), activ="relu")
        return jnp.mean(rgb ** 2) + 0.01 * jnp.mean(dens)

    def fused_fn(params, center, ray):
        rgb, dens = fused_pe.fused_apply_nerf_samples_pe(
            params, ARCH, center, ray, depth, view_dep=True,
            density_activ="relu", progress=0.4, barf_c2f=(0.1, 0.5),
            interpret=True)
        return jnp.mean(rgb ** 2) + 0.01 * jnp.mean(dens)

    l_ref, g_ref = jax.value_and_grad(ref_fn, argnums=(0, 1, 2))(
        params, center, ray)
    l_f, g_f = jax.value_and_grad(fused_fn, argnums=(0, 1, 2))(
        params, center, ray)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-6)


def test_field_kernel_soa_relu_parity(setup):
    """fused_apply_nerf_samples_pe_soa, relu: channels + density + grads."""
    params, center, ray, _ = setup
    depth = _pow2_depth(center.shape[0], center.shape[1], 128, seed=17)

    def ref_fn(params, center, ray):
        rgb, dens = _reference(params, center, ray, depth,
                               progress=0.4, c2f=(0.1, 0.5), activ="relu")
        return jnp.mean(rgb ** 2) + 0.01 * jnp.mean(dens)

    def fused_fn(params, center, ray):
        chans, dens = fused_pe.fused_apply_nerf_samples_pe_soa(
            params, ARCH, center, ray, depth, view_dep=True,
            density_activ="relu", progress=0.4, barf_c2f=(0.1, 0.5),
            interpret=True)
        rgb = jnp.stack(chans, axis=-1)
        return jnp.mean(rgb ** 2) + 0.01 * jnp.mean(dens)

    l_ref, g_ref = jax.value_and_grad(ref_fn, argnums=(0, 1, 2))(
        params, center, ray)
    l_f, g_f = jax.value_and_grad(fused_fn, argnums=(0, 1, 2))(
        params, center, ray)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-6)


def test_composited_relu_parity(setup):
    """fused_render_rays_pe (the eval kernel), relu: forward + grads."""
    params, center, ray, _ = setup
    depth = _pow2_depth(center.shape[0], center.shape[1], 128, seed=19)

    rgb_r, d_r, op_r, _ = _composite_reference(params, center, ray, depth,
                                               progress=0.4, c2f=(0.1, 0.5),
                                               activ="relu")
    rgb_f, d_f, op_f = fused_pe.fused_render_rays_pe(
        params, ARCH, center, ray, depth, progress=0.4, barf_c2f=(0.1, 0.5),
        interpret=True, density_activ="relu")
    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_r),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(op_f), np.asarray(op_r),
                               rtol=1e-3, atol=1e-3)

    def loss_of(fn):
        def run(params, center, ray):
            rgb, d, op = fn(params, center, ray)
            return jnp.mean(rgb ** 2) + 0.1 * jnp.mean(d) + jnp.mean(op)
        return run

    def ref_fn(params, center, ray):
        rgb, d, op, _ = _composite_reference(params, center, ray, depth,
                                             progress=0.4, c2f=(0.1, 0.5),
                                             activ="relu")
        return rgb, d, op

    def fused_fn(params, center, ray):
        return fused_pe.fused_render_rays_pe(
            params, ARCH, center, ray, depth, progress=0.4,
            barf_c2f=(0.1, 0.5), interpret=True, density_activ="relu")

    g_ref = jax.grad(loss_of(ref_fn), argnums=(0, 1, 2))(params, center, ray)
    g_f = jax.grad(loss_of(fused_fn), argnums=(0, 1, 2))(params, center, ray)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-6)


@pytest.mark.parametrize("noise_reg", [None, 1.0])
def test_fine_sampling_fused_train_kernel_parity(monkeypatch, noise_reg):
    """Round-5: fine-sampling TRAIN mode runs BOTH networks through the
    one-call fused train kernel — the coarse net with want_prob=True,
    emitting the per-sample compositing weights as a stop-grad output for
    the CDF resample (the reference resamples under torch.no_grad,
    model/nerf.py:311-315), then the fine net at K=intvs+intvs_fine.
    Measured on-chip: 8.53 ms/step vs 9.57 on the r4 coarse-SoA path
    (EVIDENCE_r5 §1). EVAL stays on the SoA field kernels — the
    forward-only composited kernel measured 3.6x slower on-device, see
    models/system.py. Full render_rays loss + gradients (train) and the
    SoA rgb_fine (eval) must match the all-jnp path. The fused path is
    forced on (interpret mode) — on CPU _use_fused_field() would otherwise
    gate everything off and the comparison would be vacuous.

    noise_reg=1.0 covers the r4 density_noise_reg kernel operand (the
    nerf_llff_repr protocol): the wrappers draw the exact jnp-path noise
    (normal(noise_key,[B,R,K]) * reg) and pass it into the kernels, so the
    comparison is bitwise in the draw and exact in the math."""
    import functools
    from neural_invertible_warp_tpu import config
    from neural_invertible_warp_tpu.models import get_system_class
    from neural_invertible_warp_tpu.models import system as system_mod
    from neural_invertible_warp_tpu.ops.pallas import fused_pe

    def build():
        opt = config.load_options("options/nerf_blender_repr.yaml")
        over = config.parse_arguments([
            "--model=nerf", "--yaml=nerf_blender_repr",
            "--data.image_size=[8,8]",
            "--nerf.sample_intvs=16", "--nerf.sample_intvs_fine=16",
            "--nerf.rand_rays=8", "--nerf.sample_stratified!",
        ] + ([f"--nerf.density_noise_reg={noise_reg}"] if noise_reg else []))
        opt = config.override_options(opt, over, key_stack=[],
                                      safe_check=True)
        opt.H, opt.W = 8, 8
        rng = np.random.RandomState(0)
        arrays = dict(
            image=rng.rand(2, 8, 8, 3).astype(np.float32),
            intr=np.tile(np.array([[8.0, 0, 4], [0, 8.0, 4], [0, 0, 1]],
                                  np.float32), (2, 1, 1)),
            pose=np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1)),
            idx=np.arange(2, dtype=np.int32))
        system = get_system_class("nerf")(opt)
        system.attach_data(dict(arrays), dict(arrays))
        state = system.init_state(jax.random.PRNGKey(0))
        return system, state

    kernel_fns = ("fused_render_rays_pe_train", "fused_render_rays_pe",
                  "fused_apply_nerf_samples_pe",
                  "fused_apply_nerf_samples_pe_soa")
    orig = {n: getattr(fused_pe, n) for n in kernel_fns}
    orig_use = system_mod.NerfSystem._use_fused_field

    results = {}
    for fused in (True, False):
        for n, f in orig.items():
            monkeypatch.setattr(
                fused_pe, n,
                functools.partial(f, interpret=True) if fused else f)
        monkeypatch.setattr(
            system_mod.NerfSystem, "_use_fused_field",
            (lambda self: "pe") if fused else orig_use)
        system, state = build()
        assert system._use_fused_field() == ("pe" if fused else "off")
        data = system.train_data
        ridx = jnp.arange(4, dtype=jnp.int32)
        key = jax.random.PRNGKey(1)
        step = jnp.asarray(100, jnp.int32)

        def loss_fn(params):
            out, target, extras = system._forward_train(
                params, state["aux"], data, ridx, key, step)
            losses = system.compute_loss(params, state["aux"], data, out,
                                         target, step, extras)
            return system.summarize_loss(losses), (losses, out)

        (total, (losses, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        # eval-mode branch: fine net through the composited rm kernel
        center = jnp.zeros((1, 8, 3), jnp.float32)
        raydir = jnp.concatenate(
            [jnp.linspace(-0.2, 0.2, 8)[None, :, None],
             jnp.full((1, 8, 1), 0.1), jnp.ones((1, 8, 1))], axis=-1)
        out_eval = system.render_rays(state["params"], center, raydir,
                                      jax.random.PRNGKey(2), mode="eval",
                                      progress=0.6)
        results[fused] = (float(total),
                          {k: float(v) for k, v in losses.items()}, grads,
                          ("render_fine_sq_sum" in out),
                          np.asarray(out_eval["rgb_fine"]))

    t_f, l_f, g_f, used_kernel, rgb_eval_f = results[True]
    t_r, l_r, g_r, used_ref, rgb_eval_r = results[False]
    assert used_kernel and not used_ref   # the fused branch actually ran
    assert "render_fine" in l_f and l_f["render_fine"] > 0
    np.testing.assert_allclose(t_f, t_r, rtol=2e-4)
    for k in l_r:
        np.testing.assert_allclose(l_f[k], l_r[k], rtol=2e-4, err_msg=k)
    np.testing.assert_allclose(rgb_eval_f, rgb_eval_r, rtol=1e-4, atol=1e-6)
    # with noise_reg, density_pre+noise clusters near 0, so the kernel's
    # 1-ulp FMA point difference (file docstring) flips a few RELU-derivative
    # masks (diagnostic 2026-08-19: worst |delta| 1.8e-5 with softplus vs
    # 2.2e-4 with relu, same seeds) — elementwise bounds are meaningless for
    # the relu config; use per-leaf relative-L2 like
    # test_gradient_parity_realistic
    def rel_l2(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return np.linalg.norm(a - b) / max(float(np.linalg.norm(a)), 1e-12)

    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_r),
            jax.tree_util.tree_leaves_with_path(g_f)):
        if noise_reg:
            assert rel_l2(a, b) < 1e-2, jax.tree_util.keystr(pa)
        else:
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-6,
                err_msg=jax.tree_util.keystr(pa))


# ---------------------------------------------------------------------------
# want_prob: the one-call train kernel's per-sample compositing weights
# (the stop-grad CDF-resample input for fully-fused fine-sampling, r4/r5)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("noise_reg", [None, 0.7])
def test_train_kernel_want_prob_parity(setup, noise_reg):
    """want_prob=True must return exactly the jnp chain's compositing
    weights prob = T*alpha (render.composite), including with the density
    noise operand active — the draw is bitwise shared (_make_noise matches
    ops/nerf_mlp.py:129-131), so only kernel-vs-XLA FMA rounding separates
    the two. The reference resamples these weights under torch.no_grad
    (model/nerf.py:311-315); stop-grad on prob is checked too."""
    from neural_invertible_warp_tpu.ops import render
    params, center, ray, _ = setup
    rng = np.random.RandomState(21)
    B, R, K = center.shape[0], center.shape[1], 128
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    depth = jnp.asarray(base[..., None].astype(np.float32))
    target = jnp.asarray(rng.rand(B, R, 3).astype(np.float32))
    key = jax.random.PRNGKey(5)

    rgb_s, dens = nerf_mlp.apply_nerf_samples(
        params, ARCH, center, ray, depth, view_dep=True,
        density_activ="softplus", progress=0.4, barf_c2f=(0.1, 0.5),
        density_noise_reg=noise_reg, noise_key=key)
    _, _, _, prob_ref = render.composite(ray, rgb_s, dens, depth)

    out, _, _ = fused_pe.fused_render_rays_pe_train(
        params, ARCH, center, ray, depth, target, progress=0.4,
        barf_c2f=(0.1, 0.5), interpret=True, want_prob=True,
        density_noise_reg=noise_reg, noise_key=key)
    np.testing.assert_allclose(np.asarray(out["prob"]),
                               np.asarray(prob_ref[..., 0]),
                               rtol=1e-3, atol=1e-5)

    # prob is resample-only: no gradient may flow through it (exact parity
    # with the reference's no_grad resample)
    def loss_via_prob(params):
        out, _, _ = fused_pe.fused_render_rays_pe_train(
            params, ARCH, center, ray, depth, target, progress=0.4,
            barf_c2f=(0.1, 0.5), interpret=True, want_prob=True,
            density_noise_reg=noise_reg, noise_key=key)
        return jnp.sum(out["prob"])

    g = jax.grad(loss_via_prob)(params)
    assert all(float(jnp.abs(l).max()) == 0.0
               for l in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("n_dev,R,noise_reg", [
    (2, 3, None),
    (8, 5, 0.7),   # 10 rays NOT divisible by 8, noise sharded with the rays
])
def test_train_kernel_want_prob_under_ray_mesh(setup, n_dev, R, noise_reg):
    """Under an active ray mesh the want_prob output must be identical to
    the unsharded call (the prob rows ride the same shard_map row specs as
    the rays; the noise is drawn OUTSIDE shard_map so the draw is bitwise
    chip-count invariant)."""
    from neural_invertible_warp_tpu.parallel import mesh as mesh_lib
    params, center, ray, _ = setup
    rng = np.random.RandomState(23)
    B, K = center.shape[0], 128
    center = jnp.asarray(rng.randn(B, R, 3).astype(np.float32) * 0.2)
    ray = jnp.asarray(rng.randn(B, R, 3).astype(np.float32))
    base = np.sort(rng.choice([0.5, 1.0, 2.0, 4.0], (B, R, K)), axis=-1)
    depth = jnp.asarray(base[..., None].astype(np.float32))
    target = jnp.asarray(rng.rand(B, R, 3).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def run(params, center, ray):
        out, sq, n = fused_pe.fused_render_rays_pe_train(
            params, ARCH, center, ray, depth, target, progress=0.4,
            barf_c2f=(0.1, 0.5), interpret=True, want_prob=True,
            density_noise_reg=noise_reg, noise_key=key)
        return sq / n, out["prob"]

    (l0, p0), g0 = jax.value_and_grad(run, argnums=(0, 1, 2),
                                      has_aux=True)(params, center, ray)
    mesh = mesh_lib.make_mesh(n_devices=n_dev)
    with mesh_lib.use_mesh(mesh):
        (l1, p1), g1 = jax.value_and_grad(run, argnums=(0, 1, 2),
                                          has_aux=True)(params, center, ray)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6)
