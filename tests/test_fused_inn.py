"""Fused INN warp kernel (ops/pallas/fused_inn.py): value + gradient parity
vs ops.inn.deform_forward, interpreter mode on CPU.

The kernel reorganizes the computation (PE bands folded into first-layer
weight row slices, row-window commuted past the matmul) but every product
is the same fp32 product, so parity is tight."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neural_invertible_warp_tpu.ops import inn
from neural_invertible_warp_tpu.ops.pallas import fused_inn


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = inn.init_deform_params(key, d_feature=16, d_hidden=128,
                                    n_blocks=3, n_layers=1, multires=6)
    # zero-init output layers make the warp the identity (and all coupling
    # outputs zero) — perturb every leaf so the test exercises real math
    leaves, tree = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(1)
    leaves = [jnp.asarray(np.asarray(l) +
                          0.05 * rng.randn(*l.shape).astype(np.float32))
              for l in leaves]
    params = jax.tree_util.tree_unflatten(tree, leaves)
    B, N = 3, 40
    code = jnp.asarray(rng.randn(B, 16).astype(np.float32))
    pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    return params, code, pts


def _ref(params, code, pts, alpha):
    return inn.deform_forward(params, code, pts, alpha, multires=6,
                              actfn="softplus", anneal="reference")


def _fused(params, code, pts, alpha):
    return fused_inn.fused_deform_forward(params, code, pts, alpha,
                                          multires=6, actfn="softplus",
                                          anneal="reference", interpret=True)


def test_supports(setup):
    params, _, _ = setup
    assert fused_inn.supports(params, 6, "softplus", "reference")
    assert not fused_inn.supports(params, 6, "softplus", "bands")
    assert not fused_inn.supports(params, 6, "relu", "reference")


@pytest.mark.parametrize("alpha", [0.0, 0.37, 1.0])
def test_forward_parity(setup, alpha):
    params, code, pts = setup
    ref = _ref(params, code, pts, jnp.float32(alpha))
    fus = _fused(params, code, pts, jnp.float32(alpha))
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity(setup):
    params, code, pts = setup
    alpha = jnp.float32(0.6)

    def loss_of(fn):
        def run(params, code, pts):
            out = fn(params, code, pts, alpha)
            return jnp.sum(jnp.sin(out * 3.0))
        return run

    g_ref = jax.grad(loss_of(_ref), argnums=(0, 1, 2))(params, code, pts)
    g_f = jax.grad(loss_of(_fused), argnums=(0, 1, 2))(params, code, pts)

    def rel(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)

    assert rel(g_ref[1], g_f[1]) < 1e-4          # code
    assert rel(g_ref[2], g_f[2]) < 1e-4          # pts
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref[0]),
            jax.tree_util.tree_leaves_with_path(g_f[0])):
        assert pa == pb
        assert rel(a, b) < 1e-4, jax.tree_util.keystr(pa)


def test_ray_padding(setup):
    """B*N not a P_BLK multiple: padded rows must not leak."""
    params, code, pts = setup
    ref = _ref(params, code[:1], pts[:1, :7], jnp.float32(0.8))
    fus = _fused(params, code[:1], pts[:1, :7], jnp.float32(0.8))
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
