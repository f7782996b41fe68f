"""Local correlation vs a naive numpy loop."""

import numpy as np
import jax.numpy as jnp

from neural_invertible_warp_tpu.ops.correlation import local_correlation


def _naive(f1, f2, md):
    B, C, H, W = f1.shape
    D = 2 * md + 1
    out = np.zeros((B, D * D, H, W), np.float32)
    for b in range(B):
        for dy in range(-md, md + 1):
            for dx in range(-md, md + 1):
                d = (dy + md) * D + (dx + md)
                for y in range(H):
                    for x in range(W):
                        yy, xx = y + dy, x + dx
                        if 0 <= yy < H and 0 <= xx < W:
                            out[b, d, y, x] = np.mean(f1[b, :, y, x] *
                                                      f2[b, :, yy, xx])
    return out


def test_local_correlation_matches_naive():
    rng = np.random.RandomState(0)
    f1 = rng.randn(2, 8, 6, 7).astype(np.float32)
    f2 = rng.randn(2, 8, 6, 7).astype(np.float32)
    ours = np.asarray(local_correlation(jnp.array(f1), jnp.array(f2),
                                        max_displacement=2))
    ref = _naive(f1, f2, 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_local_correlation_shapes():
    f = jnp.ones((1, 4, 10, 12))
    out = local_correlation(f, f, max_displacement=4)
    assert out.shape == (1, 81, 10, 12)
    # zero displacement channel of identical maps = mean of squares = 1
    np.testing.assert_allclose(np.asarray(out[0, 40]), 1.0, atol=1e-6)


def test_pallas_correlation_matches_xla():
    from neural_invertible_warp_tpu.ops.pallas.correlation_kernel import (
        local_correlation_pallas)
    rng = np.random.RandomState(1)
    f1 = jnp.array(rng.randn(2, 8, 8, 16).astype(np.float32))
    f2 = jnp.array(rng.randn(2, 8, 8, 16).astype(np.float32))
    ref = local_correlation(f1, f2, max_displacement=2)
    out = local_correlation_pallas(f1, f2, max_displacement=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
