"""Gaussian-window SSIM in pure JAX.

Math parity with the vendored pohsun_ssim package
(reference external/pohsun_ssim/pytorch_ssim/__init__.py:7-73): 11x11 gaussian
window (sigma 1.5), per-channel depthwise convolution with same-padding,
C1 = 0.01^2, C2 = 0.03^2, averaged over the image.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_window(size=11, sigma=1.5):
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return jnp.asarray(w2d)


def _filter(img, window):
    """Depthwise 2D conv with same padding. img: [B,C,H,W]."""
    B, C, H, W = img.shape
    k = window.shape[0]
    kernel = jnp.broadcast_to(window, (C, 1, k, k))
    return jax.lax.conv_general_dilated(
        img, kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )


def ssim(img1, img2, window_size=11):
    """Mean SSIM over [B,C,H,W] float images in [0,1]."""
    window = _gaussian_window(window_size)
    mu1 = _filter(img1, window)
    mu2 = _filter(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _filter(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter(img2 * img2, window) - mu2_sq
    sigma12 = _filter(img1 * img2, window) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)
