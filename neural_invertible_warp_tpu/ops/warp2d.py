"""2D warp toolkit: SO(2)/SE(2)/SL(3) Lie ops and planar warp grids.

jnp port of reference warp.py (the planar/homography alignment toolkit kept
for the paper's 2D ablations; SURVEY.md L-map "dead/vestigial layer" — here it
is a live capability backing the ``homography`` experiment):
* ``so2/SO2``, ``se2/SE2`` exp/log with the same Taylor expansions
  (warp.py:170-271), ``sl3_to_SL3`` via matrix exponential (warp.py:228-236);
* normalized pixel grids and center crops (warp.py:29-54);
* ``warp_grid`` for translation/rotation/rigid/homography warps (warp.py:67-87);
* corner helpers and range checks for perturbation synthesis (warp.py:108-168).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# -- Taylor series (warp.py:238-271) -----------------------------------------

def _taylor(x, coeff_fn, nth=10):
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom, term = coeff_fn(i, denom, x)
        ans = ans + term / denom
    return ans


def taylor_A(x, nth=10):  # sin(x)/x
    def f(i, denom, x):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        return denom, ((-1) ** i) * x ** (2 * i)
    return _taylor(x, f, nth)


def taylor_B(x, nth=10):  # (1-cos(x))/x
    def f(i, denom, x):
        denom *= (2 * i + 1) * (2 * i + 2)
        return denom, ((-1) ** i) * x ** (2 * i + 1)
    return _taylor(x, f, nth)


def taylor_C(x, nth=10):  # (x*cos(x)-sin(x))/x^2
    def f(i, denom, x):
        denom *= (2 * i + 2) * (2 * i + 3)
        return denom, ((-1) ** (i + 1)) * x ** (2 * i + 1) * (2 * i + 2)
    return _taylor(x, f, nth)


def taylor_D(x, nth=10):  # (x*sin(x)+cos(x)-1)/x^2
    def f(i, denom, x):
        denom *= (2 * i + 1) * (2 * i + 2)
        return denom, ((-1) ** i) * x ** (2 * i) * (2 * i + 1)
    return _taylor(x, f, nth)


# -- Lie groups ---------------------------------------------------------------

def so2_to_SO2(theta):
    """[...,1] -> [...,2,2]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.concatenate([c, -s], axis=-1),
                      jnp.concatenate([s, c], axis=-1)], axis=-2)


def SO2_to_so2(R):
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])[..., None]


def se2_to_SE2(delta):
    """[...,3] (u, theta) -> [...,2,3]."""
    u, theta = delta[..., :2], delta[..., 2:]
    A = taylor_A(theta)
    B = taylor_B(theta)
    V = jnp.stack([jnp.concatenate([A, -B], axis=-1),
                   jnp.concatenate([B, A], axis=-1)], axis=-2)
    R = so2_to_SO2(theta)
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


def SE2_to_se2(Rt, eps=1e-7):
    R, t = Rt[..., :2], Rt[..., 2:]
    theta = SO2_to_so2(R)
    A = taylor_A(theta)
    B = taylor_B(theta)
    denom = (A ** 2 + B ** 2 + eps)[..., None]
    invV = jnp.stack([jnp.concatenate([A, B], axis=-1),
                      jnp.concatenate([-B, A], axis=-1)], axis=-2) / denom
    u = (invV @ t)[..., 0]
    return jnp.concatenate([u, theta], axis=-1)


def sl3_to_SL3(h):
    """[...,8] -> [...,3,3] homography via the sl(3) matrix exponential."""
    h1, h2, h3, h4, h5, h6, h7, h8 = jnp.split(h, 8, axis=-1)
    A = jnp.stack([
        jnp.concatenate([h5, h3, h1], axis=-1),
        jnp.concatenate([h4, -h5 - h6, h2], axis=-1),
        jnp.concatenate([h7, h8, h6], axis=-1),
    ], axis=-2)
    flat = A.reshape((-1, 3, 3))
    H = jax.vmap(jax.scipy.linalg.expm)(flat)
    return H.reshape(A.shape)


# -- grids --------------------------------------------------------------------

def normalized_pixel_grid(H, W, batch_size=1):
    """[B,HW,2] grid in [-1,1] scaled by aspect (warp.py:29-35)."""
    m = max(H, W)
    y = ((jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1) * (H / m)
    x = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1) * (W / m)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([X, Y], axis=-1).reshape(-1, 2)
    return jnp.broadcast_to(grid, (batch_size,) + grid.shape)


def normalized_pixel_grid_crop(H, W, H_crop, W_crop, batch_size=1):
    """Center-crop grid (warp.py:37-45)."""
    m = max(H, W)
    y0, y1 = H // 2 - H_crop // 2, H // 2 + H_crop // 2
    x0, x1 = W // 2 - W_crop // 2, W // 2 + W_crop // 2
    y = ((jnp.arange(y0, y1, dtype=jnp.float32) + 0.5) / H * 2 - 1) * (H / m)
    x = ((jnp.arange(x0, x1, dtype=jnp.float32) + 0.5) / W * 2 - 1) * (W / m)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([X, Y], axis=-1).reshape(-1, 2)
    return jnp.broadcast_to(grid, (batch_size,) + grid.shape)


def normalized_pixel_corners_crop(H, W, H_crop, W_crop, batch_size=1):
    """Crop corner coordinates (warp.py:47-54)."""
    m = max(H, W)
    y_crop = (H // 2 - H_crop // 2, H // 2 + H_crop // 2)
    x_crop = (W // 2 - W_crop // 2, W // 2 + W_crop // 2)
    Y = [((y + 0.5) / H * 2 - 1) * (H / m) for y in y_crop]
    X = [((x + 0.5) / W * 2 - 1) * (W / m) for x in x_crop]
    corners = jnp.array([(X[0], Y[0]), (X[0], Y[1]), (X[1], Y[1]), (X[1], Y[0])],
                        dtype=jnp.float32)
    return jnp.broadcast_to(corners, (batch_size, 4, 2))


# -- warping ------------------------------------------------------------------

def _to_hom(X):
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def warp_grid(xy_grid, warp, warp_type="homography"):
    """Apply a parametric 2D warp to [B,N,2] points (warp.py:67-87)."""
    if warp_type == "translation":
        return xy_grid + warp[..., None, :]
    if warp_type == "rotation":
        R = so2_to_SO2(warp)
        return xy_grid @ jnp.swapaxes(R, -1, -2)
    if warp_type == "rigid":
        Rt = se2_to_SE2(warp)
        return _to_hom(xy_grid) @ jnp.swapaxes(Rt, -1, -2)
    if warp_type == "homography":
        H = sl3_to_SL3(warp)
        warped = _to_hom(xy_grid) @ jnp.swapaxes(H, -1, -2)
        return warped[..., :2] / (warped[..., 2:] + 1e-8)
    raise ValueError(warp_type)


def warp_corners(warp, H, W, H_crop, W_crop, warp_type="homography"):
    corners = normalized_pixel_corners_crop(H, W, H_crop, W_crop,
                                            batch_size=warp.shape[0])
    return warp_grid(corners, warp, warp_type)


def check_corners_in_range(warp, H, W, H_crop, W_crop, warp_type="homography"):
    """True when all warped crop corners stay inside the image (warp.py:157-161)."""
    corners = warp_corners(warp, H, W, H_crop, W_crop, warp_type)
    m = max(H, W)
    X = (corners[..., 0] / W * m + 1) / 2 * W - 0.5
    Y = (corners[..., 1] / H * m + 1) / 2 * H - 0.5
    return bool(jnp.all((0 <= X) & (X < W) & (0 <= Y) & (Y < H)))
