"""Planar image alignment (homography) and 2D neural image fitting.

The reference ships the planar toolkit (warp.py) and configs
(options/homography.yaml, options/img_relu.yaml) but the model modules they
point at are missing (SURVEY.md §1 "dead/vestigial layer", §2.3 Q2). This
module provides working systems for both experiment surfaces:

* ``homography``: the BARF planar experiment — ``batch_size`` patches are
  cropped from one image at synthetic SL(3) perturbations; a neural image
  (coordinate MLP with coarse-to-fine PE) and per-patch warp parameters are
  optimized jointly; ``warp.fix_first`` anchors the gauge by fixing the first
  patch's warp at its ground-truth perturbation.
* ``img_relu``: plain 2D image regression with a ReLU MLP (optional PE),
  reporting PSNR.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import posenc, warp2d
from ..utils import log


def load_image(opt):
    """Load data.image_fname resized to image_size; [H,W,3] float32."""
    import PIL.Image
    import imageio.v2 as imageio
    img = PIL.Image.fromarray(imageio.imread(opt.data.image_fname))
    H, W = opt.data.image_size
    img = img.resize((W, H), PIL.Image.BILINEAR)
    arr = np.asarray(img, np.float32)[..., :3] / 255.0
    return arr


def bilinear_sample(image, xy_norm, H, W):
    """Sample [H,W,3] at normalized coords [...,2] (warp.py coordinate map)."""
    m = max(H, W)
    X = (xy_norm[..., 0] / W * m + 1) / 2 * W - 0.5
    Y = (xy_norm[..., 1] / H * m + 1) / 2 * H - 0.5
    x0 = jnp.floor(X)
    y0 = jnp.floor(Y)
    wx = X - x0
    wy = Y - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    Ia = image[y0, x0]
    Ib = image[y0, x1]
    Ic = image[y1, x0]
    Id = image[y1, x1]
    wa = ((1 - wx) * (1 - wy))[..., None]
    wb = (wx * (1 - wy))[..., None]
    wc = ((1 - wx) * wy)[..., None]
    wd = (wx * wy)[..., None]
    return Ia * wa + Ib * wb + Ic * wc + Id * wd


# -- neural image -------------------------------------------------------------

def init_image_mlp(key, layers, L_2D, tf_init=True):
    """Coordinate MLP 2D->rgb with PE input (identity ++ sin/cos)."""
    in_dim = 2 + 4 * L_2D if L_2D else 2
    params = []
    dims = list(zip(layers[:-1], layers[1:]))
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = in_dim
        key, sub = jax.random.split(key)
        gain = 1.0 if li == len(dims) - 1 else math.sqrt(2.0)
        bound = gain * math.sqrt(6.0 / (k_in + k_out))
        w = jax.random.uniform(sub, (k_in, k_out), minval=-bound, maxval=bound)
        params.append(dict(w=w, b=jnp.zeros((k_out,))))
    return params


def apply_image_mlp(params, xy, L_2D, progress=None, c2f=None):
    if L_2D:
        enc = posenc.positional_encoding_c2f(xy, L_2D, progress, c2f)
        feat = jnp.concatenate([xy, enc], axis=-1)
    else:
        feat = xy
    for li, layer in enumerate(params):
        feat = feat @ layer["w"] + layer["b"]
        if li != len(params) - 1:
            feat = jax.nn.relu(feat)
    return jax.nn.sigmoid(feat)


# -- homography experiment ----------------------------------------------------

class PlanarSystem:
    """Joint neural image + per-patch SL(3) warp optimization."""

    model_name = "homography"

    def __init__(self, opt, image=None):
        self.opt = opt
        self.H, self.W = opt.data.image_size
        self.H_crop, self.W_crop = opt.data.patch_crop
        opt.H, opt.W = self.H, self.W
        self.image = jnp.asarray(image if image is not None else load_image(opt))
        self.B = opt.batch_size
        self.warp_pert = self._generate_perturbations()
        self.xy_crop = warp2d.normalized_pixel_grid_crop(
            self.H, self.W, self.H_crop, self.W_crop, batch_size=self.B)
        # GT patches sampled at the perturbed positions
        xy_pert = warp2d.warp_grid(self.xy_crop, self.warp_pert,
                                   self.opt.warp.type)
        self.patches = bilinear_sample(self.image, xy_pert, self.H, self.W)
        self._step_jit = None

    def _generate_perturbations(self):
        """Random in-range warps; patch 0 stays centered when fix_first."""
        opt = self.opt
        rng = np.random.RandomState(opt.seed or 0)
        perts = []
        for b in range(self.B):
            if b == 0 and opt.warp.fix_first:
                perts.append(np.zeros(opt.warp.dof, np.float32))
                continue
            for _ in range(1000):
                p = rng.randn(opt.warp.dof).astype(np.float32) * opt.warp.noise_h
                p[:2] += rng.randn(2).astype(np.float32) * opt.warp.noise_t
                if warp2d.check_corners_in_range(
                        jnp.asarray(p)[None], self.H, self.W, self.H_crop,
                        self.W_crop, opt.warp.type):
                    break
            perts.append(p)
        return jnp.asarray(np.stack(perts))

    def init_state(self, key):
        params = dict(
            image_mlp=init_image_mlp(key, self.opt.arch.layers,
                                     self.opt.arch.posenc.L_2D,
                                     self.opt.arch.get("tf_init", True)),
            warp_param=jnp.zeros((self.B, self.opt.warp.dof), jnp.float32),
        )
        self.tx = optax.multi_transform(
            dict(mlp=optax.adam(self.opt.optim.lr),
                 warp=optax.adam(self.opt.optim.lr_warp)),
            dict(image_mlp="mlp", warp_param="warp"),
        )
        return dict(params=params, opt_state=self.tx.init(params),
                    step=jnp.zeros((), jnp.int32))

    def _effective_warp(self, warp_param):
        """fix_first: anchor patch 0 at its GT perturbation (zero here)."""
        if self.opt.warp.fix_first:
            return jnp.concatenate([self.warp_pert[:1], warp_param[1:]], axis=0)
        return warp_param

    def make_train_step(self):
        opt = self.opt
        c2f = tuple(opt.barf_c2f) if opt.get("barf_c2f") else None

        def step_fn(state, _key):
            step = state["step"]
            progress = step.astype(jnp.float32) / opt.max_iter

            def loss_fn(params):
                warp = self._effective_warp(params["warp_param"])
                xy_warped = warp2d.warp_grid(self.xy_crop, warp, opt.warp.type)
                rgb = apply_image_mlp(params["image_mlp"], xy_warped,
                                      opt.arch.posenc.L_2D, progress, c2f)
                return jnp.mean((rgb - self.patches) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt_state = self.tx.update(grads, state["opt_state"],
                                                state["params"])
            params = optax.apply_updates(state["params"], updates)
            metrics = dict(loss_render=loss, loss_all=loss,
                           psnr=-10 * jnp.log10(loss))
            return dict(params=params, opt_state=opt_state, step=step + 1), metrics
        return step_fn

    def train_step(self, state, key):
        if self._step_jit is None:
            self._step_jit = jax.jit(self.make_train_step())
        return self._step_jit(state, key)

    def corner_error(self, state):
        """Mean L2 distance between estimated and GT warped crop corners."""
        warp = self._effective_warp(state["params"]["warp_param"])
        est = warp2d.warp_corners(warp, self.H, self.W, self.H_crop,
                                  self.W_crop, self.opt.warp.type)
        gt = warp2d.warp_corners(self.warp_pert, self.H, self.W, self.H_crop,
                                 self.W_crop, self.opt.warp.type)
        return float(jnp.mean(jnp.linalg.norm(est - gt, axis=-1)))


# -- 2D image fit (img_relu) --------------------------------------------------

class ImageFitSystem:
    """Plain 2D neural image regression with PSNR reporting."""

    model_name = "img_relu"

    def __init__(self, opt, image=None):
        self.opt = opt
        self.H, self.W = opt.data.image_size
        opt.H, opt.W = self.H, self.W
        self.image = jnp.asarray(image if image is not None else load_image(opt))
        self.grid = warp2d.normalized_pixel_grid(self.H, self.W)[0]
        self.pixels = self.image.reshape(-1, 3)
        self._step_jit = None

    def init_state(self, key):
        L = (self.opt.relu.posenc.L_2D
             if self.opt.relu.posenc.get("enabled") else 0)
        layers = [None] + [self.opt.relu.hidden_features] * \
            self.opt.relu.hidden_layers + [3]
        params = dict(mlp=init_image_mlp(key, layers, L))
        self.L_2D = L
        self.tx = optax.adam(self.opt.optim.Adam.lr)
        return dict(params=params, opt_state=self.tx.init(params),
                    step=jnp.zeros((), jnp.int32))

    def make_train_step(self):
        n_samples = min(self.opt.get("train_samples") or self.grid.shape[0],
                        self.grid.shape[0])

        def step_fn(state, key):
            idx = jax.random.permutation(key, self.grid.shape[0])[:n_samples]

            def loss_fn(params):
                rgb = apply_image_mlp(params["mlp"], self.grid[idx], self.L_2D)
                return jnp.mean((rgb - self.pixels[idx]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt_state = self.tx.update(grads, state["opt_state"],
                                                state["params"])
            params = optax.apply_updates(state["params"], updates)
            return dict(params=params, opt_state=opt_state,
                        step=state["step"] + 1), \
                dict(loss_render=loss, loss_all=loss, psnr=-10 * jnp.log10(loss))
        return step_fn

    def train_step(self, state, key):
        if self._step_jit is None:
            self._step_jit = jax.jit(self.make_train_step())
        return self._step_jit(state, key)


def run_planar_training(opt, image=None):
    """Driver for the 2D experiments (train.py dispatches here)."""
    if opt.model in ("homography", "planar"):
        system = PlanarSystem(opt, image=image)
    else:
        system = ImageFitSystem(opt, image=image)
    state = system.init_state(jax.random.PRNGKey(opt.seed or 0))
    key = jax.random.PRNGKey(opt.seed or 0)
    for it in range(opt.max_iter):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
        if (it + 1) % opt.freq.scalar == 0:
            msg = " ".join("{}={:.4g}".format(k, float(v))
                           for k, v in sorted(metrics.items()))
            log.info("it {}: {}".format(it + 1, msg))
    return system, state
