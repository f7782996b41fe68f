"""GARF model family: Gaussian-activation NeRF with SE(3) pose refinement.

Parity targets:
* ``nerf_gaussian`` (reference model/nerf_gaussian.py): the PE-free
  gaussian-activation field with known poses;
* ``garf`` (model/garf.py): per-image se(3) refinement on identity (or the
  given pose when ``init.pose``), with ``init.pose_warmup`` gating that holds
  the pose parameters fixed for the first N iterations (model/garf.py:47-62);
* ``garf_se3_field`` (model/garf_se3_field.py): the se(3) correction is
  predicted by a small gaussian-activation MLP from a per-image embedding
  rather than stored directly (``localWarp``, garf_se3_field.py:281-314).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from ..ops import garf_field, lie
from ..ops import pose as pose_ops
from .barf import BarfSystem
from .system import NerfSystem


class _GaussianFieldMixin:

    def init_field_params(self, key):
        return garf_field.init_gaussian_nerf_params(
            key, self.arch, view_dep=self.opt.nerf.view_dep,
            init_cfg=self.opt.get("init"))

    def apply_field_samples(self, field_params, center, ray, depth, **kwargs):
        # the gaussian field has no positional encoding: progress/c2f unused
        kwargs.pop("progress", None)
        kwargs.pop("barf_c2f", None)
        return garf_field.apply_gaussian_nerf_samples(
            field_params, self.arch, center, ray, depth, **kwargs)


class NerfGaussianSystem(_GaussianFieldMixin, NerfSystem):
    model_name = "nerf_gaussian"


class GarfSystem(_GaussianFieldMixin, BarfSystem):
    model_name = "garf"

    def __init__(self, opt):
        super().__init__(opt)
        if opt.get("init") and not opt.init.get("pose"):
            assert not opt.init.get("pose_warmup"), \
                "pose optimization must start at iter 0 without known poses " \
                "(reference model/garf.py:22-23)"

    def _initial_pose(self, aux, pose_GT):
        opt = self.opt
        if opt.data.dataset == "blender":
            return super()._initial_pose(aux, pose_GT)
        if opt.get("init") and opt.init.get("pose"):
            return pose_GT  # initialize from the given poses (model/garf.py:239-242)
        return pose_ops.identity_pose((pose_GT.shape[0],))

    def make_optimizers(self):
        txs = super().make_optimizers()
        warmup = (self.opt.get("init") or {}).get("pose_warmup") or 0
        if warmup:
            # hold pose parameters fixed for the first N iterations
            # (model/garf.py:47-56): zero the incoming gradient so Adam
            # moments stay untouched during the warmup window
            def gate():
                def init_fn(params):
                    return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

                def update_fn(updates, state, params=None):
                    scale = jnp.where(state.count >= warmup, 1.0, 0.0)
                    updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
                    return updates, optax.ScaleByScheduleState(count=state.count + 1)
                return optax.GradientTransformation(init_fn, update_fn)
            txs["pose"] = optax.chain(gate(), txs["pose"])
        return txs


class GarfSE3FieldSystem(GarfSystem):
    """garf_se3_field: embedding -> gaussian MLP -> se(3) correction."""

    model_name = "garf_se3_field"

    def init_params(self, key):
        params = {}
        key, k1, k2, k3 = jax.random.split(key, 4)
        params["nerf"] = self.init_field_params(k1)
        if self.opt.nerf.fine_sampling:
            key, kf = jax.random.split(key)
            params["nerf_fine"] = self.init_field_params(kf)
        arch = self.opt.arch
        # per-image embedding (torch Embedding default: N(0,1))
        params["warp_embedding"] = jax.random.normal(
            k2, (self.n_train, arch.embedding_dim))
        # localWarp MLP (garf_se3_field.py:281-298); torch default Linear init
        # for EVERY layer — including the last. The reference carries a
        # near-zero-init guard for the final layer (uniform(-1e-5,1e-5) +
        # zero bias, garf_se3_field.py:289-293) but it is DEAD CODE: the
        # condition is `li == len(L)` while `li` enumerates 0..len(L)-1, so
        # it never fires and the last layer keeps torch's default
        # kaiming-uniform init. Faithful parity means reproducing the dead
        # guard's non-effect, not the intent — do NOT "fix" this to a
        # near-identity warp init without breaking reference parity
        # (EVIDENCE_r4 §2c documents the resulting random-init behavior).
        layers = []
        dims = list(zip(arch.layers_warp[:-1], arch.layers_warp[1:]))
        for li, (k_in, k_out) in enumerate(dims):
            if li == 0:
                k_in = arch.embedding_dim
            if li in arch.skip_warp:
                k_in += arch.embedding_dim
            key, sub = jax.random.split(key)
            layers.append(garf_field._linear_init(sub, k_in, k_out))
        params["warp_mlp"] = layers
        return params

    def param_labels(self, params):
        labels = {k: "main" for k in params}
        labels["warp_embedding"] = "pose"
        labels["warp_mlp"] = "pose"
        return labels

    def _local_warp(self, params, embedding):
        """embedding [B,C] -> se(3) [B,6] (garf_se3_field.py:300-314)."""
        arch = self.opt.arch
        sigma = arch.sigma_warp
        feat = embedding
        n = len(params["warp_mlp"])
        for li, layer in enumerate(params["warp_mlp"]):
            if li in arch.skip_warp:
                feat = jnp.concatenate([feat, embedding], axis=-1)
            feat = feat @ layer["w"] + layer["b"]
            if li != n - 1:
                if arch.get("actfn_warp") == "gaussian":
                    feat = jnp.exp(-0.5 * feat ** 2 / sigma ** 2)
                else:
                    feat = jax.nn.relu(feat)
        return feat

    def get_train_pose(self, params, aux, data):
        pose = self._initial_pose(aux, data["pose"])
        se3 = self._local_warp(params, params["warp_embedding"])
        return pose_ops.compose([lie.se3_to_SE3(se3), pose])

    def get_all_training_poses(self, state):
        import numpy as np
        pose_GT = self.train_data["pose"]
        pose = self.get_train_pose(state["params"], state["aux"],
                                   {"pose": pose_GT})
        return np.asarray(pose), np.asarray(pose_GT)
