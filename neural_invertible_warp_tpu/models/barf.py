"""BARF: joint NeRF + per-image SE(3) pose refinement.

Parity with reference model/barf.py:
* per-image learnable se(3) vector composed onto the initial pose
  (identity for real scenes, noisy GT for Blender; model/barf.py:24-31,217-229);
* separate pose optimizer with its own exponential schedule and optional
  linear warmup (model/barf.py:33-56);
* coarse-to-fine PE mask driven by training progress (model/barf.py:256-268,
  handled by the shared render core via ``barf_c2f``);
* validation-time Procrustes pre-alignment of predicted vs GT camera centers;
  eval poses are GT test poses moved into the optimized frame via that sim3
  (model/barf.py:106-122,235-243);
* test-time photometric pose optimization for evaluation
  (model/barf.py:153-169) as a jitted inner Adam loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import align, lie, rays, sampling
from ..ops import pose as pose_ops
from .system import NerfSystem, exp_decay_gamma


class BarfSystem(NerfSystem):

    model_name = "barf"

    # ---------------------------------------------------------------- params

    def init_params(self, key):
        params = super().init_params(key)
        params["se3_refine"] = jnp.zeros((self.n_train, 6), jnp.float32)
        return params

    def init_aux(self, key):
        aux = super().init_aux(key)
        opt = self.opt
        if opt.data.dataset == "blender" and opt.camera.get("noise"):
            se3_noise = jax.random.normal(key, (self.n_train, 6)) * opt.camera.noise
            aux["pose_noise"] = lie.se3_to_SE3(se3_noise)
        return aux

    def param_labels(self, params):
        labels = {k: "main" for k in params}
        labels["se3_refine"] = "pose"
        return labels

    def pose_lr_schedule(self):
        opt = self.opt
        gamma = exp_decay_gamma(opt, opt.optim.lr_pose, opt.optim.get("lr_pose_end"))
        warmup = opt.optim.get("warmup_pose")

        def sched(count):
            lr = opt.optim.lr_pose * gamma ** count
            if warmup:
                lr = lr * jnp.minimum(1.0, count / warmup)
            return lr
        return sched

    def make_optimizers(self):
        txs = super().make_optimizers()
        from .system import clip_wrap
        txs["pose"] = clip_wrap(optax.adam(learning_rate=self.pose_lr_schedule()),
                                self.opt.optim.get("clip_norm_pose"))
        return txs

    # ----------------------------------------------------------------- poses

    def _initial_pose(self, aux, pose_GT):
        """Initial (pre-refinement) pose (model/barf.py:219-225)."""
        if self.opt.data.dataset == "blender":
            pose = pose_GT
            if "pose_noise" in aux:
                pose = pose_ops.compose([aux["pose_noise"], pose])
            return pose
        return pose_ops.identity_pose((pose_GT.shape[0],))

    def get_train_pose(self, params, aux, data):
        pose = self._initial_pose(aux, data["pose"])
        pose_refine = lie.se3_to_SE3(params["se3_refine"])
        return pose_ops.compose([pose_refine, pose])

    def get_all_training_poses(self, state):
        pose_GT = self.train_data["pose"]
        pose = self.get_train_pose(state["params"], state["aux"],
                                   {"pose": pose_GT})
        return np.asarray(pose), np.asarray(pose_GT)

    # ------------------------------------------------------------- alignment

    def prealign(self, state):
        """Procrustes sim3 between predicted and GT camera centers (host,
        float64 — reference model/barf.py:106-122)."""
        pose_pred, pose_GT = self.get_all_training_poses(state)
        center = np.zeros((pose_pred.shape[0], 1, 3), np.float32)
        center_pred = np.asarray(pose_ops.cam2world(jnp.asarray(center),
                                                    jnp.asarray(pose_pred)))[:, 0]
        center_GT = np.asarray(pose_ops.cam2world(jnp.asarray(center),
                                                  jnp.asarray(pose_GT)))[:, 0]
        try:
            sim3 = align.procrustes_analysis_np(center_GT, center_pred)
        except np.linalg.LinAlgError:
            sim3 = dict(t0=np.zeros(3, np.float32), t1=np.zeros(3, np.float32),
                        s0=np.float32(1), s1=np.float32(1),
                        R=np.eye(3, dtype=np.float32))
        self.sim3 = {k: jnp.asarray(v) for k, v in sim3.items()}
        return self.sim3

    def get_eval_pose(self, params, aux, pose_GT):
        if self.sim3 is None:
            return pose_GT
        return align.apply_sim3_to_poses(pose_GT, self.sim3,
                                         direction="GT_to_pred")

    def evaluate_camera_alignment(self, state):
        """Procrustes-aligned rotation/translation errors
        (model/barf.py:124-132). Returns per-image arrays (radians, world units)."""
        pose_pred, pose_GT = self.get_all_training_poses(state)
        sim3 = self.prealign(state)
        pose_aligned = align.apply_sim3_to_poses(jnp.asarray(pose_pred), sim3,
                                                 direction="pred_to_GT")
        R_err, t_err = pose_ops.pose_distance(pose_aligned, jnp.asarray(pose_GT))
        return np.asarray(R_err), np.asarray(t_err)

    def validate(self, state, max_views=None):
        res = super().validate(state, max_views=max_views)
        R_err, t_err = self.evaluate_camera_alignment(state)
        res["error_R"] = float(np.mean(R_err))
        res["error_t"] = float(np.mean(t_err))
        return res

    # ------------------------------------------- test-time photometric optim

    def make_test_time_optim(self):
        """100-step Adam refinement of a per-view se(3) correction
        (model/barf.py:153-169) as one jitted lax.fori_loop."""
        opt = self.opt
        n_rays = min(opt.nerf.rand_rays, self.HW)
        tx = optax.adam(opt.optim.lr_pose)

        def run(params, aux, pose_init, intr, pixels, key, progress):
            se3_test = jnp.zeros((1, 6), jnp.float32)
            opt_state = tx.init(se3_test)

            def loss_fn(se3, ray_idx, k):
                pose = pose_ops.compose([lie.se3_to_SE3(se3), pose_init])
                center, ray = rays.get_center_and_ray(pose, intr, H=self.H,
                                                      W=self.W, ray_idx=ray_idx)
                out = self.render_rays(params, center, ray, k, mode="test-optim",
                                       progress=progress, intr=intr)
                return jnp.mean((out["rgb"] - pixels[:, ray_idx]) ** 2)

            def body(i, carry):
                se3, opt_state = carry
                k_it = jax.random.fold_in(key, i)
                k_perm, k_render = jax.random.split(k_it)
                ray_idx = sampling.sample_ray_subset(
                    k_perm, self.HW, n_rays,
                    mode=(opt.get("tpu") or {}).get("ray_sample", "topk"))
                grads = jax.grad(loss_fn)(se3, ray_idx, k_render)
                updates, opt_state = tx.update(grads, opt_state, se3)
                return optax.apply_updates(se3, updates), opt_state

            se3_test, _ = jax.lax.fori_loop(0, opt.optim.test_iter, body,
                                            (se3_test, opt_state))
            return pose_ops.compose([lie.se3_to_SE3(se3_test), pose_init])
        return run

    def test_time_optimized_pose(self, state, pose, intr, pixels, key,
                                 progress=1.0):
        if getattr(self, "_tt_optim_jit", None) is None:
            self._tt_optim_jit = jax.jit(self.make_test_time_optim())
        return self._tt_optim_jit(state["params"], state["aux"], pose, intr,
                                  pixels, key, jnp.float32(progress))
