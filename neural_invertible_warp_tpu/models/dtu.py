"""DTU model family: NeRF / SE(3)-BARF / INN-warp with depth-error evaluation.

Parity targets:
* ``nerf_dtu`` (reference model/nerf_dtu.py): per-scene depth range from the
  dataset, depth abs/RMSE logging against GT depth, masked eval metrics,
  depth rescaled by the recovered sim3 scale;
* ``barf_dtu`` (model/barf_dtu.py): pose initialization modes identity /
  noisy_gt / given / colmap (colmap is an optional host-side subsystem; gated),
  SE(3) refinement on the initial poses, ATE (>=10 cams) or exhaustive-pair
  (<10 cams) trajectory alignment, eval poses backtracked into the optimized
  frame;
* ``barf_inn_dtu`` (model/barf_inn_dtu.py + model/pose_models/inn.py): the
  paper's Table-2 model — per-image latent + shared invertible warp applied to
  rays expressed in the initial-pose world frame, SVD pose readout composed
  with the initial poses.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import align, lie, metrics as metrics_ops, rays
from ..ops import pose as pose_ops
from ..utils import log
from .barf import BarfSystem
from .inn_warp import InnWarpSystem
from .system import NerfSystem


# ---------------------------------------------------------------------------
# shared DTU behavior
# ---------------------------------------------------------------------------

class DTUMixin:
    """Depth range handling + depth metrics + DTU alignment machinery."""

    def attach_data(self, train_arrays, test_arrays):
        super().attach_data(train_arrays, test_arrays)
        # constant scene depth range (near 1.2 / far 5.2; data/dtu.py:110-111)
        self.scene_depth_range = tuple(
            float(x) for x in np.asarray(train_arrays["depth_range"])[0])
        for split in (self.train_data, self.test_data):
            if "depth_gt" in split:
                B = split["depth_gt"].shape[0]
                split["depth_gt_pixels"] = split["depth_gt"].reshape(B, -1)
                split["valid_depth_pixels"] = split["valid_depth_gt"].reshape(B, -1)

    def render_rays(self, params, center, ray, key, **kwargs):
        kwargs.setdefault("depth_range", self.scene_depth_range)
        return super().render_rays(params, center, ray, key, **kwargs)

    def compute_loss(self, params, aux, data, out, target, step, extras):
        losses = super().compute_loss(params, aux, data, out, target, step,
                                      extras)
        if "depth_gt_pixels" in data and "ray_idx" in extras:
            abs_e, rmse = metrics_ops.depth_error_on_rays(
                jax.lax.stop_gradient(out["depth"]), data["depth_gt_pixels"],
                data["valid_depth_pixels"], extras["ray_idx"])
            extras["depth_abs"] = abs_e
            extras["depth_rmse"] = rmse
        return losses

    def depth_scaling_factor(self):
        """sim3 scale used to rescale rendered depth (model/nerf_dtu.py:227-235)."""
        ssim = getattr(self, "ssim_est_gt_c2w", None)
        return float(ssim["s"]) if ssim else 1.0


class PoseInitMixin:
    """Initial-pose modes for DTU (reference model/barf_dtu.py:31-71)."""

    def set_initial_poses(self, key):
        opt = self.opt
        gt = np.asarray(self.train_data["pose"])
        mode = opt.pose.init
        if mode == "identity":
            init = np.tile(np.eye(3, 4, dtype=np.float32), (self.n_train, 1, 1))
            init = align.align_translations(gt, init)
        elif mode == "noisy_gt":
            se3_noise = jax.random.normal(key, (self.n_train, 6)) * opt.pose.noise
            init = np.asarray(pose_ops.compose(
                [lie.se3_to_SE3(se3_noise), jnp.asarray(gt)]))
        elif mode == "given":
            init = gt.copy()
        elif mode == "colmap_files":
            # Seed from an EXISTING on-disk COLMAP reconstruction
            # (images.bin/cameras.bin), matching the reference's
            # get_poses_and_idx semantics (utils/colmap_initialization/
            # sfm.py:246-284): match by image name, identity + excluded for
            # unreconstructed images, then sim3-align onto the GT frame.
            from ..utils import colmap_io
            model_dir = opt.pose.get("model_dir")
            assert model_dir, "pose.init=colmap_files needs pose.model_dir"
            names = getattr(self, "train_image_names", None)
            init, valid, excluded = colmap_io.poses_from_model(
                model_dir, image_names=names)
            if init.shape[0] != self.n_train:
                raise ValueError(
                    "COLMAP model has {} images but the split has {} (and "
                    "no per-image names to match by)".format(
                        init.shape[0], self.n_train))
            self.sfm_valid_idx = valid
            self.sfm_excluded = excluded
            log.info("COLMAP-file pose init: {} valid, excluded {}".format(
                len(valid), excluded))
            init = self._align_sfm_to_gt(init, gt, valid)
        elif mode == "colmap":
            # SfM initialization (reference model/barf_dtu.py:55-67 +
            # utils/colmap_initialization/sfm.py:337-406): matcher ->
            # reconstruction -> sim3-align the recovered trajectory onto the
            # GT frame (fixes the arbitrary SfM gauge/scale, as the
            # reference does via prealign_w2c_small_camera_systems).
            import os
            from ..utils import colmap_init
            sfm_cfg = opt.pose.get("sfm") or {}
            save_dir = None
            if opt.get("output_path"):
                save_dir = os.path.join(opt.output_path, "sfm")
            matcher_kwargs = {}
            if sfm_cfg.get("weights_path"):   # e.g. pdcnet checkpoint
                matcher_kwargs["weights_path"] = sfm_cfg["weights_path"]
            init, valid, excluded = colmap_init.compute_sfm_poses(
                np.asarray(self.train_data["image"]),
                np.asarray(self.train_data["intr"]),
                matcher=sfm_cfg.get("matcher") or "zncc",
                quant_px=sfm_cfg.get("quant_px") or 1.0,
                save_dir=save_dir, matcher_kwargs=matcher_kwargs)
            self.sfm_valid_idx = valid
            self.sfm_excluded = excluded
            log.info("SfM pose init: {} valid, excluded {}".format(
                len(valid), excluded))
            init = self._align_sfm_to_gt(init, gt, valid)
        else:
            raise ValueError("unknown pose.init: {}".format(mode))
        return jnp.asarray(np.asarray(init, np.float32))

    def _align_sfm_to_gt(self, init, gt, valid):
        """Sim3-align reconstructed poses onto the GT frame, FITTING on the
        valid subset only — identity placeholders for excluded images must
        not bias the fit — then applying to the full set."""
        idx = np.asarray(valid if len(valid) else np.arange(init.shape[0]))
        fit = align.prealign_w2c_small_camera_systems if len(idx) <= 9 \
            else align.prealign_w2c_large_camera_systems
        _, ssim = fit(init[idx], gt[idx])
        return align.apply_traj_align_ssim(init, ssim)


class DTUAlignmentMixin:
    """Trajectory alignment for eval (ATE >=10 cams, pairwise otherwise)."""

    def prealign(self, state):
        pose_pred, pose_GT = self.get_all_training_poses(state)
        if pose_pred.shape[0] > 9:
            _, ssim = align.prealign_w2c_large_camera_systems(pose_pred, pose_GT)
        else:
            _, ssim = align.prealign_w2c_small_camera_systems(pose_pred, pose_GT)
        self.ssim_est_gt_c2w = ssim
        return ssim

    def get_eval_pose(self, params, aux, pose_GT):
        ssim = getattr(self, "ssim_est_gt_c2w", None)
        if ssim is None:
            return pose_GT
        return jnp.asarray(align.backtrack_from_aligning_the_trajectory(
            np.asarray(pose_GT), ssim))

    def evaluate_camera_alignment(self, state):
        """Aligned rotation/translation errors in the c2w convention
        (model/barf_dtu.py:140-194). Returns (R_err [rad], t_err)."""
        pose_pred, pose_GT = self.get_all_training_poses(state)
        if pose_pred.shape[0] > 9:
            aligned, ssim = align.prealign_w2c_large_camera_systems(pose_pred,
                                                                    pose_GT)
        else:
            aligned, ssim = align.prealign_w2c_small_camera_systems(pose_pred,
                                                                    pose_GT)
        self.ssim_est_gt_c2w = ssim
        return align._pose_errors_np(aligned, pose_GT)


# ---------------------------------------------------------------------------
# systems
# ---------------------------------------------------------------------------

class NerfDTUSystem(DTUMixin, NerfSystem):
    model_name = "nerf_dtu"

    def _forward_train(self, params, aux, data, ray_idx, key, step):
        out, target, extras = super()._forward_train(params, aux, data,
                                                     ray_idx, key, step)
        extras["ray_idx"] = ray_idx
        return out, target, extras


class BarfDTUSystem(DTUMixin, PoseInitMixin, DTUAlignmentMixin, BarfSystem):
    model_name = "barf_dtu"

    def init_aux(self, key):
        aux = {}
        k_init, _ = jax.random.split(key)
        aux["initial_poses_w2c"] = self.set_initial_poses(k_init)
        return aux

    def get_train_pose(self, params, aux, data):
        pose_refine = lie.se3_to_SE3(params["se3_refine"])
        return pose_ops.compose([pose_refine, aux["initial_poses_w2c"]])

    def get_all_training_poses(self, state):
        pose = self.get_train_pose(state["params"], state["aux"], None)
        return np.asarray(pose), np.asarray(self.train_data["pose"])

    def _forward_train(self, params, aux, data, ray_idx, key, step):
        out, target, extras = super()._forward_train(params, aux, data,
                                                     ray_idx, key, step)
        extras["ray_idx"] = ray_idx
        return out, target, extras


class InnDTUSystem(DTUMixin, PoseInitMixin, DTUAlignmentMixin, InnWarpSystem):
    """barf_inn_dtu: INN warp on rays expressed in the initial-pose frame."""

    model_name = "barf_inn_dtu"

    def init_aux(self, key):
        opt = self.opt
        if opt.get("pose") and opt.pose.get("parameterization"):
            assert opt.pose.parameterization == "inn", \
                "barf_inn_dtu requires pose.parameterization == inn " \
                "(reference model/barf_inn_dtu.py:323)"
        k_init, _ = jax.random.split(key)
        aux = {}
        aux["initial_poses_w2c"] = self.set_initial_poses(k_init)
        aux["global_rigid"] = pose_ops.identity_pose((self.n_train,))
        return aux

    def latent_dim(self):
        return self.opt.inn.real_nvp.get("latent_dim",
                                         self.opt.inn.real_nvp.d_hidden)

    def init_params(self, key):
        from ..ops import inn, nerf_mlp
        opt = self.opt
        key, k_nerf, k_warp, k_lat = jax.random.split(key, 4)
        params = {}
        params["nerf"] = nerf_mlp.init_nerf_params(
            k_nerf, self.arch, view_dep=opt.nerf.view_dep)
        if opt.nerf.fine_sampling:
            key, k_fine = jax.random.split(key)
            params["nerf_fine"] = nerf_mlp.init_nerf_params(
                k_fine, self.arch, view_dep=opt.nerf.view_dep)
        params["warp_mlp"] = inn.init_deform_params(
            k_warp, self.latent_dim(), d_hidden=opt.inn.real_nvp.d_hidden,
            n_blocks=3, n_layers=1, multires=self.multires)
        params["warp_latent"] = jax.random.normal(
            k_lat, (self.n_train, self.latent_dim()))
        return params

    def param_labels(self, params):
        labels = {k: "main" for k in params}
        labels["warp_mlp"] = "pose"
        labels["warp_latent"] = "latent"
        return labels

    def _warp_feat(self, params):
        return params["warp_latent"]

    def _forward_train(self, params, aux, data, ray_idx, key, step):
        opt = self.opt
        # rays expressed in the INITIAL-pose world frame
        # (model/pose_models/inn.py:63-77)
        center_init, grid_init = rays.get_unwarped_center_and_ray(
            data["intr"], H=self.H, W=self.W, ray_idx=ray_idx,
            pose_init=aux["initial_poses_w2c"])
        center_init = jax.lax.stop_gradient(center_init)
        grid_init = jax.lax.stop_gradient(grid_init)
        from ..parallel import mesh as mesh_lib
        center_init = mesh_lib.shard_batch_rays(center_init)
        grid_init = mesh_lib.shard_batch_rays(grid_init)
        N = ray_idx.shape[0]
        coords = jnp.concatenate([grid_init, center_init], axis=1)
        warped = self.warp_points(params, coords, step)
        grid_w, center_w = warped[:, :N], warped[:, N:]
        ray = grid_w - center_w
        progress = step.astype(jnp.float32) / opt.max_iter
        target = mesh_lib.shard_batch_rays(data["pixels"][:, ray_idx])
        out = self.render_rays(params, center_w, ray, key, mode="train",
                               progress=progress, intr=data["intr"],
                               target=target)
        extras = dict(grid_cam=grid_init, center_cam=center_init,
                      grid_w=grid_w, center_w=center_w, ray_idx=ray_idx)
        return out, target, extras

    def get_all_training_poses(self, state):
        """Readout = pose_global ∘ initial (model/barf_inn_dtu.py:407-413)."""
        pose = pose_ops.compose([state["aux"]["global_rigid"],
                                 state["aux"]["initial_poses_w2c"]])
        return np.asarray(pose), np.asarray(self.train_data["pose"])


def _dtu_evaluate_full(self, state, output_path=None, dump_images=True,
                       test_optim=None):
    """DTU evaluation: adds fg-masked PSNR/SSIM/LPIPS (white-composited
    images, reference model/nerf_dtu.py:237-248) and sim3-scaled depth
    errors to the base metrics (reference model/nerf_dtu.py:202-300)."""
    from ..ops import lpips as lpips_mod
    from ..ops import ssim as ssim_mod
    results = super(DTUMixin, self).evaluate_full(
        state, output_path=output_path, dump_images=dump_images,
        test_optim=test_optim)
    data = self.test_data
    n = int(data["image"].shape[0])
    scale = self.depth_scaling_factor()
    progress = float(state["step"]) / self.opt.max_iter
    lpips_ok = lpips_mod.available()
    depth_abs, depth_rms = [], []
    psnr_masked, ssim_masked, lpips_masked = [], [], []
    for i in range(n):
        pose = self.get_eval_pose(state["params"], state["aux"],
                                  data["pose"][i:i + 1])
        out = self.render_image(state["params"], state["aux"], pose,
                                data["intr"][i:i + 1], progress)
        dkey = "depth_fine" if "depth_fine" in out else "depth"
        pred_depth = jnp.asarray(out[dkey]).reshape(-1)
        a, r = metrics_ops.depth_error_full(
            pred_depth, data["depth_gt"][i], data["valid_depth_gt"][i],
            scaling_factor=scale)
        depth_abs.append(float(a))
        depth_rms.append(float(r))
        rkey = "rgb_fine" if "rgb_fine" in out else "rgb"
        pred = jnp.asarray(out[rkey]).reshape(self.H, self.W, 3)
        mask = jnp.asarray(data["fg_mask"][i]) > 0.5
        pred_fg = metrics_ops.white_composite(pred, mask)
        gt_fg = metrics_ops.white_composite(jnp.asarray(data["image"][i]),
                                            mask)
        psnr_masked.append(float(metrics_ops.masked_psnr(
            pred, data["image"][i], mask)))
        pred_fg_t = pred_fg.transpose(2, 0, 1)[None]
        gt_fg_t = gt_fg.transpose(2, 0, 1)[None]
        ssim_masked.append(float(ssim_mod.ssim(pred_fg_t, gt_fg_t)))
        if lpips_ok:
            lpips_masked.append(lpips_mod.lpips(pred_fg_t * 2 - 1,
                                                gt_fg_t * 2 - 1))
    results["depth_abs"] = float(np.mean(depth_abs))
    results["depth_rms"] = float(np.mean(depth_rms))
    results["PSNR_masked"] = float(np.mean(psnr_masked))
    results["SSIM_masked"] = float(np.mean(ssim_masked))
    results["LPIPS_masked"] = float(np.mean(lpips_masked)) if lpips_ok \
        else None
    log.info("DTU depth abs {:.4f} | rms {:.4f} | masked PSNR {:.2f} | "
             "masked SSIM {:.3f} | masked LPIPS {}".format(
                 results["depth_abs"], results["depth_rms"],
                 results["PSNR_masked"], results["SSIM_masked"],
                 "{:.4f}".format(results["LPIPS_masked"]) if lpips_ok
                 else "unavailable"))
    return results


DTUMixin.evaluate_full = _dtu_evaluate_full
