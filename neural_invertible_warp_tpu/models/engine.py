"""Training engine: dataset loading, train loop, logging, checkpointing.

Drives a ``system`` (models/system.py) through the reference lifecycle
(load_dataset -> build_networks -> setup_optimizer -> restore_checkpoint ->
train; reference train.py:20-29) with a single jitted step. Host work per
iteration is one dispatch + freq-gated scalar reads.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax

from .. import models as model_registry
from ..data import get_dataset
from ..utils import ckpt as ckpt_util
from ..utils import log


class Trainer:

    def __init__(self, opt):
        self.opt = opt
        os.makedirs(opt.output_path, exist_ok=True)
        self.tb = None

    # ----------------------------------------------------------------- setup

    def load_dataset(self, eval_split="val"):
        opt = self.opt
        data_mod = get_dataset(opt.data.dataset)
        log.info("loading training data...")
        self.train_data = data_mod.Dataset(opt, split="train",
                                           subset=opt.data.get("train_sub"))
        log.info("loading test data...")
        if opt.data.get("val_on_test"):
            eval_split = "test"
        self.test_data = data_mod.Dataset(opt, split=eval_split,
                                          subset=opt.data.get("val_sub"))

    def build_system(self):
        opt = self.opt
        log.info("building networks...")
        cls = model_registry.get_system_class(opt.model)
        self.system = cls(opt)
        self.system.attach_data(self.train_data.all_arrays(opt),
                                self.test_data.all_arrays(opt))
        self.system.train_image_names = self.train_data.image_names()
        self.state = self.system.init_state(jax.random.PRNGKey(opt.seed or 0))
        self.iter_start = 0

    def _ckpt_backend(self):
        return (self.opt.get("ckpt") or {}).get("backend") or "pickle"

    def restore_checkpoint(self):
        opt = self.opt
        if opt.get("resume"):
            self.state, it = ckpt_util.restore(
                opt.output_path, self.state, resume=opt.resume,
                backend=self._ckpt_backend())
            self.iter_start = it
        elif opt.get("load"):
            self.state, _ = ckpt_util.restore(
                opt.output_path, self.state, load_name=opt.load,
                backend=self._ckpt_backend())
        else:
            log.info("initializing weights from scratch...")

    def setup_visualizer(self):
        if self.opt.get("tb") is not None:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(logdir=self.opt.output_path, flush_secs=10)
            except Exception as e:  # pragma: no cover
                log.warn("tensorboard writer unavailable: {}".format(e))

    # ----------------------------------------------------------------- train

    def train(self):
        opt = self.opt
        log.title("TRAINING START")
        debug_cfg = opt.get("debug") or {}
        if debug_cfg.get("nan_check"):
            # SURVEY.md §5.2: the reference papers over NaNs with retry loops;
            # here a flag turns on jax's NaN debugger instead
            jax.config.update("jax_debug_nans", True)
        profile_dir = (opt.get("tpu") or {}).get("profile_dir")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        base_key = jax.random.PRNGKey(opt.seed or 0)
        t_start = time.time()
        max_iter = opt.max_iter
        early = opt.freq.get("early_termination") or max_iter
        end = min(max_iter, early)
        # scan-batch iterations between logging/val/ckpt boundaries: one device
        # dispatch per chunk instead of per step (host dispatch dominates at
        # this model scale)
        spc = max(1, int((opt.get("tpu") or {}).get("steps_per_call") or 1))
        freq_vis = opt.freq.get("vis")
        freqs = [opt.freq.scalar, opt.freq.val, opt.freq.ckpt] \
            + ([freq_vis] if freq_vis else [])
        it = self.iter_start
        while it < end:
            next_event = min([((it // f) + 1) * f for f in freqs] + [end])
            n = next_event - it
            if spc > 1 and n >= spc and hasattr(self.system, "train_multi_step"):
                keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                    np.arange(it, it + spc))
                self.state, metrics = self.system.train_multi_step(self.state,
                                                                   keys)
                it += spc
            else:
                key = jax.random.fold_in(base_key, it)
                self.state, metrics = self.system.train_step(self.state, key)
                it += 1
            if it % opt.freq.scalar == 0:
                self.log_scalars(metrics, it)
            if it % opt.freq.val == 0:
                self.run_validation(it)
            if freq_vis and it % freq_vis == 0:
                self.update_live_pose_view(it)
            if it % opt.freq.ckpt == 0:
                self.save_checkpoint(it)
        elapsed = time.time() - t_start
        n_steps = min(max_iter, early) - self.iter_start
        if n_steps > 0:
            log.info("trained {} iters in {:.1f}s ({:.2f} it/s)".format(
                n_steps, elapsed, n_steps / max(elapsed, 1e-9)))
        self.save_checkpoint(min(max_iter, early))
        if profile_dir:
            jax.profiler.stop_trace()
            log.info("profiler trace written to {}".format(profile_dir))
        if self.tb:
            self.tb.flush()
        log.title("TRAINING DONE")

    def log_scalars(self, metrics, step, split="train"):
        host = {k: float(v) for k, v in metrics.items()}
        msg = " ".join("{}={:.4g}".format(k, v) for k, v in sorted(host.items()))
        log.info("it {}: {}".format(step, msg))
        if self.tb:
            for k, v in host.items():
                self.tb.add_scalar("{}/{}".format(split, k), v, step)

    def run_validation(self, step):
        res = self.system.validate(self.state,
                                   max_views=self.opt.data.get("val_sub"))
        scalars = {k: v for k, v in res.items() if np.isscalar(v)}
        self.log_scalars(scalars, step, split="val")
        if self.tb and res.get("vis"):
            opt = self.opt
            from ..ops.render import invdepth_map
            from ..utils.vis import colorize_depth, tile_images
            import jax.numpy as jnp

            def to_rgb(vis):
                return np.clip(vis["rgb"].reshape(opt.H, opt.W, 3), 0, 1)

            def to_invdepth(vis):
                inv = np.asarray(invdepth_map(
                    jnp.asarray(vis["depth"]), jnp.asarray(vis["opacity"]),
                    ndc=bool(opt.camera.ndc))).reshape(opt.H, opt.W)
                return colorize_depth(inv)

            vis_all = res.get("vis_all") or [res["vis"]]
            self.tb.add_image("val/rgb", to_rgb(vis_all[0]), step,
                              dataformats="HWC")
            self.tb.add_image("val/invdepth", to_invdepth(vis_all[0]), step,
                              dataformats="HWC")
            # tiled grids (reference tb.num_images [rows, cols])
            if len(vis_all) > 1 and opt.get("tb") and opt.tb.get("num_images"):
                rows, cols = (int(x) for x in opt.tb.num_images)
                self.tb.add_image(
                    "val/rgb_grid",
                    tile_images([to_rgb(v) for v in vis_all], rows, cols),
                    step, dataformats="HWC")
                self.tb.add_image(
                    "val/invdepth_grid",
                    tile_images([to_invdepth(v) for v in vis_all], rows, cols),
                    step, dataformats="HWC")
        return res

    def update_live_pose_view(self, step):
        """Refresh poses.html DURING training every freq.vis iterations.

        The reference's visdom wireframe window updates live while training
        (util_vis.py:76-157, wired at model/base.py:66-76); here the same
        role is played by rewriting the offline interactive viewer with the
        pose trajectory so far — open output_path/poses.html in a browser
        and reload to scrub through iterations while the run is going.
        """
        system = self.system
        if not hasattr(system, "get_all_training_poses"):
            return None
        pose, pose_ref = system.get_all_training_poses(self.state)
        if pose is None:
            return None
        pose = np.asarray(pose)
        if hasattr(system, "prealign"):
            try:
                system.prealign(self.state)
                if system.sim3 is not None:
                    import jax.numpy as jnp
                    from ..ops import align
                    pose = np.asarray(align.apply_sim3_to_poses(
                        jnp.asarray(pose), system.sim3, "pred_to_GT"))
            except Exception as e:  # alignment can fail early in training
                log.warn("live pose view: prealign skipped ({})".format(e))
        if not hasattr(self, "_live_pose_frames"):
            self._live_pose_frames = []
        self._live_pose_frames.append((int(step), pose))
        from ..utils.pose_viewer import export_interactive_poses
        out = os.path.join(self.opt.output_path, "poses.html")
        cam_depth = (self.opt.get("visdom") or {}).get("cam_depth", 0.2)
        export_interactive_poses(
            out, self._live_pose_frames,
            pose_ref=np.asarray(pose_ref) if pose_ref is not None else None,
            cam_depth=cam_depth)
        return out

    def save_checkpoint(self, it):
        path = ckpt_util.save(self.opt.output_path, self.state, it,
                              backend=self._ckpt_backend())
        log.info("checkpoint saved: {}".format(path))


def run_training(opt):
    """Full lifecycle, mirroring reference train.py:20-29."""
    if opt.model in ("homography", "planar", "img_relu"):
        from .planar import run_planar_training
        return run_planar_training(opt)
    trainer = Trainer(opt)
    trainer.load_dataset()
    trainer.build_system()
    trainer.restore_checkpoint()
    trainer.setup_visualizer()
    trainer.train()
    return trainer
