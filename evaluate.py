"""Evaluation driver (reconstructs the reference's missing evaluate.py;
invoked by scripts/eval_llff.sh / eval_dtu.sh — SURVEY.md §2.3 Q2):

    python evaluate.py --model=<model> --yaml=<options file> \
        [--resume | --load=<ckpt>] [--key.sub=value ...]

Loads the latest (or given) checkpoint, reports pose errors and novel-view
PSNR/SSIM/LPIPS, dumps quant.txt / quant_pose.txt / test-view PNGs, and writes
the novel-view videos when ffmpeg is available.
"""

import os
import shutil
import sys

from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.models.engine import Trainer
from neural_invertible_warp_tpu.utils import log


def generate_videos_synthesis(opt):
    """ffmpeg assembly of the dumped test views (reference model/nerf.py:201-239)."""
    if shutil.which("ffmpeg") is None:
        log.warn("ffmpeg not found; skipping video export")
        return
    test_path = os.path.join(opt.output_path, "test_view")
    for name, pattern in [("test_view_rgb.mp4", "rgb_%d.png"),
                          ("test_view_depth.mp4", "depth_%d.png")]:
        out = os.path.join(opt.output_path, name)
        os.system("ffmpeg -y -framerate 30 -i {}/{} -pix_fmt yuv420p {} "
                  ">/dev/null 2>&1".format(test_path, pattern, out))
        log.info("wrote {}".format(out))


def generate_novel_view_video(opt, trainer, n_views=60):
    """Circular novel-view render around the central camera
    (reference model/nerf_inn_llff.py:241-271)."""
    import numpy as np
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.ops import pose as pose_ops
    from neural_invertible_warp_tpu.utils.vis import write_video
    import imageio.v2 as imageio

    system, state = trainer.system, trainer.state
    pose_pred, pose_GT = system.get_all_training_poses(state)
    poses = pose_pred if pose_pred is not None else pose_GT
    scale = 1.0
    if pose_pred is not None and opt.data.dataset in ("llff", "iphone", "tandt"):
        system.prealign(state)
        sim3 = getattr(system, "sim3", None)
        if sim3 is not None:
            scale = float(sim3["s1"]) / float(sim3["s0"])
    centers = poses[..., 3]
    idx_center = int(np.linalg.norm(
        centers - centers.mean(0, keepdims=True), axis=-1).argmin())
    pose_novel = pose_ops.get_novel_view_poses(
        jnp.asarray(poses[idx_center]), N=n_views, scale=scale)
    novel_path = os.path.join(opt.output_path, "novel_view")
    os.makedirs(novel_path, exist_ok=True)
    intr = system.test_data["intr"][:1]
    progress = float(state["step"]) / opt.max_iter
    for i in range(n_views):
        out = system.render_image(state["params"], state["aux"],
                                  pose_novel[i:i + 1], intr, progress)
        rgb = np.clip(np.asarray(out["rgb"]).reshape(opt.H, opt.W, 3), 0, 1)
        imageio.imwrite(os.path.join(novel_path, "rgb_{}.png".format(i)),
                        (rgb * 255).astype(np.uint8))
    write_video(novel_path, "rgb_%d.png",
                os.path.join(opt.output_path, "novel_view_rgb.mp4"))
    log.info("novel-view video written")


def export_dtu_cameras(opt, trainer, mode="refined"):
    """IDR-style camera export for DTU mesh evaluation (reference
    model/barf_dtu.py:74-133, save_projection_matrix_for_dtu — dead code
    there: its only call site is commented out at barf_dtu.py:41).

    Writes ``<output_path>/cameras_<mode>.npz`` with one ``world_mat_i`` =
    ``[K @ w2c; 0 0 0 1]`` per TRAIN camera, with translations mapped back
    to the ORIGINAL DTU metric frame (undo the loader's scale_mat centering
    + 1/300 scaling; data/dtu.py load_scene_data)."""
    import numpy as np
    from neural_invertible_warp_tpu.data.dtu import SCALING_FACTOR

    system, state = trainer.system, trainer.state
    pose_pred, pose_GT = system.get_all_training_poses(state)
    poses_w2c = np.asarray(pose_pred if pose_pred is not None else pose_GT)
    R, t = poses_w2c[:, :3, :3], poses_w2c[:, :3, 3:]
    c2w_R = np.transpose(R, (0, 2, 1))
    c2w_t = -c2w_R @ t
    # undo the normalization: t_raw = t_norm / scaling_factor + norm_trans
    c2w_t = c2w_t / SCALING_FACTOR + trainer.train_data.norm_trans[None]
    w2c_R = np.transpose(c2w_R, (0, 2, 1))
    w2c_t = -w2c_R @ c2w_t
    K = np.asarray(trainer.train_data.intrinsics)[:, :3, :3]
    P = K @ np.concatenate([w2c_R, w2c_t], axis=-1)       # [B,3,4]
    bottom = np.tile(np.array([[[0, 0, 0, 1.0]]], np.float32),
                     (P.shape[0], 1, 1))
    world_mats = np.concatenate([P, bottom], axis=1).astype(np.float32)
    cameras = {"world_mat_%d" % i: world_mats[i]
               for i in range(world_mats.shape[0])}
    out = os.path.join(opt.output_path, "cameras_{}.npz".format(mode))
    np.savez(out, **cameras)
    log.info("wrote {} ({} cameras)".format(out, len(cameras)))
    return out


def main():
    opt_cmd = config.parse_arguments(sys.argv[1:])
    if "resume" not in opt_cmd and "load" not in opt_cmd:
        opt_cmd.resume = True
    opt = config.set_options(opt_cmd)
    trainer = Trainer(opt)
    trainer.load_dataset(eval_split="test" if opt.data.dataset == "blender" else "val")
    trainer.build_system()
    trainer.restore_checkpoint()
    results = trainer.system.evaluate_full(trainer.state)
    log.info("evaluation results: {}".format(results))
    if opt.data.dataset == "dtu" and opt_cmd.get("export_dtu_cameras"):
        export_dtu_cameras(opt, trainer)
    generate_videos_synthesis(opt)
    if opt.data.dataset != "blender" and opt.get("novel_view_video", True):
        try:
            generate_novel_view_video(opt, trainer)
        except Exception as e:
            log.warn("novel-view video failed: {}".format(e))
    if hasattr(trainer.system, "evaluate_camera_alignment"):
        from neural_invertible_warp_tpu.utils.vis import generate_videos_pose
        try:
            generate_videos_pose(opt, trainer)
        except Exception as e:
            log.warn("pose video failed: {}".format(e))


if __name__ == "__main__":
    main()
