"""DTU flagship probe: joint pose+field recovery for the paper's Table-2
models (`barf_inn_dtu` INN warp / `barf_dtu` SE3 control) on a synthetic
49-view DTU-format scene, at the paper's hyperparameters
(reference scripts/train_dtu.sh: --barf_c2f=[0.1,0.5]
--loss_weight.global_alignment in {2..4}).

Pose-init modes exercise the full reference protocol:
  * noisy_gt  — se(3) noise sigma=0.15 on GT (reference model/barf_dtu.py:40-46)
  * colmap    — the in-process SfM pipeline (ZNCC matcher) seeds the poses,
                chaining L8 into the flagship training path end-to-end
  * identity  — hardest case (translation-aligned identity init)

Logs pose error every --log-every iters; runs the full DTU evaluation
(depth abs/RMS, fg-masked PSNR/SSIM/LPIPS) at the end.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import evidence_r2  # noqa: E402  (reuse build/make_trainer/train_loop)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30000)
    ap.add_argument("--model", default="barf_inn_dtu",
                    choices=["barf_inn_dtu", "barf_dtu", "nerf_dtu"])
    ap.add_argument("--init", default="noisy_gt",
                    choices=["noisy_gt", "identity", "colmap", "given"])
    ap.add_argument("--scene-root", default="/tmp/probe_dtu/data")
    ap.add_argument("--size", default="150,200")
    ap.add_argument("--n-images", type=int, default=49)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=2000)
    ap.add_argument("--ga-weight", type=float, default=3.0,
                    help="log10 global-alignment weight (paper: 2..4)")
    ap.add_argument("--overrides", default="",
                    help="comma-separated extra --k=v config overrides")
    args = ap.parse_args()

    import synth_data
    H, W = (int(x) for x in args.size.split(","))
    scene_dir = os.path.join(args.scene_root, "rs_dtu_4", "DTU", "scan1")
    if not os.path.isdir(scene_dir):
        t0 = time.time()
        synth_data.make_blob_dtu_scene(args.scene_root, scene="scan1",
                                       n_images=args.n_images, H=H, W=W,
                                       seed=args.seed)
        print("scene built in {:.1f}s".format(time.time() - t0), flush=True)

    overrides = [o for o in args.overrides.split(",") if o]
    opt = evidence_r2.build(args.model, [
        "--model={}".format(args.model), "--yaml={}".format(args.model),
        "--data.root={}".format(args.scene_root), "--data.scene=scan1",
        "--data.image_size=[{},{}]".format(H, W),
        "--data.dtu.increase_depth_range_by_x_percent=0.15",
        "--max_iter=200000",
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/probe_dtu/out", "--group=r3",
        "--name={}_{}".format(args.model, args.init),
        "--seed={}".format(args.seed),
    ] + ([
        "--barf_c2f=[0.1,0.5]",
        "--pose.init={}".format(args.init),
        "--loss_weight.global_alignment={}".format(args.ga_weight),
    ] if args.model != "nerf_dtu" else []) + overrides)
    if args.model == "barf_dtu":
        # SE3 parameterization for the control model
        opt.pose.parameterization = "se3"

    t0 = time.time()
    trainer = evidence_r2.make_trainer(opt)
    system, state = trainer.system, trainer.state
    print("built in {:.1f}s".format(time.time() - t0), flush=True)
    if args.model != "nerf_dtu":
        R0, t0e = system.evaluate_camera_alignment(state)
        print("initial: rot {:.2f} deg, trans {:.4f}".format(
            float(np.rad2deg(np.mean(R0))), float(np.mean(t0e))), flush=True)

    state, history = evidence_r2.train_loop(
        system, state, args.iters, spc=200, log_every=args.log_every,
        pose_errors=args.model != "nerf_dtu")

    if args.model != "nerf_dtu":
        system.prealign(state)  # refresh sim3 for eval backtracking + depth scale
    results = system.evaluate_full(state, dump_images=False)
    print("final eval:", {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
