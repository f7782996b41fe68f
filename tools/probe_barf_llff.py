"""Control probe: SE3-BARF (`barf` model) with identity init on the same
dense blob+backdrop LLFF scene the INN probes use. If BARF itself cannot
recover poses here, the scene/protocol (not the INN) is the blocker."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import evidence_r2  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40000)
    ap.add_argument("--scene-root", default="/tmp/evidence_r2c/llff")
    ap.add_argument("--overrides", default="")
    args = ap.parse_args()

    overrides = [o for o in args.overrides.split(",") if o]
    opt = evidence_r2.build("barf_llff", [
        "--model=barf", "--yaml=barf_llff",
        "--data.root={}".format(args.scene_root), "--data.scene=blobfern",
        "--data.image_size=[240,320]",
        "--data.val_ratio=0.1",
        "--barf_c2f=[0.1,0.5]",
        "--max_iter=200000",
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/probe_barf_out", "--group=r2", "--name=probe",
        "--seed=0",
    ] + overrides)
    trainer = evidence_r2.make_trainer(opt)
    system, state = trainer.system, trainer.state
    R0, t0 = system.evaluate_camera_alignment(state)
    print("initial:", dict(rot=float(np.rad2deg(np.mean(R0))),
                           trans=float(np.mean(t0)),
                           rel=evidence_r2.relative_pose_error(system, state)),
          flush=True)
    state, _ = evidence_r2.train_loop(system, state, args.iters,
                                      spc=200, log_every=2000)
    val = system.validate(state)
    print("probe val PSNR: {:.2f}".format(val["psnr_val"]), flush=True)


if __name__ == "__main__":
    main()
