"""Short TPU probe: does identity-init barf_inn_llff recover on the
blob+backdrop LLFF scene (full-frame textured — no empty space to hide
degenerate per-view solutions in)?

Logs pose error every 2k iters for --iters (default 30k). Success signal:
err_R trending down by 10-20k (run A showed recovery is visible in the
first 5k). Used to decide whether to spend a full 200k evidence run.
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
    ap.add_argument("--scene-root", default="/tmp/evidence_r2b/llff")
    ap.add_argument("--size", default="240,320")
    ap.add_argument("--n-images", type=int, default=40)
    ap.add_argument("--n-blobs", type=int, default=24)
    ap.add_argument("--spread", type=float, default=0.5)
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-iter", type=int, default=200000,
                    help="config max_iter (schedule horizon: c2f/lr-decay "
                         "fractions scale with it)")
    ap.add_argument("--max-pe-iter", type=int, default=100000)
    ap.add_argument("--ckpt-freq", type=int, default=1000000)
    ap.add_argument("--out-root", default="/tmp/probe_b3_out")
    ap.add_argument("--log-every", type=int, default=2000)
    ap.add_argument("--overrides", default="",
                    help="comma-separated extra --k=v config overrides")
    args = ap.parse_args()

    import synth_data
    H, W = (int(x) for x in args.size.split(","))
    scene_dir = os.path.join(args.scene_root, "blobfern")
    if not os.path.isdir(scene_dir):
        synth_data.make_blob_llff_scene(
            args.scene_root, n_images=args.n_images, img_size=(H, W),
            n_blobs=args.n_blobs, val_ratio=0.1, backdrop=True,
            spread=args.spread, dense=args.dense)
        print("scene built", flush=True)

    overrides = ["--" + o.lstrip("-") for o in args.overrides.split(",") if o]
    opt = evidence_r2.build("barf_inn_llff", [
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.root={}".format(args.scene_root), "--data.scene=blobfern",
        "--data.image_size=[{},{}]".format(H, W),
        "--data.val_ratio=0.1",
        "--barf_c2f=[0.1,0.5]",
        "--inn.real_nvp.max_pe_iter={}".format(args.max_pe_iter),
        "--loss_weight.global_alignment=4",
        "--max_iter={}".format(args.max_iter),
        "--freq.scalar=1000000", "--freq.val=1000000",
        "--freq.ckpt={}".format(args.ckpt_freq),
        "--output_root={}".format(args.out_root), "--group=r2", "--name=probe",
        "--seed={}".format(args.seed),
    ] + overrides)
    trainer = evidence_r2.make_trainer(opt)
    system, state = trainer.system, trainer.state
    R0, t0 = system.evaluate_camera_alignment(state)
    print("initial:", dict(rot=float(np.rad2deg(np.mean(R0))),
                           trans=float(np.mean(t0))), flush=True)
    state, history = evidence_r2.train_loop(system, state, args.iters,
                                            spc=200,
                                            log_every=args.log_every)
    val = system.validate(state)
    print("probe val PSNR: {:.2f}".format(val["psnr_val"]), flush=True)


if __name__ == "__main__":
    main()
