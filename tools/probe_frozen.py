"""Warp-only pose recovery against a frozen, GT-pose-trained field.

Stage 1: train `nerf` at known GT poses on the dense blob+backdrop LLFF
scene (the B0b control).
Stage 2: build `barf_inn_llff`, copy the trained field in, FREEZE it, and
train only the warp (MLP + latents) from identity pose init.

If the warp recovers the poses here, the INN gradient chain is sound at
full scale and the joint-training failure is a dynamics interaction with
the forming field; if it also rotates away, the warp training itself is
driving toward a wrong preferred solution.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import evidence_r2  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--field-iters", type=int, default=30000)
    ap.add_argument("--warp-iters", type=int, default=30000)
    ap.add_argument("--scene-root", default="/tmp/evidence_r2c/llff")
    ap.add_argument("--overrides", default="")
    args = ap.parse_args()

    import synth_data
    scene_dir = os.path.join(args.scene_root, "blobfern")
    if not os.path.isdir(scene_dir):
        synth_data.make_blob_llff_scene(
            args.scene_root, n_images=40, img_size=(240, 320),
            n_blobs=200, val_ratio=0.1, backdrop=True, dense=True)
        print("scene built", flush=True)

    common = [
        "--data.root={}".format(args.scene_root), "--data.scene=blobfern",
        "--data.image_size=[240,320]", "--data.val_ratio=0.1",
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/probe_frozen_out", "--group=r2", "--seed=0",
    ]

    # stage 1: field at GT poses
    opt1 = evidence_r2.build("nerf_llff", [
        "--model=nerf", "--yaml=nerf_llff", "--name=field",
        "--max_iter={}".format(args.field_iters)] + common)
    tr1 = evidence_r2.make_trainer(opt1)
    sys1, st1 = tr1.system, tr1.state
    st1, _ = evidence_r2.train_loop(sys1, st1, args.field_iters, spc=200,
                                    log_every=10000, pose_errors=False)
    tr1.state = st1
    val1 = sys1.validate(st1)
    print("stage1 field val PSNR: {:.2f}".format(val1["psnr_val"]), flush=True)

    # stage 2: frozen field, warp-only
    overrides = [o for o in args.overrides.split(",") if o]
    opt2 = evidence_r2.build("barf_inn_llff", [
        "--model=barf_inn_llff", "--yaml=barf_inn_llff", "--name=warp",
        "--barf_c2f=",                       # field is fully trained: no c2f
        "--inn.real_nvp.max_pe_iter={}".format(args.warp_iters // 2),
        "--loss_weight.global_alignment=4",
        "--max_iter={}".format(args.warp_iters)] + common + overrides)
    tr2 = evidence_r2.make_trainer(opt2)
    sys2, st2 = tr2.system, tr2.state
    # transplant + freeze the trained field
    st2["params"]["nerf"] = st1["params"]["nerf"]
    orig_labels = sys2.param_labels

    def frozen_labels(params):
        labels = orig_labels(params)
        labels["nerf"] = "frozen"
        return labels

    sys2.param_labels = frozen_labels
    st2 = dict(st2, opt_state=None)
    # rebuild optimizer state with the new labels
    import jax
    fresh = sys2.init_state(jax.random.PRNGKey(0))
    st2["opt_state"] = fresh["opt_state"]
    st2["params"] = dict(fresh["params"], nerf=st1["params"]["nerf"])

    R0, t0 = sys2.evaluate_camera_alignment(st2)
    print("warp initial:", dict(rot=float(np.rad2deg(np.mean(R0))),
                                trans=float(np.mean(t0)),
                                rel=evidence_r2.relative_pose_error(sys2, st2)),
          flush=True)
    st2, hist = evidence_r2.train_loop(sys2, st2, args.warp_iters, spc=200,
                                       log_every=2000)
    tr2.state = st2
    val2 = sys2.validate(st2)
    print("stage2 warp-only val PSNR: {:.2f} (field control {:.2f})".format(
        val2["psnr_val"], val1["psnr_val"]), flush=True)


if __name__ == "__main__":
    main()
