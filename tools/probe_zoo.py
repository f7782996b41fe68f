"""Model-zoo TPU probes: short joint-recovery runs for the families that the
long evidence runs (EVIDENCE_r2/r3: barf, barf_inn_llff, barf_inn_dtu,
barf_dtu) don't cover — GARF (gaussian-activation field + SE3 refinement,
reference model/garf.py), garf_se3_field (se3 predicted by an
embedding-conditioned warp MLP, reference model/garf_se3_field.py) — plus a
barf_blender re-validation on the current kernel defaults.

Each run: blob scene, identity/noisy pose init per the family's reference
protocol, pose error logged every --log-every. These are demonstration
probes (few k iters), not paper-length runs.
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import evidence_r2  # noqa: E402

SCENE_ROOT = "/tmp/probe_zoo"


def llff_scene(H=240, W=320):
    import synth_data
    root = os.path.join(SCENE_ROOT, "llff")
    if not os.path.isdir(os.path.join(root, "blobfern")):
        synth_data.make_blob_llff_scene(root, n_images=30, img_size=(H, W),
                                        n_blobs=24, val_ratio=0.1,
                                        backdrop=True)
    return root, H, W


def blender_scene(size=128):
    import synth_data
    root = os.path.join(SCENE_ROOT, "blender")
    if not os.path.isdir(os.path.join(root, "blobs")):
        synth_data.make_blob_blender_scene(root, n_train=60, n_val=4,
                                           n_test=4, img_size=size,
                                           n_blobs=24)
    return root, size


def run(model, yaml, overrides, iters, log_every):
    opt = evidence_r2.build(yaml, [
        "--model={}".format(model), "--yaml={}".format(yaml),
        "--max_iter={}".format(max(iters, 10000)),
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/probe_zoo/out", "--group=zoo",
        "--name={}".format(model), "--seed=0",
    ] + overrides)
    t0 = time.time()
    trainer = evidence_r2.make_trainer(opt)
    system, state = trainer.system, trainer.state
    print("[{}] built in {:.1f}s".format(model, time.time() - t0), flush=True)
    has_pose = hasattr(system, "evaluate_camera_alignment")
    if has_pose:
        R0, te = system.evaluate_camera_alignment(state)
        print("[{}] initial: rot {:.2f} deg, trans {:.4f}".format(
            model, float(np.rad2deg(np.mean(R0))), float(np.mean(te))),
            flush=True)
    state, _ = evidence_r2.train_loop(system, state, iters, spc=200,
                                      log_every=log_every,
                                      pose_errors=has_pose)
    val = system.validate(state)
    print("[{}] val PSNR: {:.2f}".format(model, val["psnr_val"]), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--log-every", type=int, default=2000)
    ap.add_argument("--models", default="garf,garf_se3_field,barf_blender")
    args = ap.parse_args()

    models = args.models.split(",")
    if "garf" in models or "garf_se3_field" in models:
        root, H, W = llff_scene()
        llff_over = [
            "--data.root={}".format(root), "--data.scene=blobfern",
            "--data.image_size=[{},{}]".format(H, W), "--data.val_ratio=0.1",
        ]
        if "garf" in models:
            # reference GARF protocol: identity init, pose optimization from
            # step 0 (warmup is only legal with known init poses,
            # reference model/garf.py:22-23)
            run("garf", "garf_llff", llff_over, args.iters, args.log_every)
        if "garf_se3_field" in models:
            run("garf_se3_field", "garf_llff_se3", llff_over,
                args.iters, args.log_every)
    if "barf_blender" in models:
        root, size = blender_scene()
        run("barf", "barf_blender", [
            "--data.root={}".format(root), "--data.scene=blobs",
            "--data.image_size=[{0},{0}]".format(size),
            "--barf_c2f=[0.1,0.5]",
        ], min(args.iters, 6000), args.log_every)


if __name__ == "__main__":
    main()
