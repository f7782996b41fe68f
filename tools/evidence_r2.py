"""Round-2 evidence: joint pose+field recovery on BARF-friendly synthetic scenes.

Three runs on one TPU chip (VERDICT.md "Next round" item 2):
  A  barf (SE3 refinement) on a band-limited Gaussian-blob Blender scene,
     100 train views, se(3) pose noise sigma=0.15, c2f [0.1,0.5] —
     target: rotation error < 1 deg (the paper's BARF-recovery behavior,
     reference model/barf.py:106-132).
  B0 nerf at known GT poses on a blob LLFF scene — the held-out PSNR control.
  B  barf_inn_llff (the paper model, identity pose init) on the same scene —
     target: pose error dropping >= 10x and held-out PSNR within ~1-2 dB of B0
     (reference model/barf_inn_llff.py:305-364).

Usage: python tools/evidence_r2.py [--quick] [--out EVIDENCE_r2.md]
  --quick runs a tiny-CPU smoke version of all three (script validation only).
"""

import argparse
import os
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SCENE_ROOT = "/tmp/evidence_r2"
OUT_ROOT = "/tmp/evidence_r2_out"


def build(yaml_name, overrides):
    from neural_invertible_warp_tpu import config
    opt = config.load_options("options/{}.yaml".format(yaml_name))
    over = config.parse_arguments(overrides)
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    config.process_options(opt)
    return opt


def make_trainer(opt):
    from neural_invertible_warp_tpu.models.engine import Trainer
    trainer = Trainer(opt)
    trainer.load_dataset()
    trainer.build_system()
    return trainer


def relative_pose_error(system, state, n_pairs=200, seed=0):
    """Gauge-invariant pose metric: mean relative-rotation error over random
    camera pairs (deg). The absolute (Procrustes-aligned) error is
    meaningless while the predicted camera centers are still collapsed at
    the identity init — the sim3 rotation fit to a degenerate center cloud
    is noise."""
    pose_pred, pose_GT = system.get_all_training_poses(state)
    if pose_pred is None:
        return float("nan")
    rng = np.random.RandomState(seed)
    B = pose_pred.shape[0]
    errs = []
    for _ in range(n_pairs):
        i, j = rng.choice(B, 2, replace=False)
        R_rel = pose_pred[i, :, :3] @ pose_pred[j, :, :3].T
        R_rel_gt = pose_GT[i, :, :3] @ pose_GT[j, :, :3].T
        cos = (np.trace(R_rel @ R_rel_gt.T) - 1) / 2
        errs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
    return float(np.mean(errs))


def train_loop(system, state, iters, spc=100, log_every=5000, pose_errors=True):
    """Scan-batched training with periodic pose-error probes."""
    import jax
    base_key = jax.random.PRNGKey(0)
    keys_fn = jax.vmap(lambda i: jax.random.fold_in(base_key, i))
    history = []
    t0 = time.time()
    it = 0
    while it < iters:
        n = min(spc, iters - it)
        if n < spc:  # tail smaller than one scan chunk: pad by rerunning keys
            n = spc
        state, metrics = system.train_multi_step(state, keys_fn(np.arange(it, it + n)))
        it += n
        if it % log_every == 0 or it >= iters:
            row = dict(it=it, psnr=float(metrics["psnr"]),
                       elapsed=time.time() - t0)
            if "loss_global_alignment" in metrics:
                row["loss_ga"] = float(metrics["loss_global_alignment"])
            if pose_errors:
                R, t = system.evaluate_camera_alignment(state)
                row["err_R_deg"] = float(np.rad2deg(np.mean(R)))
                row["err_t"] = float(np.mean(t))
                row["err_R_rel"] = relative_pose_error(system, state)
            history.append(row)
            print(row, flush=True)
    return state, history


def fmt_history(history):
    keys = list(history[0].keys())
    lines = ["| " + " | ".join(keys) + " |",
             "|" + "---|" * len(keys)]
    for r in history:
        cells = []
        for k in keys:
            v = r[k]
            cells.append("{:.4g}".format(v) if isinstance(v, float) else str(v))
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines) + "\n"


# --------------------------------------------------------------------- run A

def run_barf_blender(f, quick=False):
    import synth_data
    size = 32 if quick else 128
    n_train = 6 if quick else 100
    iters = 200 if quick else 200000
    root = os.path.join(SCENE_ROOT, "blender")
    scene_dir = os.path.join(root, "blobs")
    if not os.path.isdir(scene_dir):
        synth_data.make_blob_blender_scene(root, n_train=n_train, n_val=4,
                                           n_test=4, img_size=size, n_blobs=24)
    opt = build("barf_blender", [
        "--model=barf", "--yaml=barf_blender",
        "--data.root={}".format(root), "--data.scene=blobs",
        "--data.image_size=[{0},{0}]".format(size),
        "--barf_c2f=[0.1,0.5]",
        "--max_iter={}".format(iters),
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root={}".format(OUT_ROOT), "--group=r2", "--name=barf_blender",
        "--seed=0",
    ] + (["--nerf.sample_intvs=32", "--nerf.rand_rays=512"] if quick else []))
    trainer = make_trainer(opt)
    system, state = trainer.system, trainer.state

    R0, t0 = system.evaluate_camera_alignment(state)
    err0 = dict(rot=float(np.rad2deg(np.mean(R0))), trans=float(np.mean(t0)))
    print("A initial pose error:", err0, flush=True)
    state, history = train_loop(system, state, iters, spc=50 if quick else 200,
                                log_every=50 if quick else 5000)
    trainer.state = state
    val = system.validate(state)

    f.write("## Run A — `barf` (SE3) on blob-Blender, pose noise sigma=0.15\n\n")
    f.write("Band-limited Gaussian-blob scene (bounded content, smooth "
            "textures), {n} train views at {s}x{s}, se(3) noise sigma=0.15 on "
            "GT poses, BARF c2f [0.1,0.5], {it} iterations, one TPU chip.\n\n"
            .format(n=n_train, s=size, it=iters))
    f.write("Initial pose error: rot {rot:.3f} deg, trans {trans:.4f}\n\n"
            .format(**err0))
    f.write(fmt_history(history))
    f.write("\nFinal: rot error {:.4f} deg ({}x drop), held-out PSNR "
            "(sim3-aligned GT test poses) {:.2f} dB\n\n".format(
                history[-1]["err_R_deg"],
                int(err0["rot"] / max(history[-1]["err_R_deg"], 1e-6)),
                val["psnr_val"]))
    return dict(err0=err0, final=history[-1], psnr_val=val["psnr_val"])


# ---------------------------------------------------------------- runs B0/B

def make_llff_blob_scene(quick, backdrop=False):
    import synth_data
    size = (24, 32) if quick else (240, 320)
    n_images = 5 if quick else 40
    sub = "llff_backdrop" if backdrop else "llff"
    root = os.path.join(SCENE_ROOT, sub)
    scene_dir = os.path.join(root, "blobfern")
    if not os.path.isdir(scene_dir):
        # backdrop variant is also DENSE (full-frame 3D structure at many
        # depths): kills both the empty-space memorization gauge and the
        # planar homography ambiguity
        synth_data.make_blob_llff_scene(root, n_images=n_images, img_size=size,
                                        n_blobs=200 if backdrop else 24,
                                        backdrop=backdrop, dense=backdrop,
                                        val_ratio=0.25 if quick else 0.1)
    return root, size, n_images


def run_llff_control(f, quick=False, backdrop=False):
    root, size, _ = make_llff_blob_scene(quick, backdrop=backdrop)
    iters = 200 if quick else 50000
    opt = build("nerf_llff", [
        "--model=nerf", "--yaml=nerf_llff",
        "--data.root={}".format(root), "--data.scene=blobfern",
        "--data.image_size=[{},{}]".format(*size),
        "--data.val_ratio={}".format(0.25 if quick else 0.1),
        "--max_iter={}".format(iters),
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root={}".format(OUT_ROOT), "--group=r2",
        "--name=nerf_control{}".format("_bd" if backdrop else ""),
        "--seed=0",
    ] + (["--nerf.sample_intvs=32", "--nerf.rand_rays=512"] if quick else []))
    trainer = make_trainer(opt)
    system, state = trainer.system, trainer.state
    state, history = train_loop(system, state, iters, spc=50 if quick else 200,
                                log_every=50 if quick else 10000,
                                pose_errors=False)
    trainer.state = state
    val = system.validate(state)
    f.write("## Run B0{} — `nerf` control at known GT poses (blob{}-LLFF)"
            "\n\n".format("b" if backdrop else "",
                          "+backdrop" if backdrop else ""))
    f.write("Same {} LLFF scene as run {}, GT poses, {} iterations.\n\n"
            .format("blob+backdrop" if backdrop else "blob",
                    "B3" if backdrop else "B", iters))
    f.write(fmt_history(history))
    f.write("\nHeld-out validation PSNR at GT poses: {:.2f} dB\n\n"
            .format(val["psnr_val"]))
    return dict(psnr_val=val["psnr_val"])


def run_inn_llff(f, quick=False, control_psnr=None, backdrop=False):
    root, size, _ = make_llff_blob_scene(quick, backdrop=backdrop)
    iters = 200 if quick else 200000
    opt = build("barf_inn_llff", [
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.root={}".format(root), "--data.scene=blobfern",
        "--data.image_size=[{},{}]".format(*size),
        "--data.val_ratio={}".format(0.25 if quick else 0.1),
        "--barf_c2f=[0.1,0.5]",
        "--inn.real_nvp.max_pe_iter={}".format(iters // 2),
        "--loss_weight.global_alignment=4",
        "--max_iter={}".format(iters),
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root={}".format(OUT_ROOT), "--group=r2",
        "--name=inn_llff{}".format("_bd" if backdrop else ""),
        "--seed=0",
    ] + (["--nerf.sample_intvs=32", "--nerf.rand_rays=512",
          "--inn.real_nvp.d_hidden=32", "--warp_latent.embed_dim=16"]
         if quick else []))
    trainer = make_trainer(opt)
    system, state = trainer.system, trainer.state
    R0, t0 = system.evaluate_camera_alignment(state)
    err0 = dict(rot=float(np.rad2deg(np.mean(R0))), trans=float(np.mean(t0)))
    print("B initial pose error:", err0, flush=True)
    state, history = train_loop(system, state, iters, spc=50 if quick else 200,
                                log_every=50 if quick else 5000)
    trainer.state = state
    val = system.validate(state)
    name = "B3" if backdrop else "B"
    scene_desc = "blob+backdrop (full-frame textured)" if backdrop else "blob"
    f.write("## Run {} — `barf_inn_llff` (paper model, identity init) on "
            "{}-LLFF\n\n".format(name, scene_desc))
    f.write("Wide forward-facing {} LLFF scene ({}x{}, 36 train / 4 val), "
            "identity pose init, full INN warp, SVD global-alignment weight "
            "1e4, c2f [0.1,0.5], {} iterations.\n\n".format(
                scene_desc, size[0], size[1], iters))
    f.write("Initial pose error (identity init): rot {rot:.3f} deg, trans "
            "{trans:.4f}\n\n".format(**err0))
    f.write(fmt_history(history))
    drop = err0["rot"] / max(history[-1]["err_R_deg"], 1e-6)
    f.write("\nFinal: rot error {:.4f} deg ({:.1f}x drop), held-out PSNR "
            "{:.2f} dB".format(history[-1]["err_R_deg"], drop, val["psnr_val"]))
    if control_psnr is not None:
        f.write(" (control at GT poses: {:.2f} dB, gap {:.2f} dB)".format(
            control_psnr, control_psnr - val["psnr_val"]))
    f.write("\n\n")
    return dict(err0=err0, final=history[-1], psnr_val=val["psnr_val"])


def run_inn_blender_noisy(f, quick=False):
    """Run B2 — barf_inn on blob-Blender with noisy-GT init (sigma=0.15).

    The reference's own blender protocol for the INN model
    (model/barf_inn_llff.py:282-302: blender -> noisy GT initial poses);
    the cleanest >=10x pose-error-drop demonstration because the initial
    error is well-defined (~= the injected noise) and the Procrustes
    alignment is non-degenerate from step 0.
    """
    import synth_data
    size = 32 if quick else 128
    n_train = 6 if quick else 100
    iters = 200 if quick else 200000
    root = os.path.join(SCENE_ROOT, "blender")
    scene_dir = os.path.join(root, "blobs")
    if not os.path.isdir(scene_dir):
        synth_data.make_blob_blender_scene(root, n_train=n_train, n_val=4,
                                           n_test=4, img_size=size, n_blobs=24)
    opt = build("barf_blender_inn", [
        "--model=barf_inn_blender", "--yaml=barf_blender_inn",
        "--data.root={}".format(root), "--data.scene=blobs",
        "--data.image_size=[{0},{0}]".format(size),
        "--barf_c2f=[0.1,0.5]",
        "--inn.real_nvp.max_pe_iter={}".format(iters // 2),
        "--loss_weight.global_alignment=4",
        "--max_iter={}".format(iters),
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root={}".format(OUT_ROOT), "--group=r2", "--name=inn_blender",
        "--seed=0",
    ] + (["--nerf.sample_intvs=32", "--nerf.rand_rays=512",
          "--inn.real_nvp.d_hidden=32", "--warp_latent.embed_dim=16"]
         if quick else []))
    trainer = make_trainer(opt)
    system, state = trainer.system, trainer.state
    # True initial error: before the first SVD write, aux["global_rigid"]
    # holds pose0 so the readout pose0∘pose0 double-counts the noise; probing
    # with global_rigid=identity makes the readout exactly the initial poses.
    from neural_invertible_warp_tpu.ops import pose as pose_ops
    aux0 = dict(state["aux"])
    aux0["global_rigid"] = np.asarray(
        pose_ops.identity_pose((aux0["global_rigid"].shape[0],)))
    R0, t0 = system.evaluate_camera_alignment(dict(state, aux=aux0))
    err0 = dict(rot=float(np.rad2deg(np.mean(R0))), trans=float(np.mean(t0)))
    print("B2 initial pose error:", err0, flush=True)
    state, history = train_loop(system, state, iters, spc=50 if quick else 200,
                                log_every=50 if quick else 5000)
    trainer.state = state
    val = system.validate(state)
    f.write("## Run B2 — `barf_inn` on blob-Blender, noisy-GT init "
            "(sigma=0.15)\n\n")
    f.write("Same blob-Blender scene as run A ({n} train views at {s}x{s}), "
            "INN warp with noisy-GT initial poses (reference blender "
            "protocol, model/barf_inn_llff.py:282-302), SVD global-alignment "
            "weight 1e4, c2f [0.1,0.5], {it} iterations, one TPU chip.\n\n"
            .format(n=n_train, s=size, it=iters))
    f.write("Initial pose error: rot {rot:.3f} deg, trans {trans:.4f}\n\n"
            .format(**err0))
    f.write(fmt_history(history))
    drop = err0["rot"] / max(history[-1]["err_R_deg"], 1e-6)
    f.write("\nFinal: rot error {:.4f} deg ({:.1f}x drop), held-out PSNR "
            "{:.2f} dB\n\n".format(history[-1]["err_R_deg"], drop,
                                   val["psnr_val"]))
    return dict(err0=err0, final=history[-1], psnr_val=val["psnr_val"])


def main():
    global SCENE_ROOT, OUT_ROOT
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "EVIDENCE_r2.md"))
    ap.add_argument("--runs", default="A,B0,B,B2")
    args = ap.parse_args()
    if args.quick:  # never share scene caches between quick and full runs
        SCENE_ROOT += "_quick"
        OUT_ROOT += "_quick"
    runs = args.runs.split(",")

    mode = "a" if os.path.exists(args.out) and "A" not in runs else "w"
    with open(args.out, mode) as f:
        if mode == "w":
            f.write("# Round-2 evidence: joint pose+field recovery on TPU\n\n")
            f.write("Scenes are bounded, band-limited Gaussian-blob fields "
                    "(tests/synth_data.py::blob_params) — the BARF-friendly "
                    "testbed VERDICT.md asked for (round-1 scenes aliased and "
                    "admitted degenerate gauges).\n\n")
            f.flush()
        control = None
        for name, fn in (("A", run_barf_blender),
                         ("B0", run_llff_control),
                         ("B", run_inn_llff),
                         ("B2", run_inn_blender_noisy),
                         ("B0b", run_llff_control),
                         ("B3", run_inn_llff)):
            if name not in runs:
                continue
            try:
                kw = {}
                if name in ("B0b", "B3"):
                    kw["backdrop"] = True
                if name in ("B", "B3") and control:
                    kw["control_psnr"] = control["psnr_val"]
                res = fn(f, quick=args.quick, **kw)
                if name in ("B0", "B0b"):
                    control = res
            except Exception:
                f.write("## Run {} FAILED\n\n```\n{}\n```\n\n".format(
                    name, traceback.format_exc()))
                print("run {} failed".format(name), flush=True)
                traceback.print_exc()
            f.flush()
    print("wrote", args.out)


if __name__ == "__main__":
    main()
