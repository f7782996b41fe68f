"""Round-4 zoo-wide full-horizon validation matrix (VERDICT r3 Next #1).

Applies the EVIDENCE_r3 SS5d lesson (a converged 30k probe can die at ~42% of
the real schedule when c2f opens the finest PE bands) to every model family
that previously had only smoke/short-horizon evidence:

  * ``barf_inn_blender`` (yaml barf_blender_inn) -- INN warp on Blender,
    noisy-GT init sigma=0.15 (reference model/barf_inn_llff.py:282-302
    blender branch).
  * ``barf`` on Blender (noisy init, reference model/barf.py:217-248) and on
    LLFF (identity init).
  * ``garf`` / ``garf_se3_field`` (reference model/garf.py:227-257,
    model/garf_se3_field.py:281-314) -- identity init on LLFF.
  * ``nerf_gaussian`` (known poses; field-quality horizon run).
  * ``nerf_blender_repr`` / ``nerf_llff_repr`` -- the NeRF-paper repro
    configs (relu density + noise_reg + fine sampling), known poses.

Protocol per model: a compressed 20k-iteration run with ALL schedule
fractions preserved (max_iter=20000 so lr decay reaches lr_end, barf_c2f
fractions and the INN max_pe_iter scale with the horizon -- the SS5d
compression protocol), plus a full-horizon 200k run for at least one model
per family. Scenes are the standard synthetic evidence scenes
(tests/synth_data.py): blob LLFF 240x320/40 views with textured backdrop
(the B3 scene family) and blob Blender 128px/100 train views (the
EVIDENCE_r2 run-A scene).

Usage:
  python tools/probe_zoo_r4.py --run <name>        # one run, in-process
  python tools/probe_zoo_r4.py --runs a,b --all    # sequence, subprocesses
Results: per-run log + one JSON line appended to /tmp/zoo_r4/results.jsonl.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

OUT_DIR = "/tmp/zoo_r4"
SCENE_ROOT = "/tmp/zoo_r4/scenes"


def llff_scene():
    import synth_data
    root = os.path.join(SCENE_ROOT, "llff")
    if not os.path.isdir(os.path.join(root, "blobfern")):
        synth_data.make_blob_llff_scene(root, n_images=40,
                                        img_size=(240, 320), n_blobs=24,
                                        val_ratio=0.1, backdrop=True,
                                        spread=0.5)
    return ["--data.root={}".format(root), "--data.scene=blobfern",
            "--data.image_size=[240,320]", "--data.val_ratio=0.1"]


def blender_scene():
    import synth_data
    root = os.path.join(SCENE_ROOT, "blender")
    if not os.path.isdir(os.path.join(root, "blobs")):
        synth_data.make_blob_blender_scene(root, n_train=100, n_val=4,
                                           n_test=4, img_size=128,
                                           n_blobs=24)
    return ["--data.root={}".format(root), "--data.scene=blobs",
            "--data.image_size=[128,128]"]


def blender_dense_scene():
    """Content-rich blender scene for the INN-warp recovery probes.

    The sparse 24-blob ball is the degenerate gauge EVIDENCE_r2 run B2
    diagnosed (empty space lets each view hide in its own region); the
    reference's barf_blender_inn targets NeRF-synthetic objects that fill
    the frame with view-consistent content. 160 overlapping blobs
    approximate that (measured full-frame coverage at 128px)."""
    import synth_data
    root = os.path.join(SCENE_ROOT, "blender_dense")
    if not os.path.isdir(os.path.join(root, "blobs")):
        synth_data.make_blob_blender_scene(root, n_train=100, n_val=4,
                                           n_test=4, img_size=128,
                                           n_blobs=160, radius=1.3,
                                           s_range=(0.22, 0.45))
    return ["--data.root={}".format(root), "--data.scene=blobs",
            "--data.image_size=[128,128]"]


def llff_garf_scene():
    """GARF recovery scene (VERDICT r4 Next #8): full-frame 3D structure
    (dense frustum-filling blob cloud + textured backdrop) with a TIGHTER
    forward-facing cluster (spread 0.25 -> ~5 deg identity-init error, the
    regime of real LLFF captures the GARF paper recovers on). The standard
    zoo scene's wider spread lands garf in the ~20.7 deg attractor that the
    reference control reproduces (EVIDENCE_r4 SS2); this scene probes the
    recovery regime."""
    import synth_data
    root = os.path.join(SCENE_ROOT, "llff_garf")
    if not os.path.isdir(os.path.join(root, "blobfern")):
        synth_data.make_blob_llff_scene(root, n_images=40,
                                        img_size=(240, 320), n_blobs=90,
                                        val_ratio=0.1, backdrop=True,
                                        spread=0.25, dense=True)
    return ["--data.root={}".format(root), "--data.scene=blobfern",
            "--data.image_size=[240,320]", "--data.val_ratio=0.1"]


def llff_garf_tight_scene():
    """Tighter GARF recovery scene (spread 0.12 -> ~3 deg pairwise init
    error): the regime of real face-forward LLFF captures (fern/flower
    class) whose identity-init recovery the GARF paper demonstrates. The
    spread-0.25 scene sits at the basin edge (reference control flips
    180 deg within 100 iters there; warmup-pose partially recovers);
    this one probes the clean-recovery regime."""
    import synth_data
    root = os.path.join(SCENE_ROOT, "llff_garf_tight")
    if not os.path.isdir(os.path.join(root, "blobfern")):
        synth_data.make_blob_llff_scene(root, n_images=40,
                                        img_size=(240, 320), n_blobs=90,
                                        val_ratio=0.1, backdrop=True,
                                        spread=0.12, dense=True)
    return ["--data.root={}".format(root), "--data.scene=blobfern",
            "--data.image_size=[240,320]", "--data.val_ratio=0.1"]


def spec(model, yaml, scene, horizon, overrides=(), pose=True, note=""):
    return dict(model=model, yaml=yaml, scene=scene, horizon=horizon,
                overrides=list(overrides), pose=pose, note=note)


def _inn_over(horizon):
    # max_pe_iter is the one absolute-iteration schedule knob; keep its
    # fraction of the horizon at the config's 100k/200k = 0.5.
    return ["--inn.real_nvp.max_pe_iter={}".format(horizon // 2),
            "--loss_weight.global_alignment=3"]


def build_runs():
    runs = {}
    for tag, horizon in (("20k", 20000), ("200k", 200000)):
        runs["barf_inn_blender_" + tag] = spec(
            "barf_inn_blender", "barf_blender_inn", "blender_dense", horizon,
            _inn_over(horizon),
            note="noisy init sigma=0.15 (yaml default); dense scene (the "
                 "sparse blob ball is the EVIDENCE_r2 B2 degenerate gauge)")
        runs["barf_blender_" + tag] = spec(
            "barf", "barf_blender", "blender", horizon,
            ["--barf_c2f=[0.1,0.5]"], note="noisy init sigma=0.15, BARF c2f")
        runs["barf_llff_" + tag] = spec(
            "barf", "barf_llff", "llff", horizon,
            ["--barf_c2f=[0.1,0.5]"], note="identity init, BARF c2f")
        runs["garf_" + tag] = spec(
            "garf", "garf_llff", "llff", horizon,
            note="identity init, gaussian field, no PE/c2f")
        runs["garf_se3_field_" + tag] = spec(
            "garf_se3_field", "garf_llff_se3", "llff", horizon,
            note="identity init, se3 from warp MLP")
        runs["garf_recovery_" + tag] = spec(
            "garf", "garf_llff", "llff_garf", horizon,
            note="recovery-regime probe: dense+textured full-frame scene, "
                 "tight cluster (~5 deg init)")
        runs["garf_recovery_tight_" + tag] = spec(
            "garf", "garf_llff", "llff_garf_tight", horizon,
            note="clean-recovery regime: spread-0.12 face-forward cluster "
                 "(~3 deg pairwise init, the real-LLFF class the GARF "
                 "paper recovers); pass the reference's own "
                 "optim.warmup_pose pose-lr ramp via --over")
        runs["garf_se3_recovery_" + tag] = spec(
            "garf_se3_field", "garf_llff_se3", "llff_garf_tight", horizon,
            note="se3-from-warp-MLP on the clean-recovery scene; "
                 "optim.warmup_pose via --over")
        runs["nerf_gaussian_" + tag] = spec(
            "nerf_gaussian", "nerf_gaussian_llff", "llff", horizon,
            pose=False, note="known GT poses, field quality only")
        runs["nerf_blender_repr_" + tag] = spec(
            "nerf", "nerf_blender_repr", "blender", horizon, pose=False,
            note="NeRF-paper repro: relu+noise0+fine sampling; schedule "
                 "compressed from 500k")
        runs["nerf_llff_repr_" + tag] = spec(
            "nerf", "nerf_llff_repr", "llff", horizon,
            ["--nerf.depth.range=[1,8]"], pose=False,
            note="NeRF-paper repro: relu+noise1+fine; depth range overridden "
                 "to the synthetic scene's metric extent (config's [0,1] "
                 "assumes real-LLFF NDC-style bounds); schedule compressed "
                 "from 500k")
    return runs


RUNS = build_runs()

# Execution order: all compressed probes first (fast failure surface),
# then full-horizon runs in family-importance order.
DEFAULT_ORDER = [
    "barf_inn_blender_20k", "barf_blender_20k", "barf_llff_20k",
    "garf_20k", "garf_se3_field_20k", "nerf_gaussian_20k",
    "nerf_blender_repr_20k", "nerf_llff_repr_20k",
    "barf_inn_blender_200k", "barf_blender_200k", "garf_200k",
    "garf_se3_field_200k", "barf_llff_200k", "nerf_gaussian_200k",
    "nerf_llff_repr_200k", "nerf_blender_repr_200k",
]


def run_one(name, extra_over=(), tag=None, horizon_over=None):
    import evidence_r2
    s = RUNS[name]
    if horizon_over:
        s = dict(s, horizon=horizon_over)
    data_over = {"llff": llff_scene, "blender": blender_scene,
                 "blender_dense": blender_dense_scene,
                 "llff_garf": llff_garf_scene,
                 "llff_garf_tight": llff_garf_tight_scene}[s["scene"]]()
    horizon = s["horizon"]
    opt = evidence_r2.build(s["yaml"], [
        "--model={}".format(s["model"]), "--yaml={}".format(s["yaml"]),
        "--max_iter={}".format(horizon),
        "--freq.scalar=1000000", "--freq.val=1000000",
        "--freq.ckpt=1000000",
        "--output_root={}/out".format(OUT_DIR), "--group=zoo_r4",
        "--name={}".format(name), "--seed=0",
    ] + data_over + s["overrides"] + list(extra_over))
    t0 = time.time()
    trainer = evidence_r2.make_trainer(opt)
    system, state = trainer.system, trainer.state
    print("[{}] built in {:.1f}s".format(name, time.time() - t0), flush=True)
    rec = dict(name=(tag or name), model=s["model"], yaml=s["yaml"],
               horizon=horizon, note=s["note"])
    has_pose = s["pose"] and hasattr(system, "evaluate_camera_alignment")
    if has_pose:
        state0 = state
        if "global_rigid" in (state["aux"] or {}):
            # INN models: before the first SVD write, aux["global_rigid"]
            # holds pose0 so the readout pose0*pose0 double-counts the init
            # noise; probing with global_rigid=identity makes the readout
            # exactly the initial poses (tools/evidence_r2.py B2 note).
            from neural_invertible_warp_tpu.ops import pose as pose_ops
            aux0 = dict(state["aux"])
            aux0["global_rigid"] = np.asarray(
                pose_ops.identity_pose((aux0["global_rigid"].shape[0],)))
            state0 = dict(state, aux=aux0)
        R0, te0 = system.evaluate_camera_alignment(state0)
        rec["init_rot_deg"] = round(float(np.rad2deg(np.mean(R0))), 4)
        rec["init_trans"] = round(float(np.mean(te0)), 5)
        print("[{}] initial: rot {:.3f} deg trans {:.4f}".format(
            name, rec["init_rot_deg"], rec["init_trans"]), flush=True)
    t1 = time.time()
    log_every = max(2000, horizon // 10)
    state, history = evidence_r2.train_loop(system, state, horizon, spc=200,
                                            log_every=log_every,
                                            pose_errors=has_pose)
    train_s = time.time() - t1
    last = history[-1]
    rec["train_psnr"] = round(float(last["psnr"]), 3)
    if has_pose:
        rec["final_rot_deg"] = round(float(last["err_R_deg"]), 4)
        rec["final_rot_rel_deg"] = round(float(last["err_R_rel"]), 4)
        rec["final_trans"] = round(float(last["err_t"]), 5)
        # kick detection: worst post-half-horizon relative error vs the
        # value at half horizon (the SS5d kick lives at 0.40-0.45)
        mid = [h for h in history if h["it"] >= horizon // 2]
        if len(mid) > 1:
            rec["max_rel_after_half"] = round(
                max(float(h["err_R_rel"]) for h in mid), 4)
    if "loss_ga" in last:
        rec["loss_ga"] = float(last["loss_ga"])
    val = system.validate(state)
    rec["val_psnr"] = round(float(val["psnr_val"]), 3)
    rec["ms_per_step"] = round(1000.0 * train_s / horizon, 3)
    rec["elapsed_s"] = round(time.time() - t0, 1)
    print("[{}] RESULT {}".format(name, json.dumps(rec)), flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "results.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", help="run one entry in-process")
    ap.add_argument("--runs", help="comma list; default: canonical order")
    ap.add_argument("--all", action="store_true",
                    help="run the sequence in subprocesses")
    ap.add_argument("--over", action="append", default=[],
                    help="extra --key=value overrides (one-off controls)")
    ap.add_argument("--tag", help="record the result under this name")
    ap.add_argument("--horizon", type=int,
                    help="override the spec horizon (one-off controls)")
    args = ap.parse_args()
    if args.run:
        run_one(args.run, extra_over=args.over, tag=args.tag,
                horizon_over=args.horizon)
        return
    names = args.runs.split(",") if args.runs else DEFAULT_ORDER
    os.makedirs(OUT_DIR, exist_ok=True)
    done_path = os.path.join(OUT_DIR, "results.jsonl")
    done = set()
    if os.path.exists(done_path):
        with open(done_path) as f:
            done = {json.loads(l)["name"] for l in f if l.strip()}
    for name in names:
        if name in done:
            print("== skip (done):", name, flush=True)
            continue
        log = os.path.join(OUT_DIR, name + ".log")
        print("== running {} (log: {})".format(name, log), flush=True)
        with open(log, "w") as lf:
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), "--run", name],
                stdout=lf, stderr=subprocess.STDOUT, cwd=REPO)
        print("== {} rc={}".format(name, rc), flush=True)


if __name__ == "__main__":
    main()
