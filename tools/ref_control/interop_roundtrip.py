"""Trained-reference-checkpoint interop round-trip (VERDICT r3 Next #3).

MIGRATION.md §5 claims trained reference checkpoints convert into this
framework. This tool proves it end-to-end with a checkpoint the reference
TRAINED (not matched random weights):

1. trains the reference implementation (torch CPU, --small config) for N
   iters on a synthetic LLFF scene and saves its checkpoint + its own
   pose readout + a deterministic train-mode render of view 0;
2. converts the checkpoint with utils/torch_convert (the converter shipped
   for reference users) and loads it into this framework;
3. re-renders the SAME view with the converted weights and re-reads the
   poses, then asserts (a) pixelwise render agreement (PSNR ours-vs-ref)
   and (b) pose-readout agreement (max rotation/translation delta).

Usage:
  python tools/ref_control/interop_roundtrip.py [--model barf_inn_llff|barf]
      [--iters 500] [--skip-ref]   # --skip-ref reuses prior artifacts
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
OUT = "/tmp/refctl/interop"
SCENE_ROOT = "/tmp/refctl/llff_interop"


def ensure_scene():
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import synth_data
    if not os.path.isdir(os.path.join(SCENE_ROOT, "blobfern")):
        synth_data.make_blob_llff_scene(
            SCENE_ROOT, n_images=10, img_size=(240, 320), n_blobs=16,
            val_ratio=0.1, backdrop=True, spread=0.4)


def run_reference(model, iters):
    env = dict(os.environ)
    dump = os.path.join(OUT, model + "_ref.npz")
    os.makedirs(OUT, exist_ok=True)
    cmd = [sys.executable, os.path.join(HERE, "run_ref.py"),
           "--model", model, "--scene-root", SCENE_ROOT,
           "--scene", "blobfern", "--small", "--iters", str(iters),
           "--log-every", str(max(iters // 4, 1)),
           "--max-iter", "20000",
           "--out", os.path.join(OUT, model + "_ref.jsonl"),
           "--out-root", os.path.join(OUT, model + "_ref_out"),
           "--save-ckpt", "--dump-eval", dump,
           "--overrides", "data.val_ratio=0.1"]
    print("== reference train:", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd, env=env, cwd=REPO)
    if rc != 0:
        raise RuntimeError("reference training failed rc={}".format(rc))
    ckpt = os.path.join(OUT, model + "_ref_out", "refctl", model,
                        "model.ckpt")
    assert os.path.isfile(ckpt), ckpt
    return ckpt, dump


def jax_side(model, ckpt_path, dump_path, iters):
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import torch
    import jax
    import jax.numpy as jnp
    import evidence_r2
    from neural_invertible_warp_tpu.models import get_system_class
    from neural_invertible_warp_tpu.utils import torch_convert
    from neural_invertible_warp_tpu.ops import lie, pose as pose_ops

    dump = np.load(dump_path)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    graph_sd = {k: v for k, v in ckpt["graph"].items()}

    # the matched --small config (run_ref.small_flags mirror)
    opt = evidence_r2.build(model, [
        "--model={}".format(model), "--yaml={}".format(model),
        "--data.root={}".format(SCENE_ROOT), "--data.scene=blobfern",
        "--data.image_size=[120,160]", "--data.val_ratio=0.1",
        "--arch.layers_feat=[null,128,128,128,128,128,128]",
        "--arch.layers_rgb=[null,64,3]",
        "--nerf.sample_intvs=64", "--nerf.rand_rays=1024",
        "--nerf.sample_stratified!",
        "--barf_c2f=[0.1,0.5]",
        "--max_iter=20000",
        "--tpu.fused_kernel!", "--tpu.fused_pe!", "--tpu.fused_inn!",
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/refctl/interop/jax_out", "--group=interop",
        "--name={}".format(model), "--seed=0",
    ] + (["--loss_weight.global_alignment=4"] if "inn" in model else []))
    trainer = evidence_r2.make_trainer(opt)
    system, state = trainer.system, trainer.state

    params = dict(state["params"])
    aux = dict(state["aux"])
    if "inn" in model:
        params.update(torch_convert.inn_llff_params_from_torch(graph_sd))
        # pose read-out state: global_rigid Embedding(N,12) -> [N,3,4]
        gr = np.asarray(graph_sd["global_rigid.weight"])
        aux["global_rigid"] = jnp.asarray(gr.reshape(-1, 3, 4))
    else:
        params["nerf"] = torch_convert.nerf_params_from_torch(
            graph_sd, prefix="nerf.")
        params["se3_refine"] = jnp.asarray(
            np.asarray(graph_sd["se3_refine.weight"]))
    state = dict(state, params=params, aux=aux)

    # pose readout parity
    pose_ours, _ = system.get_all_training_poses(state)
    pose_ref = dump["pose_pred"]
    # element-wise rotation-block delta: the geodesic arccos((tr-1)/2)
    # metric has a ~0.1 deg resolution FLOOR at zero distance when the
    # SVD-fit rotations are orthonormal only to ~1e-6 (arccos near 1)
    dR = np.abs(pose_ours[:, :, :3] - pose_ref[:, :, :3]).max()
    dt = np.abs(pose_ours[:, :, 3] - pose_ref[:, :, 3]).max()

    # deterministic train-mode render of the same view
    step = jnp.asarray(int(dump["final_iter"]), jnp.int32)
    H, W = opt.H, opt.W
    view = int(dump["view"])
    key = jax.random.PRNGKey(0)
    rows = []
    for start in range(0, H * W, 1024):
        ridx = jnp.arange(start, min(start + 1024, H * W), dtype=jnp.int32)
        out, _, _ = system._forward_train(params, aux, system.train_data,
                                          ridx, key, step)
        rows.append(np.asarray(out["rgb"][view]))
    img = np.concatenate(rows, axis=0).reshape(H, W, 3)

    ref_img = dump["render"]
    gt = dump["gt"]

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return -10 * np.log10(max(mse, 1e-12))

    rec = dict(model=model, iters=iters,
               pose_rot_elem_delta_max=float(dR),
               pose_trans_delta_max=float(dt),
               psnr_ours_vs_ref=psnr(img, ref_img),
               psnr_ref_vs_gt=psnr(ref_img, gt),
               psnr_ours_vs_gt=psnr(img, gt),
               max_abs_pixel_delta=float(np.abs(img - ref_img).max()))
    rec["ok"] = bool(rec["pose_rot_elem_delta_max"] < 1e-5
                     and rec["pose_trans_delta_max"] < 1e-5
                     and rec["psnr_ours_vs_ref"] > 40.0)
    print(json.dumps(rec, indent=2))
    with open(os.path.join(OUT, model + "_result.json"), "w") as f:
        json.dump(rec, f)
    if not rec["ok"]:
        raise SystemExit("interop round-trip FAILED thresholds")
    print("interop round-trip OK: the reference-trained checkpoint "
          "converts, renders, and reads out poses identically here.")
    return rec


def main():
    ap = argparse.ArgumentParser()
    # barf_inn_llff only: the reference's own barf-on-LLFF config chain is
    # broken (options/nerf_llff.yaml missing, SURVEY Q2), so the flagship is
    # the only LLFF model the reference itself can train for this loop.
    ap.add_argument("--model", default="barf_inn_llff",
                    choices=["barf_inn_llff"])
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()
    ensure_scene()
    ckpt = os.path.join(OUT, args.model + "_ref_out", "refctl", args.model,
                        "model.ckpt")
    dump = os.path.join(OUT, args.model + "_ref.npz")
    if not args.skip_ref or not os.path.isfile(ckpt):
        ckpt, dump = run_reference(args.model, args.iters)
    jax_side(args.model, ckpt, dump, args.iters)


if __name__ == "__main__":
    main()
