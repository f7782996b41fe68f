"""Run the REFERENCE torch implementation (read-only, via sys.path) as a
short-horizon control for the flagship INN joint pose+field question.

VERDICT r2 Next #1: the JAX rebuild's `barf_inn_llff` falls into a
coarse-phase attractor (~25-30 deg relative-rotation spread) within ~200
steps from identity init on synthetic LLFF scenes, while SE3-BARF recovers
on the same scenes. This driver runs the reference implementation itself
(`/root/reference`, unmodified) on the SAME on-disk scene with the SAME
hyperparameters on torch-CPU, logging the same per-step pose metrics, so
the two trajectories can be compared directly.

Missing third-party deps (easydict/roma/lpips/ipdb/visdom/torchvision) are
shimmed in ./shims — see each shim's docstring; nothing in /root/reference
is modified or copied.

Usage:
  python tools/ref_control/run_ref.py --scene-root /tmp/refctl/llff \
      --iters 2000 --log-every 100 --out /tmp/refctl/ref.jsonl \
      [--small] [--model barf_inn_llff] [--overrides k=v,...]

Reference behavior exercised: model/barf_inn_llff.py:305-364 (warped-ray
generation), model/nvp/nvp_ndr.py:229-468 (INN), model/nerf_inn_llff.py:
493-573 (forward + global-alignment loss).
"""

import argparse
import importlib
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REFERENCE = "/root/reference"


class _DummyLoader:
    """Stands in for the tqdm trange the reference passes around."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def set_postfix(self, **kwargs):
        pass


def small_flags(model="barf_inn_llff"):
    """Reduced matched config (CPU-feasible; mirrored by run_jax.py)."""
    common = [
        "--data.image_size=[120,160]",
        "--nerf.sample_intvs=64",
        "--nerf.rand_rays=1024",
    ]
    if model.startswith(("garf", "nerf_gaussian")):
        # gaussian arch is width/depth-parameterized
        return common + ["--arch.width=128", "--arch.depth=4"]
    return common + [
        "--arch.layers_feat=[null,128,128,128,128,128,128]",
        "--arch.layers_rgb=[null,64,3]",
    ]


def relative_pose_error(pose_pred, pose_GT, n_pairs=200, seed=0):
    """Gauge-invariant metric, numpy mirror of tools/evidence_r2.py:50."""
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


def pose_metrics(m, opt):
    import torch
    with torch.no_grad():
        pose, pose_GT = m.get_all_training_poses(opt)
        pose_aligned, _ = m.prealign_cameras(opt, pose, pose_GT)
        error = m.evaluate_camera_alignment(opt, pose_aligned, pose_GT)
        row = dict(
            err_R_deg=float(np.rad2deg(error.R.mean().cpu())),
            err_t=float(error.t.mean().cpu()),
            err_R_rel=relative_pose_error(pose.cpu().numpy(),
                                          pose_GT.cpu().numpy()),
        )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene-root", default="/tmp/refctl/llff")
    ap.add_argument("--scene", default="blobfern")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--out", default="/tmp/refctl/ref.jsonl")
    ap.add_argument("--out-root", default="/tmp/refctl/ref_out")
    ap.add_argument("--model", default="barf_inn_llff")
    ap.add_argument("--yaml", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small", action="store_true",
                    help="reduced matched config (CPU-feasible)")
    ap.add_argument("--max-iter", type=int, default=200000,
                    help="config max_iter: compressing it rescales the c2f "
                         "window and lr-decay fractions so late-phase "
                         "dynamics (band opening at ~0.45*max_iter) become "
                         "CPU-reachable")
    ap.add_argument("--overrides", default="",
                    help="';'-separated extra k=v overrides (';' so "
                         "bracketed values like image_size=[128,128] work)")
    ap.add_argument("--save-ckpt", action="store_true",
                    help="save the trained reference checkpoint "
                         "(util.save_checkpoint layout) at the end")
    ap.add_argument("--dump-eval", default="",
                    help="npz path: dump pose readout (pose_pred/pose_GT) "
                         "and a full-image train-mode render of view 0 "
                         "for checkpoint-interop comparison")
    args = ap.parse_args()

    # Scrub TPU-relay env so torch-CPU children never dial the tunnel, and
    # run the reference in-place with shims first on sys.path.
    for k in [k for k in os.environ
              if k.startswith(("PALLAS_AXON", "AXON", "JAX_"))]:
        os.environ.pop(k, None)
    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(1, REFERENCE)
    os.chdir(REFERENCE)

    import options as ref_options  # noqa: E402  (the reference's options.py)

    yaml_name = args.yaml or args.model
    flags = [
        "--model={}".format(args.model),
        "--yaml={}".format(yaml_name),
        "--data.root={}".format(args.scene_root),
        "--data.scene={}".format(args.scene),
        "--data.num_workers=2",
        "--max_iter={}".format(args.max_iter),  # schedules span this horizon;
                                                # we run only --iters of it
        "--freq.scalar=1000000000", "--freq.vis=1000000000",
        "--freq.val=1000000000", "--freq.ckpt=1000000000",
        "--output_root={}".format(args.out_root),
        "--group=refctl", "--name={}".format(args.model),
        "--seed={}".format(args.seed),
        "--visdom!", "--tb!",
    ]
    # model-conditional defaults: GARF-family configs have neither barf_c2f
    # nor a global_alignment weight; SE3-BARF has only the former
    if "inn" in args.model:
        flags += ["--barf_c2f=[0.1,0.5]", "--loss_weight.global_alignment=4"]
    elif args.model.startswith("barf"):
        flags += ["--barf_c2f=[0.1,0.5]"]
    if args.small:
        flags += small_flags(args.model)
    flags += ["--{}".format(o)
              for o in args.overrides.replace(";", "\n").splitlines() if o]

    opt_cmd = ref_options.parse_arguments(flags)
    opt = ref_options.set(opt_cmd=opt_cmd)
    assert opt.device == "cpu", opt.device

    model_mod = importlib.import_module("model.{}".format(opt.model))
    m = model_mod.Model(opt)
    m.load_dataset(opt)
    m.build_networks(opt)
    m.setup_optimizer(opt)
    m.restore_checkpoint(opt)
    # no setup_visualizer: freq.* are set beyond reach and visdom/tb are off

    from easydict import EasyDict as edict  # the shim
    m.timer = edict(start=time.time(), it_mean=None)
    m.ep = 0
    m.graph.train()
    var = m.train_data.all
    loader = _DummyLoader(opt.max_iter)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    out = open(args.out, "w")

    def emit(row):
        out.write(json.dumps(row) + "\n")
        out.flush()
        print(row, flush=True)

    row0 = dict(it=0, impl="reference", elapsed=0.0)
    row0.update(pose_metrics(m, opt))
    emit(row0)

    t0 = time.time()
    loss = None
    for it in range(args.iters):
        m.it = it
        loss = m.train_iteration(opt, var, loader)
        if opt.optim.sched:
            m.sched.step()
        step = it + 1
        if step % args.log_every == 0 or step == args.iters:
            mse = float(loss.render.detach().cpu())
            row = dict(it=step, impl="reference",
                       loss=float(loss.all.detach().cpu()),
                       loss_render=mse,
                       psnr=float(-10 * np.log10(max(mse, 1e-12))),
                       elapsed=time.time() - t0)
            if "global_alignment" in loss:
                row["loss_ga"] = float(loss.global_alignment.detach().cpu())
            row.update(pose_metrics(m, opt))
            emit(row)
    out.close()

    if args.save_ckpt:
        m.save_checkpoint(opt, ep=None, it=args.iters, latest=True)
        print("checkpoint saved:", "{}/model.ckpt".format(opt.output_path),
              flush=True)
    if args.dump_eval:
        dump_eval(m, opt, args.dump_eval, final_iter=args.iters)


def dump_eval(m, opt, path, final_iter, view=0, chunk=1024):
    """Dump the reference's own pose readout + a train-mode full-image
    render of training view `view` (chunked over rays) for checkpoint
    interop comparison. The train-mode path is used because the reference's
    EVAL render of INN models raises on the stale 3-value unpack when
    barf_c2f is set (SURVEY Q1, model/nerf_inn_llff.py:640-643);
    render_local (the training path) is unaffected."""
    import torch
    from easydict import EasyDict as edict
    opt.nerf.sample_stratified = False   # deterministic depths for interop
    var = m.train_data.all
    H, W = opt.H, opt.W
    is_inn = hasattr(m.graph, "warp_mlp")
    with torch.no_grad():
        pose_pred, pose_GT = m.get_all_training_poses(opt)
        rows = []
        for start_idx in range(0, H * W, chunk):
            v = edict(var)
            v.ray_idx = torch.arange(start_idx, min(start_idx + chunk, H * W),
                                     device=opt.device)
            if is_inn:
                ray, center = m.graph.get_pose(opt, v, mode="train",
                                               iter=final_iter)[:2]
                ret = m.graph.render_local(
                    opt, ray[view:view + 1], center[view:view + 1],
                    intr=v.intr[view:view + 1], mode="train")
            else:
                pose = m.graph.get_pose(opt, v, mode="train")
                ret = m.graph.render(opt, pose[view:view + 1],
                                     intr=v.intr[view:view + 1],
                                     ray_idx=v.ray_idx, mode="train")
            rows.append(ret.rgb[0].cpu().numpy())
        img = np.concatenate(rows, axis=0).reshape(H, W, 3)
        gt = var.image[view].permute(1, 2, 0).cpu().numpy()
    np.savez(path, pose_pred=pose_pred.cpu().numpy(),
             pose_GT=pose_GT.cpu().numpy(), render=img, gt=gt,
             view=view, final_iter=final_iter)
    mse = float(((img - gt) ** 2).mean())
    print("dump_eval: view {} train-mode render PSNR {:.3f} -> {}".format(
        view, -10 * np.log10(max(mse, 1e-12)), path), flush=True)


if __name__ == "__main__":
    main()
