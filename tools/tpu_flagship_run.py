"""Flagship sanity run on real TPU hardware: barf_inn_llff on a synthetic
view-consistent LLFF-format scene — demonstrates joint pose+field optimization
at (near-)paper scale. Writes a markdown report.

Usage: python tools/tpu_flagship_run.py [--iters N] [--out FILE]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--size", type=int, nargs=2, default=[240, 320])
    ap.add_argument("--out", default="EVIDENCE_r1.md")
    args = ap.parse_args()

    import jax
    import synth_data
    from neural_invertible_warp_tpu import config
    from neural_invertible_warp_tpu.models.engine import Trainer

    H, W = args.size
    root = "/tmp/flagship_scene"
    if not os.path.isdir(os.path.join(root, "toyfern")):
        synth_data.make_consistent_llff_scene(root, n_images=20,
                                              img_size=(H, W))
    out_root = "/tmp/flagship_out"
    opt = config.load_options("options/barf_inn_llff.yaml")
    over = config.parse_arguments([
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.root={}".format(root),
        "--data.scene=toyfern",
        "--data.image_size=[{},{}]".format(H, W),
        "--data.val_ratio=0.1",
        "--barf_c2f=[0.1,0.5]",
        "--inn.real_nvp.max_pe_iter={}".format(args.iters // 2),
        "--loss_weight.global_alignment=3",
        "--max_iter={}".format(args.iters),
        "--freq.scalar=1000",
        "--freq.val={}".format(args.iters * 10),  # val at the end only
        "--freq.ckpt={}".format(args.iters * 10),
        "--output_root={}".format(out_root),
        "--group=flagship", "--name=run",
        "--seed=0",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    config.process_options(opt)

    trainer = Trainer(opt)
    trainer.load_dataset()
    trainer.build_system()
    trainer.restore_checkpoint()
    system, state = trainer.system, trainer.state

    R0, t0 = system.evaluate_camera_alignment(state)
    history = []
    base_key = jax.random.PRNGKey(0)
    t_start = time.time()
    spc = 100
    keys_fn = jax.vmap(lambda i: jax.random.fold_in(base_key, i))
    it = 0
    while it < args.iters:
        state, metrics = system.train_multi_step(
            state, keys_fn(np.arange(it, it + spc)))
        it += spc
        if it % 2000 == 0 or it == args.iters:
            trainer.state = state
            R, t = system.evaluate_camera_alignment(state)
            row = dict(it=it, psnr=float(metrics["psnr"]),
                       loss_ga=float(metrics["loss_global_alignment"]),
                       err_R_deg=float(np.rad2deg(np.mean(R))),
                       err_t=float(np.mean(t)),
                       elapsed=time.time() - t_start)
            history.append(row)
            print(row, flush=True)
    trainer.state = state
    val = system.validate(state)
    rays_per_sec = args.iters * opt.nerf.rand_rays / (time.time() - t_start)

    with open(args.out, "w") as f:
        f.write("# Round-1 flagship evidence: barf_inn_llff on TPU\n\n")
        f.write("Synthetic view-consistent LLFF scene ({}x{}, 18 train / 2 val "
                "images), identity pose init, full INN warp (d_hidden 128, "
                "latent 128), 8x256 NeRF with BARF c2f [0.1,0.5], SVD "
                "global-alignment loss (weight 1e3), {} iterations on one "
                "TPU chip (fused Pallas field kernel, scan-batched steps).\n\n"
                .format(H, W, args.iters))
        f.write("Initial pose error (Procrustes-aligned): rot {:.3f} deg, "
                "trans {:.4f}\n\n".format(float(np.rad2deg(np.mean(R0))),
                                          float(np.mean(t0))))
        f.write("| iter | train PSNR | global-align loss | rot err (deg) | "
                "trans err | elapsed (s) |\n|---|---|---|---|---|---|\n")
        for r in history:
            f.write("| {it} | {psnr:.2f} | {loss_ga:.2e} | {err_R_deg:.3f} | "
                    "{err_t:.4f} | {elapsed:.0f} |\n".format(**r))
        f.write("\nHeld-out validation PSNR (sim3-aligned test poses): "
                "{:.2f} dB\n".format(val["psnr_val"]))
        f.write("\nEffective training throughput incl. host-side eval pauses: "
                "{:.0f} rays/s\n".format(rays_per_sec))
    print("wrote", args.out)


if __name__ == "__main__":
    main()


def run_blender_noisy(iters=10000, size=160, out="EVIDENCE_r1_blender.md"):
    """barf_inn_blender protocol: noisy-GT pose init (the paper's blender
    setting), INN warp corrects the noise."""
    import jax
    import synth_data
    from neural_invertible_warp_tpu import config
    from neural_invertible_warp_tpu.models.engine import Trainer

    root = "/tmp/flagship_blender_shell"
    if not os.path.isdir(os.path.join(root, "sphere")):
        synth_data.make_consistent_blender_scene(
            root, n_train=12, n_val=2, n_test=2, img_size=size,
            scene_kind="sphere_shell", depth_range=(2.0, 10.0))
    opt = config.load_options("options/barf_blender_inn.yaml")
    over = config.parse_arguments([
        "--model=barf_inn_blender", "--yaml=barf_blender_inn",
        "--data.root={}".format(root),
        "--data.scene=sphere",
        "--data.image_size=[{},{}]".format(size, size),
        "--barf_c2f=[0.1,0.5]",
        "--camera.noise_type=barf",
        "--camera.noise_barf=0.08",
        "--nerf.depth.range=[2,10]",
        "--inn.real_nvp.max_pe_iter={}".format(iters // 2),
        "--loss_weight.global_alignment=3",
        "--nerf.rand_rays=2048",
        "--max_iter={}".format(iters),
        "--freq.scalar=100000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/flagship_blender_out",
        "--group=flagship", "--name=blender",
        "--seed=0",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    config.process_options(opt)
    trainer = Trainer(opt)
    trainer.load_dataset()
    trainer.build_system()
    system, state = trainer.system, trainer.state

    R0, t0 = system.evaluate_camera_alignment(state)
    base_key = jax.random.PRNGKey(0)
    keys_fn = jax.vmap(lambda i: jax.random.fold_in(base_key, i))
    history = []
    t_start = time.time()
    it = 0
    while it < iters:
        state, metrics = system.train_multi_step(
            state, keys_fn(np.arange(it, it + 100)))
        it += 100
        if it % 1000 == 0:
            R, t = system.evaluate_camera_alignment(state)
            row = dict(it=it, psnr=float(metrics["psnr"]),
                       err_R_deg=float(np.rad2deg(np.mean(R))),
                       err_t=float(np.mean(t)), elapsed=time.time() - t_start)
            history.append(row)
            print(row, flush=True)
    trainer.state = state
    val = system.validate(state)
    with open(out, "w") as f:
        f.write("# Flagship evidence: barf_inn_blender (noisy-GT init) on TPU\n\n")
        f.write("Synthetic view-consistent Blender-format scene ({0}x{0}, 12 "
                "train views), se(3) pose noise sigma=0.08 on the GT poses, "
                "INN warp (d_hidden 128, latent 128) corrects it; BARF c2f "
                "[0.1,0.5], SVD global-alignment weight 1e3, {1} iterations, "
                "fused Pallas kernel.\n\n".format(size, iters))
        f.write("Initial (noisy) pose error: rot {:.3f} deg, trans {:.4f}\n\n"
                .format(float(np.rad2deg(np.mean(R0))), float(np.mean(t0))))
        f.write("| iter | train PSNR | rot err (deg) | trans err | elapsed |\n")
        f.write("|---|---|---|---|---|\n")
        for r in history:
            f.write("| {it} | {psnr:.2f} | {err_R_deg:.3f} | {err_t:.4f} | "
                    "{elapsed:.0f}s |\n".format(**r))
        f.write("\nHeld-out validation PSNR: {:.2f} dB\n".format(val["psnr_val"]))
    print("wrote", out)
