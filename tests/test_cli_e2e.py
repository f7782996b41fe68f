"""CLI integration: train.py and evaluate.py as subprocesses on a tiny scene
(exercises config resolution, the engine lifecycle, checkpointing, output
layout, quant dumps)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import synth_data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra=None):
    # Belt-and-suspenders on top of conftest's scrub: children must never
    # see the container's TPU-relay env (its sitecustomize dials the relay
    # at interpreter start regardless of JAX_PLATFORMS).
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    pythonpath = [p for p in env.get("PYTHONPATH", "").split(":")
                  if p and "axon" not in p]
    env["PYTHONPATH"] = ":".join([REPO] + pythonpath)
    if env_extra:
        env.update(env_extra)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=1200)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    synth_data.make_consistent_blender_scene(root, n_train=4, n_val=1,
                                             n_test=1, img_size=24)
    return root


def _common_flags(scene, out_root):
    return [
        "--data.root={}".format(scene),
        "--data.scene=sphere",
        "--data.image_size=[24,24]",
        "--data.num_workers=2",
        "--arch.layers_feat=[null,32,32,32]",
        "--arch.layers_rgb=[null,16,3]",
        "--arch.skip=[1]",
        "--arch.posenc.L_3D=4",
        "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=16",
        "--nerf.rand_rays=256",
        "--max_iter=30",
        "--freq.scalar=10",
        "--freq.val=20",
        "--freq.ckpt=20",
        "--output_root={}".format(out_root),
        "--group=cli", "--name=run0",
        "--seed=0",
    ]


def test_train_and_evaluate_cli(scene, tmp_path):
    out_root = str(tmp_path)
    r = _run(["train.py", "--model=nerf", "--yaml=nerf_blender"] +
             _common_flags(scene, out_root))
    assert r.returncode == 0, r.stderr[-3000:]
    out_dir = os.path.join(out_root, "cli", "run0")
    assert os.path.isfile(os.path.join(out_dir, "options.yaml"))
    assert os.path.isfile(os.path.join(out_dir, "model.ckpt"))
    assert os.path.isfile(os.path.join(out_dir, "model", "30.ckpt"))

    r2 = _run(["evaluate.py", "--model=nerf", "--yaml=nerf_blender"] +
              _common_flags(scene, out_root))
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert os.path.isfile(os.path.join(out_dir, "quant.txt"))
    rows = open(os.path.join(out_dir, "quant.txt")).read().strip().split("\n")
    assert len(rows) == 1  # one test view
    psnr = float(rows[0].split()[1])
    assert np.isfinite(psnr)
    assert os.path.isfile(os.path.join(out_dir, "test_view", "rgb_0.png"))
    assert os.path.isfile(os.path.join(out_dir, "test_view", "depth_0.png"))


def test_train_resume_cli(scene, tmp_path):
    out_root = str(tmp_path)
    flags = _common_flags(scene, out_root)
    r = _run(["train.py", "--model=nerf", "--yaml=nerf_blender"] + flags)
    assert r.returncode == 0, r.stderr[-3000:]
    # resume from the saved checkpoint and continue to a higher max_iter
    flags2 = [f if not f.startswith("--max_iter") else "--max_iter=40"
              for f in flags]
    r2 = _run(["train.py", "--model=nerf", "--yaml=nerf_blender",
               "--resume"] + flags2)
    assert r2.returncode == 0, r2.stderr[-3000:]
    out_dir = os.path.join(out_root, "cli", "run0")
    assert os.path.isfile(os.path.join(out_dir, "model", "40.ckpt"))


def test_inn_train_and_evaluate_cli(tmp_path_factory):
    """Flagship model through the public CLI: train + evaluate with pose
    error dumps (quant_pose.txt) and sim3-aligned test rendering."""
    scene_root = str(tmp_path_factory.mktemp("llff_scene"))
    out_root = str(tmp_path_factory.mktemp("out"))
    synth_data.make_consistent_llff_scene(scene_root, n_images=6,
                                          img_size=(24, 24))
    flags = [
        "--data.root={}".format(scene_root),
        "--data.scene=toyfern",
        "--data.image_size=[24,24]",
        "--data.num_workers=2",
        "--data.val_ratio=0.2",
        "--arch.layers_feat=[null,32,32,32]",
        "--arch.layers_rgb=[null,16,3]",
        "--arch.skip=[1]",
        "--arch.posenc.L_3D=4",
        "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=12",
        "--nerf.rand_rays=120",
        "--inn.real_nvp.d_hidden=32",
        "--inn.real_nvp.max_pe_iter=20",
        "--warp_latent.embed_dim=16",
        "--loss_weight.global_alignment=3",
        "--max_iter=25",
        "--freq.scalar=10", "--freq.val=100", "--freq.ckpt=25",
        "--output_root={}".format(out_root),
        "--group=cli", "--name=inn",
        "--seed=0",
    ]
    r = _run(["train.py", "--model=barf_inn_llff", "--yaml=barf_inn_llff"]
             + flags)
    assert r.returncode == 0, r.stderr[-3000:]
    out_dir = os.path.join(out_root, "cli", "inn")
    assert os.path.isfile(os.path.join(out_dir, "model.ckpt"))

    r2 = _run(["evaluate.py", "--model=barf_inn_llff", "--yaml=barf_inn_llff",
               "--optim.test_photo=False", "--novel_view_video!"] + flags)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert os.path.isfile(os.path.join(out_dir, "quant.txt"))
    assert os.path.isfile(os.path.join(out_dir, "quant_pose.txt"))
    rows = open(os.path.join(out_dir, "quant_pose.txt")).read().strip().split("\n")
    assert len(rows) == 5  # one per training image (6 imgs, 1 held out -> 5)
    for row in rows:
        _, r_err, t_err = row.split()
        assert np.isfinite(float(r_err)) and np.isfinite(float(t_err))
