"""INN warp on Blender with synthetic pose noise (barf_inn_blender path:
noisy initial poses feed get_unwarped_center_and_ray via pose_init —
reference model/barf_inn_llff.py:282-302 blender branch)."""

import numpy as np
import jax
import pytest

import synth_data
from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.models import get_system_class


def test_inn_blender_noise_smoke(tmp_path):
    root = str(tmp_path)
    synth_data.make_consistent_blender_scene(root, n_train=4, n_val=1,
                                             n_test=1, img_size=24)
    opt = config.load_options("options/barf_blender_inn.yaml")
    over = config.parse_arguments([
        "--model=barf_inn_blender", "--yaml=barf_blender_inn",
        "--data.root={}".format(root),
        "--data.scene=sphere",
        "--data.image_size=[24,24]",
        "--data.num_workers=2",
        "--arch.layers_feat=[null,32,32,32]",
        "--arch.layers_rgb=[null,16,3]",
        "--arch.skip=[1]",
        "--arch.posenc.L_3D=4", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=16",
        "--nerf.rand_rays=256",
        "--camera.noise_type=barf",
        "--camera.noise_barf=0.1",
        "--inn.real_nvp.d_hidden=32",
        "--inn.real_nvp.max_pe_iter=50",
        "--warp_latent.embed_dim=16",
        "--loss_weight.global_alignment=3",
        "--max_iter=40",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 24, 24
    from neural_invertible_warp_tpu.data import blender
    system = get_system_class("barf_inn_blender")(opt)
    ds_train = blender.Dataset(opt, split="train")
    ds_val = blender.Dataset(opt, split="val")
    system.attach_data(ds_train.all_arrays(opt), ds_val.all_arrays(opt))
    state = system.init_state(jax.random.PRNGKey(0))
    # noisy init: pose_noise present, global_rigid initialized from noisy GT
    assert "pose_noise" in state["aux"]
    init_pose = np.asarray(state["aux"]["global_rigid"])
    gt = np.asarray(system.train_data["pose"])
    assert np.abs(init_pose - gt).max() > 1e-3  # noise applied

    key = jax.random.PRNGKey(1)
    for it in range(opt.max_iter):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
    assert np.isfinite(float(metrics["loss_all"]))
    assert "loss_global_alignment" in {k: v for k, v in metrics.items()}
    # pose error evaluation runs end-to-end
    R_err, t_err = system.evaluate_camera_alignment(state)
    assert np.all(np.isfinite(R_err)) and np.all(np.isfinite(t_err))


def test_l2g_depth_range_scales_with_camera_spread(tmp_path):
    """Q4: the l2g variant derives the depth range from the pose-readout
    camera spread (reference model/nerf_inn_llff.py:494-502)."""
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.dotdict import DotDict
    from neural_invertible_warp_tpu.models.inn_warp import InnWarpSystem
    from neural_invertible_warp_tpu.ops import pose as pose_ops

    opt = config.load_options("options/barf_blender_inn.yaml")
    opt.model = "barf_inn_blender"
    opt.H, opt.W = 8, 8
    opt.data.image_size = [8, 8]
    system = InnWarpSystem(opt)
    system.n_train = 4
    # cameras at distance d from origin -> diameter ~ 2d
    d = 3.0
    centers = np.array([[d, 0, 0], [-d, 0, 0], [0, d, 0], [0, -d, 0]],
                       np.float32)
    poses = np.stack([np.concatenate([np.eye(3, dtype=np.float32),
                                      -c[:, None]], 1) for c in centers])
    aux = dict(global_rigid=jnp.asarray(poses))
    dmin, dmax = system._l2g_depth_range(aux)
    depth_min, depth_max = opt.nerf.depth.range
    total = depth_max + depth_min
    diameter = 2 * d
    np.testing.assert_allclose(float(dmin), depth_min / total * diameter,
                               rtol=1e-5)
    np.testing.assert_allclose(float(dmax), depth_max / total * diameter,
                               rtol=1e-5)
