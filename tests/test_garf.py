"""GARF family tests: gaussian field properties + training smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import synth_data
from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.models import get_system_class
from neural_invertible_warp_tpu.ops import garf_field

ARCH = DotDict(dict(depth=4, width=32, skip=[2], density_activ="softplus",
                    sigmoid=True, gaussian=dict(sigma=0.1)))


def test_gaussian_field_shapes_and_ranges():
    params = garf_field.init_gaussian_nerf_params(jax.random.PRNGKey(0), ARCH)
    pts = jnp.array(np.random.RandomState(0).randn(2, 5, 7, 3).astype(np.float32))
    ray = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    rgb, density = garf_field.apply_gaussian_nerf(params, ARCH, pts, ray)
    assert rgb.shape == (2, 5, 7, 3)
    assert density.shape == (2, 5, 7)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))
    assert np.all(np.asarray(density) >= 0)


def test_gaussian_field_param_structure():
    params = garf_field.init_gaussian_nerf_params(jax.random.PRNGKey(1), ARCH)
    # skip at 2 doubles layer 3's input (skip concat happens after activation)
    assert params["pts_linears"][0]["w"].shape == (32, 32)
    assert params["pts_linears"][3]["w"].shape == (64, 32)
    assert params["views_linears"][0]["w"].shape == (64, 16)
    assert params["rgb_linear"]["w"].shape == (16, 3)


def test_gaussian_field_no_pe_smoothness():
    """Without PE the field must vary smoothly: tiny input change -> tiny output."""
    params = garf_field.init_gaussian_nerf_params(jax.random.PRNGKey(2), ARCH)
    pts = jnp.zeros((1, 1, 1, 3))
    ray = jnp.ones((1, 1, 1, 3)) / np.sqrt(3)
    rgb1, d1 = garf_field.apply_gaussian_nerf(params, ARCH, pts, ray)
    rgb2, d2 = garf_field.apply_gaussian_nerf(params, ARCH, pts + 1e-4, ray)
    assert np.abs(np.asarray(rgb1) - np.asarray(rgb2)).max() < 1e-2


def _garf_opt(root, model, n_iter=60):
    yaml = {"nerf_gaussian": "nerf_gaussian_llff",
            "garf": "garf_llff",
            "garf_se3_field": "garf_llff_se3"}[model]
    opt = config.load_options("options/{}.yaml".format(yaml))
    over = config.parse_arguments([
        "--model={}".format(model), "--yaml={}".format(yaml),
        "--data.root={}".format(root),
        "--data.scene=toyfern",
        "--data.image_size=[32,32]",
        "--data.num_workers=2",
        "--data.val_ratio=0.25",
        "--arch.depth=3", "--arch.width=32",
        "--arch.skip=[]",
        "--nerf.sample_intvs=24",
        "--nerf.rand_rays=384",
        "--max_iter={}".format(n_iter),
    ] + (["--arch.layers_warp=[null,32,32,6]", "--arch.skip_warp=[]",
          "--arch.embedding_dim=16"] if model == "garf_se3_field" else []))
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 32, 32
    return opt


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    synth_data.make_consistent_llff_scene(root, n_images=8, img_size=(32, 32))
    return root


@pytest.mark.parametrize("model", ["nerf_gaussian", "garf", "garf_se3_field"])
def test_garf_training_smoke(llff_scene, model):
    from neural_invertible_warp_tpu.data import llff as llff_data
    opt = _garf_opt(llff_scene, model)
    system = get_system_class(model)(opt)
    ds_train = llff_data.Dataset(opt, split="train")
    ds_val = llff_data.Dataset(opt, split="val")
    system.attach_data(ds_train.all_arrays(opt), ds_val.all_arrays(opt))
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    first = None
    for it in range(opt.max_iter):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
        if it == 0:
            first = float(metrics["loss_render"])
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["loss_all"])
    assert m["loss_render"] < first  # learning something
    if model != "nerf_gaussian":
        R_err, t_err = system.evaluate_camera_alignment(state)
        assert np.all(np.isfinite(R_err))


def test_garf_pose_warmup_freezes_pose():
    """With init.pose + pose_warmup, pose params must not move before warmup."""
    import optax
    from neural_invertible_warp_tpu.models.garf import GarfSystem
    opt = config.load_options("options/garf_llff.yaml")
    over = config.parse_arguments([
        "--model=garf", "--yaml=garf_llff",
        "--data.image_size=[16,16]",
        "--arch.depth=2", "--arch.width=16", "--arch.skip=[]",
        "--nerf.sample_intvs=8", "--nerf.rand_rays=64",
        "--init.pose", "--init.pose_warmup=5",
        "--max_iter=100",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 16, 16
    system = GarfSystem(opt)
    rngd = np.random.RandomState(0)
    arrays = dict(image=rngd.rand(3, 16, 16, 3).astype(np.float32),
                  intr=np.tile(np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]],
                                        np.float32), (3, 1, 1)),
                  pose=np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1)),
                  idx=np.arange(3, dtype=np.int32))
    system.attach_data(arrays, arrays)
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for it in range(3):
        state, _ = system.train_step(state, jax.random.fold_in(key, it))
    np.testing.assert_array_equal(np.asarray(state["params"]["se3_refine"]), 0)
    for it in range(3, 10):
        state, _ = system.train_step(state, jax.random.fold_in(key, it))
    assert np.abs(np.asarray(state["params"]["se3_refine"])).max() > 0
