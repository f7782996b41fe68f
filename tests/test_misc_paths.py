"""Coverage for less-traveled paths: registry completeness, center-crop
preprocessing, NDC rendering, val_on_test."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import synth_data
from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.models import get_system_class


def test_registry_covers_reference_model_zoo():
    """Every model name in the reference zoo (SURVEY.md §7.4) must resolve."""
    names = ["nerf", "barf", "nerf_dtu", "barf_dtu", "nerf_inn_llff",
             "barf_inn_llff", "nerf_inn_dtu", "barf_inn_dtu", "nerf_gaussian",
             "garf", "garf_se3_field", "barf_se3_field"]
    for name in names:
        assert get_system_class(name) is not None, name
    with pytest.raises(KeyError):
        get_system_class("not_a_model")


def test_center_crop_adjusts_image_and_intrinsics(tmp_path):
    from neural_invertible_warp_tpu.data import blender
    root = str(tmp_path)
    synth_data.make_blender_scene(root, n_train=2, n_val=1, n_test=1,
                                  img_size=40)
    opt = synth_data.blender_opt(root, H=20, W=20)
    opt.data.center_crop = 0.5   # crop 800x800 raw frame to 400x400
    ds = blender.Dataset(opt, split="train")
    arrays = ds.all_arrays(opt)
    assert arrays["image"].shape == (2, 20, 20, 3)
    # intrinsics: principal point recentred by the crop, then rescaled
    focal_raw = 0.5 * 800 / np.tan(0.4)
    crop = 400
    np.testing.assert_allclose(arrays["intr"][0, 0, 0],
                               focal_raw * 20 / crop, rtol=1e-5)
    np.testing.assert_allclose(arrays["intr"][0, 0, 2],
                               (800 / 2 - (800 - crop) / 2) * 20 / crop,
                               rtol=1e-5)


def test_ndc_render_path():
    """camera.ndc=true: rays converted to NDC before sampling (smoke)."""
    opt = config.load_options("options/nerf_llff.yaml")
    over = config.parse_arguments([
        "--model=nerf", "--yaml=nerf_llff",
        "--data.image_size=[12,12]",
        "--camera.ndc",
        "--nerf.depth.param=metric",
        "--nerf.depth.range=[0,1]",
        "--arch.layers_feat=[null,24,24,24]",
        "--arch.layers_rgb=[null,12,3]",
        "--arch.skip=[1]",
        "--arch.posenc.L_3D=3", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=8", "--nerf.rand_rays=48",
        "--max_iter=10",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 12, 12
    system = get_system_class("nerf")(opt)
    rng = np.random.RandomState(0)
    # camera must face +z and sit behind the near plane for the reference's
    # NDC convention (camera.py:523-540)
    pose = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    pose[:, 2, 3] = 2.0   # translate world so cameras look at z > 0 content
    arrays = dict(
        image=rng.rand(2, 12, 12, 3).astype(np.float32),
        intr=np.tile(np.array([[10.0, 0, 6], [0, 10.0, 6], [0, 0, 1]],
                              np.float32), (2, 1, 1)),
        pose=pose, idx=np.arange(2, dtype=np.int32))
    system.attach_data(arrays, arrays)
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for it in range(10):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
    assert np.isfinite(float(metrics["loss_all"]))
    out = system.render_image(state["params"], state["aux"],
                              system.test_data["pose"][:1],
                              system.test_data["intr"][:1])
    assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_val_on_test_switches_split(tmp_path):
    from neural_invertible_warp_tpu.models.engine import Trainer
    root = str(tmp_path)
    synth_data.make_blender_scene(root, n_train=2, n_val=1, n_test=3,
                                  img_size=24)
    opt = config.load_options("options/nerf_blender.yaml")
    over = config.parse_arguments([
        "--model=nerf", "--yaml=nerf_blender",
        "--data.root={}".format(root), "--data.scene=toy",
        "--data.image_size=[24,24]", "--data.num_workers=2",
        "--data.val_on_test", "--data.val_sub=",
        "--output_root={}".format(tmp_path),
        "--max_iter=1",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    config.process_options(opt)
    trainer = Trainer(opt)
    trainer.load_dataset()
    assert len(trainer.test_data) == 3  # test split, not val


def test_photometric_augmentation(tmp_path):
    """Color-jitter/hflip augmentation (reference data/base.py:74-90):
    train-split images change but stay in range/shape; val split untouched;
    empty augment config is the identity."""
    from neural_invertible_warp_tpu.data import blender
    root = str(tmp_path)
    synth_data.make_blender_scene(root, n_train=2, n_val=1, n_test=1,
                                  img_size=24)
    opt = synth_data.blender_opt(root, H=24, W=24)
    base = blender.Dataset(opt, split="train").all_arrays(opt)

    np.random.seed(0)
    opt_aug = synth_data.blender_opt(root, H=24, W=24)
    opt_aug.data.augment = DotDict(dict(brightness=0.5, contrast=0.5,
                                        saturation=0.5, hue=0.2, hflip=True,
                                        rotate=None))
    ds = blender.Dataset(opt_aug, split="train")
    assert ds.augment
    aug_arrays = ds.all_arrays(opt_aug)
    assert aug_arrays["image"].shape == base["image"].shape
    assert aug_arrays["image"].min() >= 0.0
    assert aug_arrays["image"].max() <= 1.0
    assert not np.allclose(aug_arrays["image"], base["image"])
    # val split never augments
    ds_val = blender.Dataset(opt_aug, split="val")
    assert not ds_val.augment

    # deterministic identity when all jitter factors are neutral
    aug = dict(jitter=dict(brightness=1.0, contrast=1.0, saturation=1.0,
                           hue=0.0),
               jitter_order=np.arange(4), flip=False, rot_angle=0.0)
    import PIL.Image
    img = PIL.Image.fromarray(
        (np.random.RandomState(0).rand(24, 24, 3) * 255).astype(np.uint8))
    out = ds.apply_augmentation(img, aug)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_ckpt_backend_flag(tmp_path):
    """ckpt.backend=orbax drives the orbax path via the dispatch API."""
    from neural_invertible_warp_tpu.utils import ckpt as ckpt_util
    state = dict(params=dict(w=np.arange(6, dtype=np.float32).reshape(2, 3)),
                 step=np.int32(7))
    ckpt_util.save(str(tmp_path), state, 7, backend="orbax")
    ckpt_util.save(str(tmp_path), state, 9, backend="orbax")
    assert ckpt_util.latest_orbax_iter(str(tmp_path)) == 9
    restored, it = ckpt_util.restore(str(tmp_path), state, resume=True,
                                     backend="orbax")
    assert it == 9
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    # pickle remains the default
    ckpt_util.save(str(tmp_path), state, 3)
    restored, it = ckpt_util.restore(str(tmp_path), state)
    assert it == 3


def test_tile_images():
    from neural_invertible_warp_tpu.utils.vis import tile_images
    imgs = [np.full((4, 5, 3), i, np.float32) for i in range(3)]
    grid = tile_images(imgs, 2, 2)
    assert grid.shape == (8, 10, 3)
    assert grid[0, 0, 0] == 0 and grid[0, 5, 0] == 1
    assert grid[4, 0, 0] == 2 and grid[4, 5, 0] == 0  # padded cell
