"""End-to-end BARF tests.

Full BARF-at-paper-scale pose recovery needs ~200k iterations (reference
scripts); at CI scale we verify each link of the chain instead:
  1. the joint system trains stably and fits the scene;
  2. the Procrustes alignment/eval path is exact (inverse-noise => zero error);
  3. pose-only optimization against a frozen trained field recovers poses
     through the REAL system code path (render + se3 compose + grad + Adam);
  4. test-time photometric pose optimization improves rendering.
"""

import numpy as np
import jax
import pytest

import synth_data
from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.models.engine import Trainer
from neural_invertible_warp_tpu.ops import lie
from neural_invertible_warp_tpu.ops import pose as pose_ops


def barf_opt(root, out_root, n_iter, model="barf", noise=0.06):
    opt = config.load_options("options/barf_blender.yaml")
    overrides = config.parse_arguments([
        "--model={}".format(model),
        "--yaml=barf_blender",
        "--data.root={}".format(root),
        "--data.scene=sphere",
        "--data.image_size=[32,32]",
        "--data.num_workers=2",
        "--arch.layers_feat=[null,48,48,48,48,48]",
        "--arch.layers_rgb=[null,24,3]",
        "--arch.skip=[2]",
        "--arch.posenc.L_3D=6",
        "--arch.posenc.L_view=2",
        "--barf_c2f=[0,0.4]",
        "--camera.noise={}".format(noise),
        "--nerf.sample_intvs=48",
        "--nerf.rand_rays=1024",
        "--optim.lr_pose=3.e-3",
        "--optim.lr_pose_end=3.e-3",
        "--max_iter={}".format(n_iter),
        "--output_root={}".format(out_root),
        "--seed=0",
    ])
    opt = config.override_options(opt, overrides, key_stack=[], safe_check=True)
    config.process_options(opt)
    return opt


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    synth_data.make_consistent_blender_scene(root, n_train=8, n_val=2,
                                             n_test=2, img_size=32)
    return root


@pytest.fixture(scope="module")
def trained(scene, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("out"))
    opt = barf_opt(scene, out_root, n_iter=500)
    trainer = Trainer(opt)
    trainer.load_dataset()
    trainer.build_system()
    trainer.restore_checkpoint()
    base_key = jax.random.PRNGKey(0)
    for it in range(opt.max_iter):
        trainer.state, metrics = trainer.system.train_step(
            trainer.state, jax.random.fold_in(base_key, it))
    trainer.final_metrics = {k: float(v) for k, v in metrics.items()}
    return trainer


def test_joint_training_stable_and_fits(trained):
    m = trained.final_metrics
    assert np.isfinite(m["loss_all"])
    assert m["psnr"] > 18
    R, t = trained.system.evaluate_camera_alignment(trained.state)
    assert np.all(np.isfinite(R)) and np.all(np.isfinite(t))


def test_alignment_exact_for_inverse_noise(trained):
    """Setting se3_refine to the exact inverse of the synthetic noise must
    bring the aligned pose error to (numerically) zero."""
    state = jax.tree_util.tree_map(lambda x: x, trained.state)
    refine = lie.SE3_to_se3(pose_ops.invert_pose(state["aux"]["pose_noise"]))
    state["params"] = dict(state["params"], se3_refine=refine)
    R, t = trained.system.evaluate_camera_alignment(state)
    assert float(np.mean(R)) < 1e-3
    assert float(np.mean(t)) < 1e-4


def test_pose_only_recovery_with_frozen_field(scene, tmp_path_factory):
    """Freeze a field trained at GT poses, then se3-only optimization must
    recover the perturbed poses (validates the pose gradient path end-to-end)."""
    import optax
    out_root = str(tmp_path_factory.mktemp("out2"))

    # 1) train the field with known poses (plain nerf)
    nerf_opt = barf_opt(scene, out_root, n_iter=500, noise=0.0)
    nerf_opt.model = "nerf"
    nerf_opt.camera.noise = None
    from neural_invertible_warp_tpu.models.system import NerfSystem
    base = Trainer(nerf_opt)
    base.load_dataset()
    base.build_system()
    key = jax.random.PRNGKey(0)
    for it in range(500):
        base.state, _ = base.system.train_step(base.state,
                                               jax.random.fold_in(key, it))

    # 2) barf system with noisy poses, field frozen at the trained weights
    opt2 = barf_opt(scene, out_root, n_iter=600, noise=0.06)
    from neural_invertible_warp_tpu.models.barf import BarfSystem

    class FrozenFieldBarf(BarfSystem):
        def make_optimizers(self):
            txs = super().make_optimizers()
            txs["main"] = optax.set_to_zero()
            return txs

    trainer = Trainer(opt2)
    trainer.load_dataset()
    cls_orig = FrozenFieldBarf
    trainer.system = cls_orig(opt2)
    trainer.system.attach_data(trainer.train_data.all_arrays(opt2),
                               trainer.test_data.all_arrays(opt2))
    trainer.state = trainer.system.init_state(jax.random.PRNGKey(0))
    trainer.state["params"]["nerf"] = base.state["params"]["nerf"]

    R0, _ = trainer.system.evaluate_camera_alignment(trainer.state)
    err0 = float(np.mean(R0))
    key = jax.random.PRNGKey(1)
    for it in range(600):
        trainer.state, _ = trainer.system.train_step(trainer.state,
                                                     jax.random.fold_in(key, it))
    R1, _ = trainer.system.evaluate_camera_alignment(trainer.state)
    err1 = float(np.mean(R1))
    assert err0 > 0.02
    assert err1 < 0.5 * err0, "rotation error {} -> {}".format(err0, err1)


def test_validation_with_sim3_alignment(trained):
    res = trained.system.validate(trained.state)
    assert np.isfinite(res["psnr_val"])
    assert "error_R" in res and "error_t" in res


def test_test_time_photometric_optim(trained):
    data = trained.system.test_data
    pose_GT = data["pose"][:1]
    trained.system.prealign(trained.state)
    sim3_pose = trained.system.get_eval_pose(trained.state["params"],
                                             trained.state["aux"], pose_GT)
    refined = trained.system.test_time_optimized_pose(
        trained.state, sim3_pose, data["intr"][:1], data["pixels"][:1],
        jax.random.PRNGKey(1))
    assert refined.shape == (1, 3, 4)
    out0 = trained.system.render_image(trained.state["params"],
                                       trained.state["aux"], sim3_pose,
                                       data["intr"][:1])
    out1 = trained.system.render_image(trained.state["params"],
                                       trained.state["aux"], refined,
                                       data["intr"][:1])
    mse0 = float(np.mean((np.asarray(out0["rgb"]) - np.asarray(data["pixels"][:1])) ** 2))
    mse1 = float(np.mean((np.asarray(out1["rgb"]) - np.asarray(data["pixels"][:1])) ** 2))
    assert mse1 < mse0 * 1.05


def test_gradient_clipping_flags(scene, tmp_path_factory):
    """optim.clip_norm / clip_norm_pose wrap the optimizers (no reference
    equivalent; guards long-run c2f band-opening kicks). A hard clip must
    bound the parameter motion of a train step without breaking it."""
    out_root = str(tmp_path_factory.mktemp("out_clip"))
    opt = barf_opt(scene, out_root, n_iter=5)
    opt.optim.clip_norm = 1e-8        # absurdly tight: updates ~ 0
    opt.optim.clip_norm_pose = 1e-8
    trainer = Trainer(opt)
    trainer.load_dataset()
    trainer.build_system()
    trainer.restore_checkpoint()
    state0 = trainer.state
    se3_before = np.asarray(state0["params"]["se3_refine"]).copy()
    state, metrics = trainer.system.train_step(state0, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_render"]))
    # Adam normalizes, so with grads clipped to 1e-8 the first-step update
    # is still ~lr-scale; just assert motion is finite, small, and nonzero
    delta = np.abs(np.asarray(state["params"]["se3_refine"]) - se3_before)
    assert np.all(np.isfinite(delta))
    assert delta.max() <= float(opt.optim.lr_pose) * 1.01
