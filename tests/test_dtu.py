"""DTU stack tests: loader format parity, trajectory alignment, depth metrics,
and training smoke for barf_dtu / barf_inn_dtu."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import synth_data
from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.data import dtu as dtu_data
from neural_invertible_warp_tpu.ops import align, metrics as metrics_ops


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu"))
    poses, intr = synth_data.make_dtu_scene(root, n_images=12)
    return root, poses, intr


def test_dtu_loader_pose_roundtrip(dtu_root):
    root, poses_expected, intr_expected = dtu_root
    opt = synth_data.dtu_opt(root)
    ds = dtu_data.Dataset(opt, split="train")
    # dtuhold=8 on 12 images: test = idx 0,8 -> train = 10 images
    assert len(ds) == 10
    got = ds.get_all_camera_poses(opt)
    expected = poses_expected[[i for i in range(12) if i % 8 != 0]]
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_dtu_loader_arrays(dtu_root):
    root, _, intr_expected = dtu_root
    opt = synth_data.dtu_opt(root)
    ds = dtu_data.Dataset(opt, split="val")
    assert len(ds) == 2   # idx 0 and 8
    arrays = ds.all_arrays(opt)
    assert arrays["image"].shape == (2, 30, 40, 3)
    assert arrays["depth_gt"].shape == (2, 30, 40)
    assert arrays["fg_mask"].shape == (2, 30, 40)
    np.testing.assert_allclose(arrays["depth_range"][0], [1.2, 5.2], atol=1e-6)
    np.testing.assert_allclose(arrays["intr"][0], intr_expected[0], atol=1e-4)
    # GT depth roundtrips through the PFM writer/reader and 1/300 scaling
    assert arrays["depth_gt"].max() < 6.0 and arrays["depth_gt"].max() > 1.0


def test_dtu_depth_pfm_parity(dtu_root):
    root, poses, intr = dtu_root
    opt = synth_data.dtu_opt(root)
    ds = dtu_data.Dataset(opt, split="train")
    arrays = ds.all_arrays(opt)
    # re-render the analytic depth at the loaded poses; must match the PFM
    _, depths = synth_data.analytic_render_with_depth(
        arrays["pose"], arrays["intr"], 30, 40, depth_range=(1.2, 5.2))
    np.testing.assert_allclose(arrays["depth_gt"], depths, atol=2e-3)


def test_ate_alignment_recovers_sim3():
    rng = np.random.RandomState(0)
    from scipy.spatial.transform import Rotation
    n = 15
    R_true = Rotation.random(random_state=rng).as_matrix()
    s_true, t_true = 1.7, np.array([0.3, -0.2, 0.9])
    poses_c2w, poses_c2w_gt = [], []
    for i in range(n):
        R = Rotation.random(random_state=rng).as_matrix()
        t = rng.randn(3)
        poses_c2w.append(np.concatenate([R, t[:, None]], 1))
        R_gt = R_true @ R
        t_gt = s_true * R_true @ t + t_true
        poses_c2w_gt.append(np.concatenate([R_gt, t_gt[:, None]], 1))
    pose_w2c = align._np_invert_pose(np.stack(poses_c2w).astype(np.float32))
    pose_GT_w2c = align._np_invert_pose(np.stack(poses_c2w_gt).astype(np.float32))
    aligned, ssim = align.prealign_w2c_large_camera_systems(pose_w2c, pose_GT_w2c)
    R_err, t_err = align._pose_errors_np(aligned, pose_GT_w2c)
    assert R_err.mean() < 1e-3 and t_err.mean() < 1e-3
    assert abs(ssim["s"] - s_true) < 1e-3
    # backtracking GT test poses into the optimized frame inverts the alignment
    back = align.backtrack_from_aligning_the_trajectory(pose_GT_w2c, ssim)
    R_err2, t_err2 = align._pose_errors_np(back, pose_w2c)
    assert R_err2.mean() < 1e-3 and t_err2.mean() < 1e-3


def test_pairwise_alignment_small_systems():
    rng = np.random.RandomState(1)
    from scipy.spatial.transform import Rotation
    n = 5
    R_true = Rotation.random(random_state=rng).as_matrix()
    s_true, t_true = 0.8, np.array([1.0, 0.2, -0.5])
    poses_c2w, poses_c2w_gt = [], []
    for i in range(n):
        R = Rotation.random(random_state=rng).as_matrix()
        t = rng.randn(3)
        poses_c2w.append(np.concatenate([R, t[:, None]], 1))
        poses_c2w_gt.append(np.concatenate(
            [R_true @ R, (s_true * R_true @ t + t_true)[:, None]], 1))
    pose_w2c = align._np_invert_pose(np.stack(poses_c2w).astype(np.float32))
    pose_GT_w2c = align._np_invert_pose(np.stack(poses_c2w_gt).astype(np.float32))
    aligned, ssim = align.prealign_w2c_small_camera_systems(pose_w2c, pose_GT_w2c)
    R_err, t_err = align._pose_errors_np(aligned, pose_GT_w2c)
    assert R_err.mean() < 1e-3 and t_err.mean() < 1e-3


def test_align_translations_centers():
    rng = np.random.RandomState(2)
    gt = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
    gt[:, :, 3] = rng.randn(4, 3) + 5.0
    init = np.tile(np.eye(3, 4, dtype=np.float32), (4, 1, 1))
    out = align.align_translations(gt, init)
    gt_c2w = align._np_invert_pose(gt)
    out_c2w = align._np_invert_pose(out)
    np.testing.assert_allclose(out_c2w[:, :, 3].mean(0), gt_c2w[:, :, 3].mean(0),
                               atol=1e-4)


def test_depth_metrics():
    pred = jnp.ones((2, 8, 1)) * 2.0
    gt_pix = jnp.ones((2, 16)) * 2.5
    valid = jnp.ones((2, 16))
    abs_e, rmse = metrics_ops.depth_error_on_rays(pred, gt_pix, valid,
                                                  jnp.arange(8))
    np.testing.assert_allclose(float(abs_e), 0.5, atol=1e-5)
    np.testing.assert_allclose(float(rmse), 0.5, atol=1e-5)
    # invalid mask excludes entries
    valid2 = valid.at[:, :8].set(0)  # rays 0..7 invalid
    abs_e2, _ = metrics_ops.depth_error_on_rays(pred, gt_pix, valid2,
                                                jnp.arange(8))
    np.testing.assert_allclose(float(abs_e2), 0.0, atol=1e-5)


def _dtu_system_opt(root, model, n_iter=60):
    yaml = "barf_inn_dtu" if "inn" in model else "barf_dtu"
    opt = config.load_options("options/{}.yaml".format(yaml))
    over = config.parse_arguments([
        "--model={}".format(model), "--yaml={}".format(yaml),
        "--data.root={}".format(root),
        "--data.scene=scan1",
        "--data.image_size=[30,40]",
        "--data.num_workers=2",
        "--arch.layers_feat=[null,32,32,32,32]",
        "--arch.layers_rgb=[null,16,3]",
        "--arch.skip=[2]",
        "--arch.posenc.L_3D=4", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=24",
        "--nerf.rand_rays=480",
        "--pose.init=noisy_gt",
        "--pose.noise=0.05",
        "--max_iter={}".format(n_iter),
    ] + (["--inn.real_nvp.d_hidden=32", "--inn.real_nvp.latent_dim=16",
          "--loss_weight.global_alignment=3"] if "inn" in model else []))
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 30, 40
    return opt


@pytest.mark.parametrize("model", ["barf_dtu", "barf_inn_dtu"])
def test_dtu_training_smoke(dtu_root, model, tmp_path):
    from neural_invertible_warp_tpu.models import get_system_class
    root, _, _ = dtu_root
    opt = _dtu_system_opt(root, model)
    cls = get_system_class(model)
    system = cls(opt)
    ds_train = dtu_data.Dataset(opt, split="train")
    ds_val = dtu_data.Dataset(opt, split="val")
    system.attach_data(ds_train.all_arrays(opt), ds_val.all_arrays(opt))
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for it in range(opt.max_iter):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["loss_all"])
    assert "depth_abs" in m and np.isfinite(m["depth_abs"])
    # pose error evaluation end-to-end (10 cams -> ATE branch)
    R_err, t_err = system.evaluate_camera_alignment(state)
    assert np.all(np.isfinite(R_err)) and np.all(np.isfinite(t_err))
    # eval pose path: backtracked GT poses render without error
    pose = system.get_eval_pose(state["params"], state["aux"],
                                system.test_data["pose"][:1])
    out = system.render_image(state["params"], state["aux"], pose,
                              system.test_data["intr"][:1])
    assert np.all(np.isfinite(np.asarray(out["rgb"])))
    # full DTU evaluation: masked PSNR + sim3-scaled depth errors + dumps
    results = system.evaluate_full(state, output_path=str(tmp_path),
                                   test_optim=False)
    assert np.isfinite(results["PSNR"]) and np.isfinite(results["SSIM"])
    assert np.isfinite(results["depth_abs"]) and np.isfinite(results["depth_rms"])
    assert np.isfinite(results["PSNR_masked"])
    # masked SSIM/LPIPS trio (reference model/nerf_dtu.py:237-248):
    # SSIM on white-composited images; LPIPS None while weights are ungated
    assert np.isfinite(results["SSIM_masked"])
    assert -1.0 <= results["SSIM_masked"] <= 1.0
    assert results["LPIPS_masked"] is None
    import os
    assert os.path.isfile(os.path.join(str(tmp_path), "quant.txt"))
    assert os.path.isfile(os.path.join(str(tmp_path), "quant_pose.txt"))


def test_masked_metric_semantics():
    """Masked PSNR follows the reference's white-composite convention:
    background pixels contribute zero error but count in the mean."""
    from neural_invertible_warp_tpu.ops import metrics as metrics_ops
    H = W = 8
    rng = np.random.RandomState(0)
    gt = rng.rand(H, W, 3).astype(np.float32)
    pred = gt.copy()
    mask = np.zeros((H, W), bool)
    mask[:4] = True
    # corrupt only background -> masked PSNR unaffected (perfect)
    pred_bg = pred.copy()
    pred_bg[4:] = 0.0
    v = float(metrics_ops.masked_psnr(jnp.asarray(pred_bg), jnp.asarray(gt),
                                      jnp.asarray(mask)))
    assert v > 100.0
    # corrupt foreground by a known amount: white-composite MSE =
    # fg_fraction * delta^2, PSNR = -10 log10 of that
    delta = 0.1
    pred_fg = gt.copy()
    pred_fg[:4] += delta
    v = float(metrics_ops.masked_psnr(jnp.asarray(pred_fg), jnp.asarray(gt),
                                      jnp.asarray(mask)))
    expect = -10 * np.log10(0.5 * delta ** 2)
    assert abs(v - expect) < 0.05


def test_export_dtu_cameras_roundtrip(dtu_root, tmp_path):
    """evaluate.py --export_dtu_cameras (reference barf_dtu.py:74-133,
    save_projection_matrix_for_dtu): world_mat_i written by the export must
    equal the ORIGINAL cameras.npz projection matrices when exporting the GT
    poses — i.e. the export exactly undoes the loader's scale_mat centering
    + 1/300 scaling and re-applies K @ w2c in the raw DTU metric frame."""
    import evaluate as evaluate_mod

    root, _, _ = dtu_root
    opt = synth_data.dtu_opt(root)
    opt.output_path = str(tmp_path)
    ds = dtu_data.Dataset(opt, split="train")
    gt_w2c = ds.get_all_camera_poses(opt)           # normalized frame [B,3,4]

    class _Sys:
        def get_all_training_poses(self, state):
            return None, gt_w2c

    class _Trainer:
        system, state, train_data = _Sys(), None, ds

    out = evaluate_mod.export_dtu_cameras(opt, _Trainer(), mode="gt")
    written = np.load(out)
    orig = np.load(os.path.join(root, "rs_dtu_4", "DTU", "scan1",
                                "cameras.npz"))
    assert len([k for k in written.files if k.startswith("world_mat")]) \
        == len(ds)
    for j, i in enumerate(ds.indices):
        got = written["world_mat_%d" % j]
        exp = orig["world_mat_%d" % i].astype(np.float32)
        # projection matrices are scale-fixed (bottom row [0,0,0,1]) ->
        # direct comparison; raw translations are O(1000) so compare with
        # a relative tolerance
        np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-3)
