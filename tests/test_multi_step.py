"""Scan-batched training must be step-for-step identical to single-step
training (same fold_in key sequence, same updates)."""

import numpy as np
import jax
import pytest

from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.models import get_system_class


def _tiny_system(extra_args=()):
    opt = config.load_options("options/nerf_blender.yaml")
    over = config.parse_arguments([
        "--model=nerf", "--yaml=nerf_blender",
        "--data.image_size=[12,12]",
        "--arch.layers_feat=[null,24,24,24]",
        "--arch.layers_rgb=[null,12,3]",
        "--arch.skip=[1]",
        "--arch.posenc.L_3D=3", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=8",
        "--nerf.rand_rays=72",
        "--max_iter=100",
    ] + list(extra_args))
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 12, 12
    system = get_system_class("nerf")(opt)
    rng = np.random.RandomState(0)
    arrays = dict(
        image=rng.rand(3, 12, 12, 3).astype(np.float32),
        intr=np.tile(np.array([[8.0, 0, 6], [0, 8.0, 6], [0, 0, 1]],
                              np.float32), (3, 1, 1)),
        pose=np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1)),
        idx=np.arange(3, dtype=np.int32))
    system.attach_data(arrays, arrays)
    return system


def test_multi_step_matches_single_steps():
    base_key = jax.random.PRNGKey(0)
    n = 12

    sys1 = _tiny_system()
    state1 = sys1.init_state(jax.random.PRNGKey(0))
    for it in range(n):
        state1, m1 = sys1.train_step(state1, jax.random.fold_in(base_key, it))

    sys2 = _tiny_system()
    state2 = sys2.init_state(jax.random.PRNGKey(0))
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(np.arange(n))
    state2, m2 = sys2.train_multi_step(state2, keys)

    np.testing.assert_allclose(float(m1["loss_all"]), float(m2["loss_all"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1["params"]),
                    jax.tree_util.tree_leaves(state2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    assert int(state2["step"]) == n


def test_density_noise_reg_falls_back_from_fused_kernels():
    """density_noise_reg adds pre-activation noise (reference
    model/nerf.py:430-433). Since r4 the PE kernels take the noise as a
    lane-dense operand, but kernel-UNSUPPORTED configurations (here: a tiny
    non-paper arch, so fused_pe.supports() is False) must still route to
    the jnp path and APPLY the noise — before the gate existed,
    render_rays/apply_field_samples silently DROPPED it. Forcing the
    fused-field flag on CPU proves the gate: had any fused branch been
    taken, the pallas call would fail off-TPU. (Noise parity THROUGH the
    kernels: tests/test_fused_pe.py::
    test_fine_sampling_fused_train_kernel_parity[1.0].)"""
    key = jax.random.PRNGKey(0)

    def one_step(fused_flag, reg):
        sysm = _tiny_system([f"--nerf.density_noise_reg={reg}"])
        sysm._fused_field = fused_flag   # pretend kernels are available
        state = sysm.init_state(jax.random.PRNGKey(0))
        state, m = sysm.train_step(state, jax.random.fold_in(key, 0))
        return float(m["loss_all"])

    loss_forced = one_step("pe", 0.1)
    loss_plain = one_step("off", 0.1)
    # identical: both must have run the very same jnp path w/ the same keys
    np.testing.assert_allclose(loss_forced, loss_plain, rtol=0, atol=0)
    # and the noise must actually be applied (reg=0 gives a different loss)
    assert one_step("off", 0.0) != loss_plain


def test_fine_sampling_trains_and_renders():
    """Hierarchical (coarse+fine) path: nerf_blender_repr-style config."""
    opt = config.load_options("options/nerf_blender_repr.yaml")
    over = config.parse_arguments([
        "--model=nerf", "--yaml=nerf_blender_repr",
        "--data.image_size=[12,12]",
        "--arch.layers_feat=[null,24,24,24]",
        "--arch.layers_rgb=[null,12,3]",
        "--arch.skip=[1]",
        "--arch.posenc.L_3D=3", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=8",
        "--nerf.sample_intvs_fine=8",
        "--nerf.rand_rays=72",
        "--nerf.density_noise_reg=0.1",
        "--max_iter=30",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = 12, 12
    system = get_system_class("nerf")(opt)
    rng = np.random.RandomState(0)
    arrays = dict(
        image=rng.rand(3, 12, 12, 3).astype(np.float32),
        intr=np.tile(np.array([[8.0, 0, 6], [0, 8.0, 6], [0, 0, 1]],
                              np.float32), (3, 1, 1)),
        pose=np.tile(np.eye(3, 4, dtype=np.float32), (3, 1, 1)),
        idx=np.arange(3, dtype=np.int32))
    system.attach_data(arrays, arrays)
    assert "nerf_fine" in system.init_params(jax.random.PRNGKey(0))
    state = system.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for it in range(30):
        state, metrics = system.train_step(state, jax.random.fold_in(key, it))
    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["loss_all"])
    assert "loss_render_fine" in m and np.isfinite(m["loss_render_fine"])
    out = system.render_image(state["params"], state["aux"],
                              system.test_data["pose"][:1],
                              system.test_data["intr"][:1])
    assert "rgb_fine" in out
    assert np.all(np.isfinite(np.asarray(out["rgb_fine"])))


def test_engine_chunk_boundaries(tmp_path):
    """The scan-batched train loop must hit exactly the same logging /
    validation / checkpoint iterations as the single-step loop."""
    from neural_invertible_warp_tpu.dotdict import DotDict
    from neural_invertible_warp_tpu.models.engine import Trainer

    events = []

    class StubSystem:
        def train_step(self, state, key):
            state = dict(state, step=state["step"] + 1)
            events.append(("step", 1))
            return state, {"loss_all": jnp_scalar()}

        def train_multi_step(self, state, keys):
            n = len(keys)
            state = dict(state, step=state["step"] + n)
            events.append(("multi", n))
            return state, {"loss_all": jnp_scalar()}

        def validate(self, state, max_views=None):
            events.append(("val", int(state["step"])))
            return {"psnr_val": 1.0}

        def prealign(self, state):
            return None

    import jax.numpy as jnp

    def jnp_scalar():
        return jnp.float32(0.5)

    opt = DotDict(dict(
        model="nerf", seed=0, max_iter=100, output_path=str(tmp_path),
        freq=dict(scalar=20, val=50, ckpt=100, early_termination=None),
        tpu=dict(steps_per_call=16),
        data=dict(val_sub=None),
        tb=None, debug={},
    ))
    trainer = Trainer(opt)
    trainer.system = StubSystem()
    trainer.state = dict(step=jnp.int32(0))
    trainer.iter_start = 0
    trainer.save_checkpoint = lambda it: events.append(("ckpt", it))
    trainer.log_scalars = lambda m, it, split="train": events.append(
        ("log", it) if split == "train" else ("vallog", it))
    trainer.train()

    # total steps must be exactly max_iter
    assert sum(n for kind, n in events if kind in ("step", "multi")) == 100
    assert [e for e in events if e[0] == "log"] == \
        [("log", 20), ("log", 40), ("log", 60), ("log", 80), ("log", 100)]
    assert [e for e in events if e[0] == "val"] == [("val", 50), ("val", 100)]
    assert ("ckpt", 100) in events
    # chunks never cross a boundary
    pos = 0
    for kind, n in events:
        if kind in ("step", "multi"):
            start = pos
            pos += n
            for f in (20, 50, 100):
                assert (start // f) == ((pos - 1) // f), (start, pos, f)
