"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
train step must compile, run, and match the single-device step numerically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import synth_data
from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.dotdict import DotDict
from neural_invertible_warp_tpu.models import get_system_class
from neural_invertible_warp_tpu.parallel import mesh as mesh_lib


def tiny_inn_opt(H=16, W=16):
    opt = config.load_options("options/barf_inn_llff.yaml")
    over = config.parse_arguments([
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.image_size=[{},{}]".format(H, W),
        "--arch.layers_feat=[null,32,32,32,32]",
        "--arch.layers_rgb=[null,16,3]",
        "--arch.skip=[2]",
        "--arch.posenc.L_3D=4", "--arch.posenc.L_view=2",
        "--nerf.sample_intvs=16",
        "--nerf.rand_rays=256",
        "--inn.real_nvp.d_hidden=32",
        "--warp_latent.embed_dim=16",
        "--loss_weight.global_alignment=3",
        "--max_iter=100",
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = H, W
    return opt


def synth_arrays(n, H, W, seed=0):
    rng = np.random.RandomState(seed)
    intr = np.tile(np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]],
                            np.float32), (n, 1, 1))
    pose = np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1))
    return dict(image=rng.rand(n, H, W, 3).astype(np.float32),
                intr=intr, pose=pose, idx=np.arange(n, dtype=np.int32))


def build_system(opt, mesh=None):
    cls = get_system_class(opt.model)
    system = cls(opt)
    H, W = opt.H, opt.W
    system.attach_data(synth_arrays(4, H, W), synth_arrays(2, H, W, seed=1))
    state = system.init_state(jax.random.PRNGKey(0))
    return system, state


def test_sharded_step_matches_single_device():
    opt = tiny_inn_opt()
    key = jax.random.PRNGKey(3)

    sys_single, state_single = build_system(opt)
    _, m_single = sys_single.train_step(state_single, key)

    mesh = mesh_lib.make_mesh(8)
    with mesh_lib.use_mesh(mesh):
        sys_shard, state_shard = build_system(opt)
        new_state, m_shard = sys_shard.train_step(state_shard, key)
        # run a second step to make sure the updated state is consumable
        _, m_shard2 = sys_shard.train_step(new_state, jax.random.fold_in(key, 1))

    for k in m_single:
        np.testing.assert_allclose(float(m_single[k]), float(m_shard[k]),
                                   rtol=2e-4, atol=1e-5)
    assert np.isfinite(float(m_shard2["loss_all"]))


def test_sharded_step_is_actually_partitioned():
    """The compiled sharded step must reference the mesh (collectives appear)."""
    opt = tiny_inn_opt()
    mesh = mesh_lib.make_mesh(8)
    with mesh_lib.use_mesh(mesh):
        system, state = build_system(opt)
        step = jax.jit(system.make_train_step())
        lowered = step.lower(state, system.train_data, jax.random.PRNGKey(0))
        compiled = lowered.compile()
        hlo = compiled.as_text()
    assert ("all-reduce" in hlo) or ("all-gather" in hlo) or \
           ("collective" in hlo), "no collectives in sharded HLO"


def test_mesh_helpers_noop_without_mesh():
    x = jnp.ones((8, 4))
    np.testing.assert_array_equal(np.asarray(mesh_lib.shard_batch_rays(x)),
                                  np.ones((8, 4)))
