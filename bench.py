"""Benchmark: rays/sec/chip for the flagship joint pose+NeRF training loop.

Reproduces the LLFF-fern paper configuration shapes (reference
options/nerf_inn_llff.yaml + scripts/train_llff.sh): 2048 rays/step across the
whole training split, 128 stratified inverse-depth samples, 8x256 NeRF MLP with
L=10/4 PE, 3-block INN warp (d_hidden 128, multires 6, latent 128), photometric
MSE + SVD global-alignment loss, dual Adam optimizers — one full jitted train
step per iteration.

Prints ONE JSON line:
  {"metric": "rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": N / A100_BASELINE_RAYS_PER_SEC}

Baseline note: the reference never measures throughput (BASELINE.md). The
constant below is an engineering estimate of the reference PyTorch code on one
A100 (BARF-lineage codebases run ~3-6 it/s at 2048 rays/step => ~10k rays/s);
it must be replaced by a measured number when A100 hardware is available.
"""

import json
import sys
import time

import numpy as np

A100_BASELINE_RAYS_PER_SEC = 10_000.0

# fern: 20 images, val_ratio 0.1 -> 18 train images (reference data/llff.py:32)
N_IMAGES = 18
H, W = 480, 640
RAND_RAYS = 2048
WARMUP_STEPS = 3
BENCH_STEPS = 300
STEPS_PER_CALL = 50


def build():
    import jax
    from neural_invertible_warp_tpu import config
    from neural_invertible_warp_tpu.models import get_system_class

    opt = config.load_options("options/barf_inn_llff.yaml")
    over = config.parse_arguments([
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.image_size=[{},{}]".format(H, W),
        "--loss_weight.global_alignment=4",   # scripts/train_llff.sh weights
    ])
    opt = config.override_options(opt, over, key_stack=[], safe_check=True)
    opt.H, opt.W = H, W

    f = 3260.0 * W / 4032.0
    rng = np.random.RandomState(0)

    def arrays(n, seed):
        r = np.random.RandomState(seed)
        return dict(
            image=r.rand(n, H, W, 3).astype(np.float32),
            intr=np.tile(np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]],
                                  np.float32), (n, 1, 1)),
            pose=np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1)),
            idx=np.arange(n, dtype=np.int32),
        )

    system = get_system_class("barf_inn_llff")(opt)
    system.attach_data(arrays(N_IMAGES, 0), arrays(2, 1))
    state = system.init_state(jax.random.PRNGKey(0))
    return system, state


def main():
    import jax

    t_build = time.time()
    system, state = build()
    key = jax.random.PRNGKey(0)
    print("built in {:.1f}s".format(time.time() - t_build), file=sys.stderr)

    t_compile = time.time()
    for i in range(WARMUP_STEPS):
        state, metrics = system.train_step(state, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss_all"])
    print("compiled+warm in {:.1f}s".format(time.time() - t_compile), file=sys.stderr)

    # scan-batched steps: one dispatch per STEPS_PER_CALL iterations so host
    # dispatch latency does not pollute the measurement
    def keys_for(start):
        return jax.vmap(lambda i: jax.random.fold_in(key, i))(
            np.arange(start, start + STEPS_PER_CALL))

    state, metrics = system.train_multi_step(state, keys_for(10_000))  # compile
    float(metrics["loss_all"])  # hard sync — block_until_ready is unreliable
    t0 = time.time()            # through the remote-execution tunnel
    for c in range(BENCH_STEPS // STEPS_PER_CALL):
        state, metrics = system.train_multi_step(
            state, keys_for(WARMUP_STEPS + c * STEPS_PER_CALL))
        float(metrics["loss_all"])
    dt = time.time() - t0

    steps_per_sec = BENCH_STEPS / dt
    rays_per_sec = steps_per_sec * RAND_RAYS
    n_chips = jax.device_count()
    value = rays_per_sec / n_chips
    assert np.isfinite(float(metrics["loss_all"])), "bench step diverged"
    print(json.dumps({
        "metric": "rays_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / A100_BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
