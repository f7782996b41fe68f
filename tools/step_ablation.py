"""Step-time ablation on the real chip: time the flagship train step with
pieces knocked out to locate the remaining XLA glue (NOTES_r2 step budget).

Each variant times 100 scan-batched steps with single-scalar sync."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "tools")


def main():
    import jax
    import jax.numpy as jnp
    import evidence_r2
    from neural_invertible_warp_tpu.models import get_system_class
    from neural_invertible_warp_tpu.data import llff as llff_data

    def build(extra):
        opt = evidence_r2.build("barf_inn_llff", [
            "--model=barf_inn_llff", "--yaml=barf_inn_llff",
            "--data.root=/tmp/evidence_r2c/llff", "--data.scene=blobfern",
            "--data.image_size=[480,640]", "--data.val_ratio=0.1",
            "--barf_c2f=[0.1,0.5]",
            "--loss_weight.global_alignment=4", "--max_iter=200000",
            "--output_root=/tmp/ablate", "--group=g", "--name=n", "--seed=0",
        ] + extra)
        ds_train = llff_data.Dataset(opt, split="train")
        ds_val = llff_data.Dataset(opt, split="val")
        system = get_system_class("barf_inn_llff")(opt)
        system.attach_data(ds_train.all_arrays(opt), ds_val.all_arrays(opt))
        state = system.init_state(jax.random.PRNGKey(0))
        return system, state

    def time_step(system, state, reps=200, spc=50):
        base = jax.random.PRNGKey(0)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(np.arange(spc))
        state, m = system.train_multi_step(state, keys)
        float(m["loss_all"])
        t0 = time.time()
        for c in range(reps // spc):
            state, m = system.train_multi_step(state, keys)
        # async dispatches, ONE sync: the per-chunk float() paid a ~130 ms
        # axon-tunnel round trip per 50 steps (+2.7 ms/step, r3 profile)
        float(m["loss_all"])
        return (time.time() - t0) / reps * 1000

    variants = [
        ("fused_raymarch (pe+comp)", ["--tpu.fused_raymarch"]),
        ("full (fused_pe)", []),
        ("fused_field kernel", ["--tpu.fused_pe!"]),
    ]
    for name, extra in variants:
        try:
            system, state = build(extra)
            ms = time_step(system, state)
            print("{:24s} {:.2f} ms/step".format(name, ms), flush=True)
        except Exception as e:
            print("{:24s} FAILED: {}".format(name, str(e)[:160]), flush=True)


if __name__ == "__main__":
    main()
