"""Quick in-train step timing at configurable steps-per-call (axon-tunnel
dispatch-overhead diagnosis): times the flagship train_multi_step with ONE
final sync, for each --spcs value."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "tools")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spcs", default="50,200")
    ap.add_argument("--reps", type=int, default=400)
    ap.add_argument("--extra", action="append", default=[])
    args = ap.parse_args()

    import jax
    import evidence_r2
    from neural_invertible_warp_tpu.models import get_system_class
    from neural_invertible_warp_tpu.data import llff as llff_data

    import os
    if not os.path.isdir("/tmp/evidence_r2c/llff/blobfern"):
        import synth_data
        synth_data.make_blob_llff_scene("/tmp/evidence_r2c/llff",
                                        n_images=20, img_size=(480, 640),
                                        n_blobs=24, val_ratio=0.1,
                                        backdrop=True)

    opt = evidence_r2.build("barf_inn_llff", [
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.root=/tmp/evidence_r2c/llff", "--data.scene=blobfern",
        "--data.image_size=[480,640]", "--data.val_ratio=0.1",
        "--barf_c2f=[0.1,0.5]",
        "--loss_weight.global_alignment=4", "--max_iter=200000",
        "--output_root=/tmp/ablate", "--group=g", "--name=n", "--seed=0",
    ] + ["--{}".format(e) for e in args.extra])
    ds_train = llff_data.Dataset(opt, split="train")
    ds_val = llff_data.Dataset(opt, split="val")
    system = get_system_class("barf_inn_llff")(opt)
    system.attach_data(ds_train.all_arrays(opt), ds_val.all_arrays(opt))

    base = jax.random.PRNGKey(0)
    for spc in (int(x) for x in args.spcs.split(",")):
        system._train_scan_jit = None   # re-trace for the new spc
        state = system.init_state(jax.random.PRNGKey(0))
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(np.arange(spc))
        state, m = system.train_multi_step(state, keys)
        float(m["loss_all"])
        reps = max(args.reps // spc, 1) * spc
        t0 = time.time()
        for _ in range(reps // spc):
            state, m = system.train_multi_step(state, keys)
        float(m["loss_all"])
        dt = (time.time() - t0) / reps * 1000
        print("spc={:4d}: {:.2f} ms/step".format(spc, dt), flush=True)


if __name__ == "__main__":
    main()
