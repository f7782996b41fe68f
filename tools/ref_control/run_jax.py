"""Run the JAX rebuild on the SAME scene/hyperparameters as run_ref.py,
emitting the same JSONL rows, for the side-by-side attractor comparison
(VERDICT r2 Next #1).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

import evidence_r2  # noqa: E402
from run_ref import small_flags  # noqa: E402  (same reduced config)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene-root", default="/tmp/refctl/llff")
    ap.add_argument("--scene", default="blobfern")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--out", default="/tmp/refctl/jax.jsonl")
    ap.add_argument("--model", default="barf_inn_llff")
    ap.add_argument("--yaml", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--max-iter", type=int, default=200000,
                    help="config max_iter (see run_ref.py: compressing it "
                         "makes late-phase c2f dynamics CPU-reachable)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (hermetic; else TPU if up)")
    ap.add_argument("--overrides", default="")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        for k in [k for k in os.environ
                  if k.startswith(("PALLAS_AXON", "AXON"))]:
            os.environ.pop(k, None)
        # the sitecustomize may have pre-registered the axon platform
        import jax
        jax.config.update("jax_platforms", "cpu")

    flags = [
        "--model={}".format(args.model),
        "--yaml={}".format(args.yaml or args.model),
        "--data.root={}".format(args.scene_root),
        "--data.scene={}".format(args.scene),
        "--data.val_ratio=0.1",
        "--barf_c2f=[0.1,0.5]",
        "--loss_weight.global_alignment=4",
        "--max_iter={}".format(args.max_iter),
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/refctl/jax_out",
        "--group=refctl", "--name={}".format(args.model),
        "--seed={}".format(args.seed),
    ]
    if args.small:
        flags += small_flags()
    flags += ["--{}".format(o) for o in args.overrides.split(",") if o]

    opt = evidence_r2.build(args.yaml or args.model, flags)
    trainer = evidence_r2.make_trainer(opt)
    system, state = trainer.system, trainer.state

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    out = open(args.out, "w")

    def emit(row):
        out.write(json.dumps(row) + "\n")
        out.flush()
        print(row, flush=True)

    R0, t0v = system.evaluate_camera_alignment(state)
    emit(dict(it=0, impl="jax", elapsed=0.0,
              err_R_deg=float(np.rad2deg(np.mean(R0))),
              err_t=float(np.mean(t0v)),
              err_R_rel=evidence_r2.relative_pose_error(system, state)))

    spc = min(args.log_every, 100)
    assert args.log_every % spc == 0
    state, history = evidence_r2.train_loop(
        system, state, args.iters, spc=spc, log_every=args.log_every)
    for row in history:
        row["impl"] = "jax"
        emit(row)
    out.close()


if __name__ == "__main__":
    main()
