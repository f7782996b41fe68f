"""Op-level profile of the flagship train step on the real chip.

Captures a jax.profiler trace around scan-batched train steps and parses the
xplane with xprof's converter (framework_op_stats / op_profile) to print the
per-op time ledger — the measurement NOTES_r2's "glue ~5 ms" estimate lacked.

Usage: python tools/profile_step.py [--tool framework_op_stats] [--extra k=v]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
sys.path.insert(0, "tools")

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def build(extra):
    import jax
    import evidence_r2
    from neural_invertible_warp_tpu.models import get_system_class
    from neural_invertible_warp_tpu.data import llff as llff_data

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
        "--output_root=/tmp/profile", "--group=g", "--name=n", "--seed=0",
    ] + extra)
    ds_train = llff_data.Dataset(opt, split="train")
    ds_val = llff_data.Dataset(opt, split="val")
    system = get_system_class("barf_inn_llff")(opt)
    system.attach_data(ds_train.all_arrays(opt), ds_val.all_arrays(opt))
    state = system.init_state(jax.random.PRNGKey(0))
    return system, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tool", default="framework_op_stats")
    ap.add_argument("--trace-dir", default="/tmp/profile/trace")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--spc", type=int, default=50)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--extra", action="append", default=[])
    args = ap.parse_args()

    import jax
    system, state = build(["--{}".format(e) for e in args.extra])

    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        np.arange(args.spc))
    # warmup/compile
    state, m = system.train_multi_step(state, keys)
    float(m["loss_all"])

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps // args.spc):
            state, m = system.train_multi_step(state, keys)
            float(m["loss_all"])

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, "no xplane written under {}".format(args.trace_dir)
    xplane = paths[-1]
    print("xplane:", xplane)

    from xprof.convert import raw_to_tool_data as r2t
    names = r2t.xspace_to_tool_names([xplane])
    print("tools available:", names)

    data, _ = r2t.xspace_to_tool_data([xplane], args.tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    out_path = os.path.join(args.trace_dir, args.tool + ".json")
    with open(out_path, "w") as f:
        f.write(data)
    print("wrote", out_path)

    try:
        parsed = json.loads(data)
    except Exception:
        print(data[:4000])
        return
    # framework_op_stats is gviz-style: find the table rows
    if isinstance(parsed, list):
        parsed = parsed[0]
    cols = [c.get("label") or c.get("id") for c in parsed["cols"]]
    rows = parsed["rows"]
    print("columns:", cols)
    def cell(row, i):
        v = row["c"][i]
        return None if v is None else v.get("v")
    # pick useful columns if present
    idx = {c: i for i, c in enumerate(cols)}
    tcol = None
    for cand in ("Total self-time (us)", "total_self_time",
                 "Total self time (us)", "Avg. self-time (us)"):
        if cand in idx:
            tcol = idx[cand]
            break
    if tcol is None:
        tcol = len(cols) - 1
    rows_s = sorted(rows, key=lambda r: -(cell(r, tcol) or 0))
    for r in rows_s[:args.top]:
        print(" | ".join(str(cell(r, i)) for i in range(len(cols))))


if __name__ == "__main__":
    main()
