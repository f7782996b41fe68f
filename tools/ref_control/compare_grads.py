"""Matched-weight, matched-batch gradient comparison: reference torch
implementation vs the JAX rebuild, one train step, same scene, same rays,
deterministic depths.

This is the bisection instrument for the flagship INN divergence (the
reference recovers on the B3 control scene where the rebuild attractors —
see EVIDENCE_r3.md). It copies the torch model's weights into the rebuild
via utils/torch_convert, evaluates the SAME loss on the SAME batch in both,
and compares loss values and per-parameter-group gradients (cosine + norm
ratio), so any structural difference shows up at the exact leaf where it
lives.

Usage:
  python tools/ref_control/compare_grads.py --scene-root /tmp/refctl/llff_cmp \
      [--size 120,160] [--iter 0]
"""

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REFERENCE = "/root/reference"


def build_reference(scene_root, size, extra=()):
    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(1, REFERENCE)
    cwd = os.getcwd()
    os.chdir(REFERENCE)
    import options as ref_options
    import importlib
    flags = [
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.root={}".format(scene_root), "--data.scene=blobfern",
        "--data.image_size=[{},{}]".format(*size),
        "--data.num_workers=2",
        "--barf_c2f=[0.1,0.5]",
        "--loss_weight.global_alignment=4",
        "--max_iter=200000",
        "--nerf.sample_stratified!",
        "--freq.scalar=1000000000", "--freq.vis=1000000000",
        "--freq.val=1000000000", "--freq.ckpt=1000000000",
        "--output_root=/tmp/refctl/cmp_out", "--group=cmp", "--name=ref",
        "--seed=0", "--visdom!", "--tb!",
    ] + list(extra)
    opt = ref_options.set(opt_cmd=ref_options.parse_arguments(flags))
    assert opt.device == "cpu"
    model_mod = importlib.import_module("model.barf_inn_llff")
    m = model_mod.Model(opt)
    m.load_dataset(opt)
    m.build_networks(opt)
    os.chdir(cwd)
    return m, opt


def torch_train_steps(m, opt, n_steps):
    """Run n_steps REAL training iterations (optimizers + schedulers) so the
    matched comparison can be made at a non-identity state."""
    import time as _time
    from easydict import EasyDict as edict
    m.setup_optimizer(opt)
    m.restore_checkpoint(opt)
    m.timer = edict(start=_time.time(), it_mean=None)
    m.ep = 0
    m.graph.train()
    var = m.train_data.all

    class _L:
        def __len__(self):
            return opt.max_iter

        def set_postfix(self, **kw):
            pass

    loader = _L()
    for it in range(n_steps):
        m.it = it
        m.train_iteration(opt, var, loader)
        if opt.optim.sched:
            m.sched.step()


def torch_one_step(m, opt, perm, it=0):
    """Forward + loss + backward on a FIXED ray permutation; returns
    (losses dict, grads-by-name dict, weights state_dict, data arrays)."""
    import torch

    real_randperm = torch.randperm

    def fixed_randperm(n, **kwargs):
        assert n == len(perm), (n, len(perm))
        return torch.from_numpy(perm.copy())

    torch.randperm = fixed_randperm
    try:
        var = m.train_data.all
        m.graph.zero_grad()
        var = m.graph.forward(opt, var, mode="train", iter=it)
        loss = m.graph.compute_loss(opt, var, mode="train")
        loss = m.summarize_loss(opt, var, loss)
        loss.all.backward()
    finally:
        torch.randperm = real_randperm

    losses = {k: float(v.detach()) for k, v in loss.items()}
    grads = {}
    for name, p in m.graph.named_parameters():
        if p.grad is not None:
            grads[name] = p.grad.detach().cpu().numpy().copy()
    weights = {k: v.detach().cpu().numpy().copy()
               for k, v in m.graph.state_dict().items()}
    data = dict(
        image=var.image.detach().cpu().numpy(),
        intr=var.intr.detach().cpu().numpy(),
        ray_idx=var.ray_idx.detach().cpu().numpy(),
    )
    return losses, grads, weights, data


def jax_one_step(scene_root, size, weights, ray_idx, it=0, extra=()):
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, os.path.join(REPO, "tools"))
    os.chdir(REPO)
    import jax
    import jax.numpy as jnp
    import evidence_r2
    from neural_invertible_warp_tpu.models import get_system_class
    from neural_invertible_warp_tpu.data import llff as llff_data
    from neural_invertible_warp_tpu.utils import torch_convert

    opt = evidence_r2.build("barf_inn_llff", [
        "--model=barf_inn_llff", "--yaml=barf_inn_llff",
        "--data.root={}".format(scene_root), "--data.scene=blobfern",
        "--data.image_size=[{},{}]".format(*size),
        "--data.val_ratio=0.1",
        "--barf_c2f=[0.1,0.5]",
        "--loss_weight.global_alignment=4",
        "--max_iter=200000",
        "--nerf.sample_stratified!",
        "--freq.scalar=1000000", "--freq.val=1000000", "--freq.ckpt=1000000",
        "--output_root=/tmp/refctl/cmp_out", "--group=cmp", "--name=jax",
        "--seed=0",
    ] + list(extra))
    ds_train = llff_data.Dataset(opt, split="train")
    ds_val = llff_data.Dataset(opt, split="val")
    system = get_system_class("barf_inn_llff")(opt)
    system.attach_data(ds_train.all_arrays(opt), ds_val.all_arrays(opt))
    state = system.init_state(jax.random.PRNGKey(0))
    params = dict(state["params"])
    params.update(torch_convert.inn_llff_params_from_torch(weights))
    aux = state["aux"]
    data = system.train_data
    step = jnp.asarray(it, jnp.int32)
    key = jax.random.PRNGKey(0)  # depths deterministic (stratified off)
    ridx = jnp.asarray(ray_idx)

    def loss_fn(p):
        out, target, extras = system._forward_train(p, aux, data, ridx,
                                                    key, step)
        losses = system.compute_loss(p, aux, data, out, target, step, extras)
        return system.summarize_loss(losses), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    losses = {k: float(v) for k, v in losses.items()}
    losses["all"] = float(total)
    sysdata = dict(image=np.asarray(data["image"]),
                   intr=np.asarray(data["intr"]))
    return losses, grads, sysdata


def flatten_jax_grads(grads):
    """JAX grad pytree -> torch-name-keyed numpy dict (inverse layout of
    utils/torch_convert: transpose back, reshape g)."""
    out = {}
    nerf = grads.get("nerf")
    if nerf:
        for group, tname in ((nerf["feat"], "nerf.mlp_feat"),
                             (nerf["rgb"], "nerf.mlp_rgb")):
            for i, layer in enumerate(group):
                out["{}.{}.weight".format(tname, i)] = np.asarray(layer["w"]).T
                out["{}.{}.bias".format(tname, i)] = np.asarray(layer["b"])
    warp = grads.get("warp_mlp")
    if warp:
        for i_b, block in enumerate(warp["blocks"]):
            for branch, bname in ((block["a"], "a"), (block["b"], "b")):
                for l, layer in enumerate(branch):
                    name = "warp_mlp.lin{}_{}_{}".format(i_b, bname, l)
                    if "v" in layer:
                        out[name + ".weight_v"] = np.asarray(layer["v"]).T
                        out[name + ".weight_g"] = np.asarray(
                            layer["g"]).reshape(-1, 1)
                        out[name + ".bias"] = np.asarray(layer["b"])
                    else:
                        out[name + ".weight"] = np.asarray(layer["w"]).T
                        out[name + ".bias"] = np.asarray(layer["b"])
            out["warp_mlp.lin{}_c.weight".format(i_b)] = \
                np.asarray(block["c"]["w"]).T
            out["warp_mlp.lin{}_c.bias".format(i_b)] = \
                np.asarray(block["c"]["b"])
    if "warp_latent" in grads and grads["warp_latent"] is not None:
        out["warp_latent.weight"] = np.asarray(grads["warp_latent"])
    return out


def normalize_torch_names(grads):
    """Map torch parametrizations-style weight-norm names to weight_v/g."""
    out = {}
    for k, v in grads.items():
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        out[k] = v
    return out


def compare(torch_grads, jax_grads, atol=1e-8):
    rows = []
    keys = sorted(set(torch_grads) | set(jax_grads))
    for k in keys:
        gt = torch_grads.get(k)
        gj = jax_grads.get(k)
        if gt is None or gj is None:
            rows.append((k, None, None, "missing in {}".format(
                "jax" if gj is None else "torch")))
            continue
        gt = gt.reshape(-1)
        gj = gj.reshape(-1)
        nt, nj = np.linalg.norm(gt), np.linalg.norm(gj)
        if nt < atol and nj < atol:
            rows.append((k, 1.0, 1.0, "both ~0"))
            continue
        cos = float(np.dot(gt, gj) / max(nt * nj, 1e-30))
        ratio = float(nj / max(nt, 1e-30))
        note = "" if (cos > 0.999 and 0.99 < ratio < 1.01) else "MISMATCH"
        rows.append((k, cos, ratio, note))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene-root", default="/tmp/refctl/llff_cmp")
    ap.add_argument("--size", default="120,160")
    ap.add_argument("--iter", type=int, default=0)
    ap.add_argument("--steps", type=int, default=0,
                    help="train the torch model this many REAL steps first, "
                         "then compare at that state (iter defaults to it)")
    ap.add_argument("--seed-perm", type=int, default=123)
    args = ap.parse_args()

    for k in [k for k in os.environ
              if k.startswith(("PALLAS_AXON", "AXON"))]:
        os.environ.pop(k, None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the container's sitecustomize may have pre-registered the axon TPU
    # platform at interpreter start; force the CPU backend (cf. conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

    H, W = (int(x) for x in args.size.split(","))
    if not os.path.isdir(os.path.join(args.scene_root, "blobfern")):
        sys.path.insert(0, HERE)
        from gen_scene import ensure_scene  # noqa: E402
        ensure_scene(args.scene_root, img_size=(H, W))
        print("scene built at native size (no resize in either loader)")

    m, opt = build_reference(args.scene_root, (H, W))
    it = args.iter
    if args.steps:
        print("training torch reference for {} steps...".format(args.steps))
        torch_train_steps(m, opt, args.steps)
        it = it or args.steps
    n_rays_total = opt.H * opt.W
    perm = np.random.RandomState(args.seed_perm).permutation(
        n_rays_total).astype(np.int64)
    t_losses, t_grads, weights, t_data = torch_one_step(m, opt, perm, it=it)
    t_grads = normalize_torch_names(t_grads)
    print("torch losses:", {k: "{:.6e}".format(v)
                            for k, v in t_losses.items()})

    j_losses, j_grads, j_data = jax_one_step(
        args.scene_root, (H, W), weights, t_data["ray_idx"], it=args.iter)
    print("jax   losses:", {k: "{:.6e}".format(v)
                            for k, v in j_losses.items()})

    img_diff = np.abs(t_data["image"].transpose(0, 2, 3, 1)
                      - j_data["image"]).max()
    intr_diff = np.abs(t_data["intr"] - j_data["intr"]).max()
    print("data parity: image max|diff|={:.2e} intr max|diff|={:.2e}".format(
        img_diff, intr_diff))

    rows = compare(t_grads, flatten_jax_grads(j_grads))
    bad = [r for r in rows if r[3] not in ("", "both ~0")]
    print("\n{:46s} {:>8s} {:>9s}  note".format("param", "cos", "|j|/|t|"))
    for k, cos, ratio, note in rows:
        if cos is None:
            print("{:46s} {:>8s} {:>9s}  {}".format(k, "-", "-", note))
        else:
            print("{:46s} {:8.5f} {:9.5f}  {}".format(k, cos, ratio, note))
    print("\n{} / {} leaves mismatched".format(len(bad), len(rows)))


if __name__ == "__main__":
    main()
