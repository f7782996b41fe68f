"""PDC-Net architecture parity: the JAX rebuild (ops/pdcnet) vs the actual
reference torch network (third_party/DenseMatching, megadepth 'PDCNet'
config), with RANDOM weights copied torch -> JAX via ops/pdcnet/convert.

The real checkpoint is unavailable offline, so this is the strongest
achievable validation: identical weights, identical input images, compare
flow and uncertainty maps per level. The reference's CUDA-only local
correlation is replaced by a CPU torch equivalent (validated against
autograd adjointness here) injected via sys.modules — /root/reference is
never modified.

Usage: python tools/ref_control/compare_pdcnet.py [--hw 64,96]
"""

import argparse
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
DM = "/root/reference/third_party/DenseMatching"


def make_cpu_correlation_module():
    import torch
    import torch.nn.functional as F

    MD = 4

    def FunctionCorrelation(reference_features, query_features):
        b, c, h, w = reference_features.shape
        pad = F.pad(query_features, (MD, MD, MD, MD))
        outs = []
        for dy in range(-MD, MD + 1):
            for dx in range(-MD, MD + 1):
                sh = pad[:, :, MD + dy:MD + dy + h, MD + dx:MD + dx + w]
                outs.append((reference_features * sh).mean(1))
        return torch.stack(outs, 1)

    def FunctionCorrelationTranspose(res, features):
        # exact adjoint of FunctionCorrelation w.r.t. its FIRST argument
        b, c, h, w = features.shape
        pad = F.pad(features, (MD, MD, MD, MD))
        out = torch.zeros_like(features)
        d = 0
        for dy in range(-MD, MD + 1):
            for dx in range(-MD, MD + 1):
                sh = pad[:, :, MD + dy:MD + dy + h, MD + dx:MD + dx + w]
                out = out + res[:, d:d + 1] * sh / c
                d += 1
        return out

    mod = types.ModuleType("cpu_correlation")
    mod.FunctionCorrelation = FunctionCorrelation
    mod.FunctionCorrelationTranspose = FunctionCorrelationTranspose
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="64,96",
                    help="original-resolution input size (divisible by 8)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    for k in [k for k in os.environ
              if k.startswith(("PALLAS_AXON", "AXON"))]:
        os.environ.pop(k, None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(1, DM)
    sys.path.insert(0, REPO)
    import torch

    cpu_corr = make_cpu_correlation_module()
    sys.modules["models.modules.local_correlation.correlation"] = cpu_corr
    sys.modules["third_party.GOCor.GOCor.local_correlation.correlation"] = \
        cpu_corr
    # the parent packages must exist before the fake submodule is importable
    import models.modules.local_correlation as _p1  # noqa: F401
    _p1.correlation = cpu_corr
    import third_party.GOCor.GOCor.local_correlation as _p2  # noqa: F401
    _p2.correlation = cpu_corr

    # adjointness check of the CPU stand-in
    torch.manual_seed(0)
    f = torch.randn(1, 8, 10, 12, requires_grad=True)
    r = torch.randn(1, 8, 10, 12)
    res = torch.randn(1, 81, 10, 12)
    (cpu_corr.FunctionCorrelation(f, r) * res).sum().backward()
    adj = cpu_corr.FunctionCorrelationTranspose(res, r)
    assert torch.allclose(f.grad, adj, atol=1e-5), "CPU transpose wrong"
    print("CPU correlation transpose == autograd adjoint  OK")

    from models.PDCNet.PDCNet import PDCNet_vgg16

    torch.manual_seed(args.seed)
    global_gocor_arguments = {"optim_iter": 3, "steplength_reg": 0.1,
                              "train_label_map": False,
                              "apply_query_loss": True,
                              "reg_kernel_size": 3, "reg_inter_dim": 16,
                              "reg_output_dim": 16}
    local_gocor_arguments = {"optim_iter": 3, "steplength_reg": 0.1}
    net = PDCNet_vgg16(
        global_corr_type="GlobalGOCor",
        global_gocor_arguments=global_gocor_arguments,
        normalize="leakyrelu", same_local_corr_at_all_levels=True,
        local_corr_type="LocalGOCor",
        local_gocor_arguments=local_gocor_arguments,
        local_decoder_type="OpticalFlowEstimatorResidualConnection",
        global_decoder_type="CMDTopResidualConnection",
        corr_for_corr_uncertainty_decoder="corr",
        give_layer_before_flow_to_uncertainty_decoder=True,
        var_2_plus=520 ** 2, var_2_plus_256=256 ** 2,
        var_1_minus_plus=1.0, var_2_minus=2.0)
    net.eval()

    sd = net.state_dict()
    from neural_invertible_warp_tpu.ops.pdcnet import convert, pdcnet
    params = convert.pdcnet_params_from_torch(sd)

    H, W = (int(x) for x in args.hw.split(","))
    rng = np.random.RandomState(args.seed)
    tgt = rng.rand(1, 3, H, W).astype(np.float32)
    src = rng.rand(1, 3, H, W).astype(np.float32)

    def norm(x):
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return (x - mean[None, :, None, None]) / std[None, :, None, None]

    # both implementations receive the SAME normalized inputs (bypassing
    # pre_process resizing so resize kernels are not part of this test)
    import torch.nn.functional as tF
    tgt_t = torch.tensor(norm(tgt))
    src_t = torch.tensor(norm(src))
    tgt256_t = tF.interpolate(torch.tensor(tgt), (256, 256), mode="area")
    src256_t = tF.interpolate(torch.tensor(src), (256, 256), mode="area")
    tgt256 = norm(tgt256_t.numpy())
    src256 = norm(src256_t.numpy())
    tgt256_t = torch.tensor(tgt256)
    src256_t = torch.tensor(src256)

    with torch.no_grad():
        out256_t, out_t = net.forward(tgt_t, src_t, tgt256_t, src256_t)

    out256_j, out_j = pdcnet.pdcnet_forward(
        params, jnp.asarray(norm(tgt)), jnp.asarray(norm(src)),
        jnp.asarray(tgt256), jnp.asarray(src256))

    def cmp(name, t, j, tol):
        t = t.detach().cpu().numpy()
        j = np.asarray(j)
        diff = np.abs(t - j).max()
        scale = max(np.abs(t).max(), 1e-6)
        status = "OK " if diff / scale < tol else "FAIL"
        print("{} {:22s} max|diff|={:.3e}  rel={:.3e}  (scale {:.3e})".format(
            status, name, diff, diff / scale, scale))
        return diff / scale < tol

    ok = True
    for i, lvl in enumerate(["flow4", "flow3"]):
        ok &= cmp(lvl, out256_t["flow_estimates"][i],
                  out256_j["flow_estimates"][i], 1e-3)
        lv_t, w_t = out256_t["uncertainty_estimates"][i]
        lv_j, w_j = out256_j["uncertainty_estimates"][i]
        ok &= cmp(lvl + ".log_var", lv_t, lv_j, 1e-3)
        ok &= cmp(lvl + ".weight", w_t, w_j, 1e-3)
    for i, lvl in enumerate(["flow2", "flow1"]):
        ok &= cmp(lvl, out_t["flow_estimates"][i],
                  out_j["flow_estimates"][i], 1e-3)
        lv_t, w_t = out_t["uncertainty_estimates"][i]
        lv_j, w_j = out_j["uncertainty_estimates"][i]
        ok &= cmp(lvl + ".log_var", lv_t, lv_j, 1e-3)
        ok &= cmp(lvl + ".weight", w_t, w_j, 1e-3)

    print("\nPDC-Net parity:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def debug_bisect(args=None):
    """Capture intermediates on both sides and report the first divergence
    (torch hooks on local_corr + extract_features vs the JAX debug dict)."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="64,96")
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(args or [])

    for k in [k for k in os.environ
              if k.startswith(("PALLAS_AXON", "AXON"))]:
        os.environ.pop(k, None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(1, DM)
    sys.path.insert(0, REPO)
    import torch
    cpu_corr = make_cpu_correlation_module()
    sys.modules["models.modules.local_correlation.correlation"] = cpu_corr
    sys.modules["third_party.GOCor.GOCor.local_correlation.correlation"] = \
        cpu_corr
    import models.modules.local_correlation as _p1
    _p1.correlation = cpu_corr
    import third_party.GOCor.GOCor.local_correlation as _p2
    _p2.correlation = cpu_corr

    from models.PDCNet.PDCNet import PDCNet_vgg16
    torch.manual_seed(a.seed)
    net = PDCNet_vgg16(
        global_corr_type="GlobalGOCor",
        global_gocor_arguments={"optim_iter": 3, "steplength_reg": 0.1,
                                "train_label_map": False,
                                "apply_query_loss": True,
                                "reg_kernel_size": 3, "reg_inter_dim": 16,
                                "reg_output_dim": 16},
        normalize="leakyrelu", same_local_corr_at_all_levels=True,
        local_corr_type="LocalGOCor",
        local_gocor_arguments={"optim_iter": 3, "steplength_reg": 0.1},
        local_decoder_type="OpticalFlowEstimatorResidualConnection",
        global_decoder_type="CMDTopResidualConnection",
        corr_for_corr_uncertainty_decoder="corr",
        give_layer_before_flow_to_uncertainty_decoder=True,
        var_2_plus=520 ** 2, var_2_plus_256=256 ** 2,
        var_1_minus_plus=1.0, var_2_minus=2.0)
    net.eval()
    from neural_invertible_warp_tpu.ops.pdcnet import convert, pdcnet
    params = convert.pdcnet_params_from_torch(net.state_dict())

    H, W = (int(x) for x in a.hw.split(","))
    rng = np.random.RandomState(a.seed)
    tgt = rng.rand(1, 3, H, W).astype(np.float32)
    src = rng.rand(1, 3, H, W).astype(np.float32)

    def norm(x):
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return (x - mean[None, :, None, None]) / std[None, :, None, None]

    import torch.nn.functional as tF
    tgt256 = norm(tF.interpolate(torch.tensor(tgt), (256, 256),
                                 mode="area").numpy())
    src256 = norm(tF.interpolate(torch.tensor(src), (256, 256),
                                 mode="area").numpy())

    captured = {"local_calls": []}

    def hook(mod, inputs, output):
        captured["local_calls"].append(
            (inputs[0].detach().numpy(), inputs[1].detach().numpy(),
             output.detach().numpy()))

    net.local_corr.register_forward_hook(hook)
    with torch.no_grad():
        c14, c24, c13, c23, c12, c22, c11, c21 = net.extract_features(
            torch.tensor(norm(tgt)), torch.tensor(norm(src)),
            torch.tensor(tgt256), torch.tensor(src256))
        out256_t, out_t = net.forward(
            torch.tensor(norm(tgt)), torch.tensor(norm(src)),
            torch.tensor(tgt256), torch.tensor(src256))

    dbg = {}
    out256_j, out_j = pdcnet.pdcnet_forward(
        params, jnp.asarray(norm(tgt)), jnp.asarray(norm(src)),
        jnp.asarray(tgt256), jnp.asarray(src256), debug=dbg)

    def cmp(name, t, j):
        t = np.asarray(t)
        j = np.asarray(j)
        if t.shape != j.shape:
            print("{}: SHAPE {} vs {}".format(name, t.shape, j.shape))
            return
        diff = np.abs(t - j).max()
        scale = max(np.abs(t).max(), 1e-6)
        print("{:14s} rel={:.3e} (scale {:.2e})".format(
            name, diff / scale, scale))

    cmp("c11", c11.numpy(), dbg["c11"])
    cmp("c12", c12.numpy(), dbg["c12"])
    cmp("c22", c22.numpy(), dbg["c22"])
    # local_corr torch call order: level3, level2, level1
    names = ["3", "2", "1"]
    for i, (ref_t, qry_t, out_t_corr) in enumerate(captured["local_calls"]):
        lvl = names[i]
        cmp("warped" + lvl, qry_t, dbg["warped" + lvl])
        cmp("corr" + lvl + "(pre-lrelu)", out_t_corr,
            np.asarray(dbg["corr" + lvl]))  # note: jax is post-lrelu
        cmp("upflow" + lvl, None if i == 0 else None, None) \
            if False else None
    cmp("upflow2", out256_t and 0, 0) if False else None


if __name__ == "__main__":
    if "--bisect" in sys.argv:
        sys.argv.remove("--bisect")
        debug_bisect(sys.argv[1:])
        sys.exit(0)
    sys.exit(main())
