"""Direct DeformNetwork parity probe: reference torch INN vs ops/inn.py.

Same weights (copied via utils/torch_convert), same input points/latents,
same output cotangent G; compares forward outputs elementwise and the VJP
d<out, G>/dparams per leaf. Run at several alpha_ratios and at both
zero-init and randomly-perturbed final layers to expose differences the
identity init hides.
"""

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REFERENCE = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pts", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--d-feature", type=int, default=128)
    ap.add_argument("--alphas", default="0.0,0.02,0.5,1.0")
    ap.add_argument("--perturb", type=float, default=0.05,
                    help="std of the final-layer weight perturbation")
    args = ap.parse_args()

    for k in [k for k in os.environ
              if k.startswith(("PALLAS_AXON", "AXON"))]:
        os.environ.pop(k, None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(HERE, "shims"))
    sys.path.insert(1, REFERENCE)
    sys.path.insert(0, REPO)
    import torch
    from model.nvp.nvp_ndr import DeformNetwork
    from neural_invertible_warp_tpu.ops import inn
    from neural_invertible_warp_tpu.utils import torch_convert

    torch.manual_seed(0)
    net = DeformNetwork(d_feature=args.d_feature, d_in=3, d_out_1=1,
                        d_out_2=3, n_blocks=3, d_hidden=128, n_layers=1,
                        skip_in=[], multires=6, weight_norm=True,
                        actfn="softplus")
    rng = np.random.RandomState(0)
    if args.perturb:
        with torch.no_grad():
            for name, p in net.named_parameters():
                if name.endswith("_a_1.weight") or name.endswith("_b_1.weight"):
                    p.add_(torch.from_numpy(
                        rng.randn(*p.shape).astype(np.float32))
                        * args.perturb)

    sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    jparams = torch_convert.deform_params_from_torch(sd)

    B, N, D = args.batch, args.n_pts, args.d_feature
    feat_np = rng.randn(B, D).astype(np.float32)
    pts_np = (rng.randn(B, N, 3) * 0.7).astype(np.float32)
    G_np = rng.randn(B, N, 3).astype(np.float32)

    for alpha in (float(a) for a in args.alphas.split(",")):
        feat_t = torch.tensor(feat_np, requires_grad=False)
        pts_t = torch.tensor(pts_np)
        out_t = net.forward(feat_t, pts_t.unsqueeze(2), alpha_ratio=alpha)
        out_t_np = out_t.detach().cpu().numpy().reshape(B, N, 3)

        out_j = inn.deform_forward(jparams, jnp.asarray(feat_np),
                                   jnp.asarray(pts_np), jnp.asarray(alpha),
                                   multires=6, actfn="softplus")
        out_j_np = np.asarray(out_j)
        fwd_diff = np.abs(out_t_np - out_j_np).max()
        denom = max(np.abs(out_t_np).max(), 1e-12)
        print("alpha={:4.2f}  fwd max|diff|={:.3e}  (rel {:.3e})".format(
            alpha, fwd_diff, fwd_diff / denom), flush=True)

        # VJP comparison
        net.zero_grad()
        out_t2 = net.forward(feat_t, torch.tensor(pts_np).unsqueeze(2),
                             alpha_ratio=alpha)
        (out_t2.reshape(B, N, 3) * torch.tensor(G_np)).sum().backward()
        t_grads = {k: (p.grad.detach().cpu().numpy().copy()
                       if p.grad is not None else np.zeros(p.shape))
                   for k, p in net.named_parameters()}

        def scalar(p):
            o = inn.deform_forward(p, jnp.asarray(feat_np),
                                   jnp.asarray(pts_np), jnp.asarray(alpha),
                                   multires=6, actfn="softplus")
            return jnp.sum(o * jnp.asarray(G_np))

        j_grads = jax.grad(scalar)(jparams)

        sys.path.insert(0, os.path.join(REPO, "tools", "ref_control"))
        from compare_grads import flatten_jax_grads, normalize_torch_names, \
            compare
        flat_j = flatten_jax_grads(dict(warp_mlp=j_grads))
        flat_j = {k[len("warp_mlp."):]: v for k, v in flat_j.items()}
        flat_t = normalize_torch_names(t_grads)
        rows = compare(flat_t, flat_j)
        bad = [r for r in rows if r[3] not in ("", "both ~0")]
        for k, cos, ratio, note in rows:
            if note not in ("", "both ~0"):
                print("   {:32s} cos={} ratio={} {}".format(
                    k, cos, ratio, note))
        print("   {} / {} grad leaves mismatched".format(len(bad), len(rows)),
              flush=True)


if __name__ == "__main__":
    main()
