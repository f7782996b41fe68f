"""Base NeRF system: parameters, optimizers, jitted train step, renderer.

This replaces the reference's Model/Graph class pyramid (reference
model/base.py, model/nerf.py) with a functional design: all learnable state
lives in a single pytree, one jitted ``train_step`` consumes the whole
prefetched dataset (the reference trains on all images per step — SURVEY.md
Q7), and full-image rendering is a ``lax.map`` over ray chunks instead of a
Python loop (reference render_by_slices, model/nerf.py:321-332).

Subclasses override the pose providers and loss set; the render core is shared.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import align, nerf_mlp, rays, render, sampling
from ..ops import pose as pose_ops
from ..parallel import mesh as mesh_lib
from ..utils import log


def clip_wrap(tx, max_norm):
    """Optionally prepend global-norm gradient clipping to an optimizer.

    No reference equivalent (the reference never clips); off by default.
    Useful for very long runs where the BARF c2f opening of the finest PE
    bands (x1000-class gradient amplification, NOTES_r2) can kick an
    already-converged pose solution out of its basin.
    """
    if max_norm:
        return optax.chain(optax.clip_by_global_norm(float(max_norm)), tx)
    return tx


def exp_decay_gamma(opt, lr, lr_end):
    """gamma = (lr_end/lr)^(1/max_iter) (reference model/nerf.py:42-44)."""
    if lr_end:
        return (lr_end / lr) ** (1.0 / opt.max_iter)
    return 1.0


class NerfSystem:
    """Vanilla NeRF with known poses (reference model/nerf.py)."""

    model_name = "nerf"

    def __init__(self, opt):
        self.opt = opt
        self.H, self.W = opt.H, opt.W
        self.HW = opt.H * opt.W
        self.arch = opt.arch
        self.n_train = None          # set by attach_data
        self.train_data = None
        self.test_data = None
        self.sim3 = None             # set by prealignment (pose models)
        self._train_step_jit = None
        self._render_image_jit = None
        self._fused_field = None

    # ------------------------------------------------------------------ data

    def attach_data(self, train_arrays, test_arrays):
        """Upload the prefetched splits to device (replaces prefetch_all_data)."""
        def to_device(arrays):
            d = {k: jnp.asarray(v) for k, v in arrays.items()}
            B = d["image"].shape[0]
            d["pixels"] = d["image"].reshape(B, -1, 3)   # [B,HW,3] row-major
            return d
        self.train_data = to_device(train_arrays)
        self.test_data = to_device(test_arrays)
        self.n_train = int(self.train_data["image"].shape[0])

    # ---------------------------------------------------------------- params

    # field hooks — the GARF family swaps these for the gaussian field
    def init_field_params(self, key):
        return nerf_mlp.init_nerf_params(key, self.arch,
                                         view_dep=self.opt.nerf.view_dep)

    def _use_fused_field(self):
        """Fused Pallas kernel: on by default on TPU for the reference arch
        (fp32 parity verified against the jnp path in tests/test_fused_field)."""
        if self._fused_field is None:
            from ..ops.pallas import fused_field, fused_pe
            tpu_cfg = self.opt.get("tpu") or {}
            on_tpu = jax.devices()[0].platform not in ("cpu",)
            use_pe = bool(tpu_cfg.get("fused_pe", True) and on_tpu and
                          fused_pe.supports(self.arch, self.opt.nerf))
            use_field = bool(tpu_cfg.get("fused_kernel", True) and on_tpu and
                             fused_field.supports(self.arch, self.opt.nerf))
            # "pe" = PE+MLP fused (round-2 layout), "field" = MLP-only fused
            self._fused_field = "pe" if use_pe else \
                ("field" if use_field else "off")
            if self._fused_field != "off":
                log.info("using fused Pallas field kernel ({})".format(
                    self._fused_field))
        return self._fused_field

    def _kernel_compute_dtype(self):
        """MXU operand dtype for the fused kernels (tpu.compute_dtype;
        f32 accumulation either way — see ops/pallas/fused_field.py)."""
        return (self.opt.get("tpu") or {}).get("compute_dtype") or "float32"

    def apply_field_samples(self, field_params, center, ray, depth, **kwargs):
        mode = self._use_fused_field()
        noisy = bool(kwargs.get("density_noise_reg")
                     and kwargs.get("noise_key") is not None)
        if mode == "pe":
            K = depth.shape[2]
            from ..ops.pallas import fused_pe
            if fused_pe.supports(self.arch, self.opt.nerf, sample_intvs=K):
                # pre-activation density noise (reference model/nerf.py:
                # 430-433) rides into the kernel as a lane-dense [R,K]
                # operand (r4) — the wrapper draws the exact jnp-path noise
                return fused_pe.fused_apply_nerf_samples_pe(
                    field_params, self.arch, center, ray, depth,
                    compute_dtype=self._kernel_compute_dtype(), **kwargs)
            mode = "field"   # e.g. fine-sampling call with an odd K
        if mode == "field" and noisy:
            # the MLP-only kernel has no noise operand; its density comes
            # out post-softplus — use the jnp path for exactness
            mode = "off"
        if mode == "field":
            from ..ops.pallas import fused_field
            kwargs.pop("density_noise_reg", None)
            kwargs.pop("noise_key", None)
            return fused_field.fused_apply_nerf_samples(
                field_params, self.arch, center, ray, depth,
                compute_dtype=self._kernel_compute_dtype(), **kwargs)
        return nerf_mlp.apply_nerf_samples(field_params, self.arch, center,
                                           ray, depth, **kwargs)

    def init_params(self, key):
        params = {}
        key, k1, k2 = jax.random.split(key, 3)
        params["nerf"] = self.init_field_params(k1)
        if self.opt.nerf.fine_sampling:
            params["nerf_fine"] = self.init_field_params(k2)
        return params

    def init_aux(self, key):
        """Non-optimized state carried through training (pose readouts etc.)."""
        return {}

    def param_labels(self, params):
        """Label each top-level param group for its optimizer."""
        return {k: "main" for k in params}

    def make_optimizers(self):
        """dict label -> optax transform. Adam + per-step exponential decay
        (reference model/nerf.py:33-46)."""
        opt = self.opt
        gamma = exp_decay_gamma(opt, opt.optim.lr, opt.optim.get("lr_end"))
        sched = lambda count: opt.optim.lr * gamma ** count
        return {"main": clip_wrap(optax.adam(learning_rate=sched),
                                  opt.optim.get("clip_norm"))}

    def init_state(self, key):
        from ..utils.flat_optim import FlatMultiOptimizer
        k_param, k_aux = jax.random.split(key)
        params = self.init_params(k_param)
        labels = self.param_labels(params)
        # raveled per-group Adam: bit-identical to per-leaf optax but a
        # handful of fused ops instead of hundreds of tiny ones
        self.tx = FlatMultiOptimizer(self.make_optimizers(), labels)
        opt_state = self.tx.init(params)
        return dict(params=params, opt_state=opt_state,
                    step=jnp.zeros((), jnp.int32), aux=self.init_aux(k_aux))

    # ----------------------------------------------------------------- poses

    def get_train_pose(self, params, aux, data):
        return data["pose"]

    def get_eval_pose(self, params, aux, pose_GT):
        """Pose used to render a val/test view (sim3-aligned for pose models)."""
        return pose_GT

    # ---------------------------------------------------------------- render

    def render_rays(self, params, center, ray, key, mode="train", progress=1.0,
                    depth_range=None, intr=None, target=None):
        """Shared render core: stratified sampling -> field -> compositing.

        center/ray: [B,R,3]. Returns dict(rgb, depth, opacity[, *_fine]).
        """
        opt = self.opt
        B, R = center.shape[0], center.shape[1]
        if key.ndim == 2:       # pre-split [2,2] pair (train_multi_step —
            k_depth, k_noise = key[0], key[1]   # one batched threefry per
        else:                   # scan chunk instead of ~165 us/step of
            k_depth, k_noise = jax.random.split(key)   # tiny in-body splits
        stratified = opt.nerf.sample_stratified and mode == "train"
        depth_range = depth_range if depth_range is not None else tuple(opt.nerf.depth.range)
        depth = sampling.sample_depth(
            k_depth, B, R, opt.nerf.sample_intvs, depth_range,
            param=opt.nerf.depth.param, stratified=stratified)
        if opt.camera.ndc:
            assert intr is not None, "NDC conversion needs per-image intrinsics"
            center, ray = rays.convert_NDC(center, ray, intr)
        noise_active = bool(mode == "train"
                            and opt.nerf.get("density_noise_reg"))
        if (self._use_fused_field() == "pe" and not opt.nerf.fine_sampling
                and (opt.get("tpu") or {}).get("fused_raymarch", False)):
            # fully fused ray-march: PE + MLP + alpha compositing in one
            # kernel on the fused_pe layout (round-2 rework of the round-1
            # raymarch.py whose narrow-lane encode fragmented in Mosaic).
            # Per-point weighted contributions [n,8] come out; the per-ray
            # sum is one cheap XLA reduction.
            from ..ops.pallas import fused_pe
            if fused_pe.supports(self.arch, opt.nerf,
                                 sample_intvs=depth.shape[2]):
                if (mode == "train" and target is not None
                        and (opt.get("tpu") or {}).get("fused_train", True)):
                    # one-call fused render+MSE: the forward kernel is
                    # redundant in training (the backward recomputes it),
                    # so fwd + in-kernel photometric cotangent + bwd run as
                    # a single pallas call; compute_loss picks up the
                    # differentiable sq_sum (fused_pe.py, r3). density
                    # noise rides in as a [R,K] operand (r4)
                    out, sq, n_terms = fused_pe.fused_render_rays_pe_train(
                        params["nerf"], self.arch, center, ray, depth,
                        target, progress=progress,
                        barf_c2f=tuple(opt.barf_c2f) if opt.get("barf_c2f")
                        else None,
                        setbg_opaque=bool(opt.nerf.get("setbg_opaque")),
                        bgcolor=opt.data.get("bgcolor"),
                        compute_dtype=self._kernel_compute_dtype(),
                        density_activ=self.arch.get("density_activ",
                                                    "softplus"),
                        density_noise_reg=(opt.nerf.get("density_noise_reg")
                                           if noise_active else None),
                        noise_key=jax.random.fold_in(k_noise, 0))
                    out["render_sq_sum"] = sq
                    out["render_n"] = n_terms
                    return out
                if not noise_active:   # eval kernel has no noise operand
                    rgb, d, opac = fused_pe.fused_render_rays_pe(
                        params["nerf"], self.arch, center, ray, depth,
                        progress=progress,
                        barf_c2f=tuple(opt.barf_c2f) if opt.get("barf_c2f")
                        else None,
                        setbg_opaque=bool(opt.nerf.get("setbg_opaque")),
                        bgcolor=opt.data.get("bgcolor"),
                        compute_dtype=self._kernel_compute_dtype(),
                        density_activ=self.arch.get("density_activ",
                                                    "softplus"))
                    return dict(rgb=rgb, depth=d, opacity=opac)
        if (opt.nerf.fine_sampling and mode == "train" and target is not None
                and self._use_fused_field() == "pe"
                and (opt.get("tpu") or {}).get("fused_raymarch", False)
                and (opt.get("tpu") or {}).get("fused_train", True)
                and (opt.get("tpu") or {}).get("fused_raymarch_full", True)):
            # fully-fused fine-sampling training: the reference resamples
            # under torch.no_grad() (model/nerf.py:311-315), so the coarse
            # network's ONLY gradient is its own photometric MSE — it can
            # run the one-call train kernel too, emitting the per-sample
            # compositing weights as a stop-grad output for the CDF
            # resample. Two one-call kernels replace the coarse SoA
            # fwd+bwd pair plus the fine train kernel (one fewer dispatch
            # and no coarse forward recompute).
            from ..ops.pallas import fused_pe
            K_c = depth.shape[2]
            K_f = K_c + opt.nerf.sample_intvs_fine
            if (fused_pe.supports(self.arch, opt.nerf, sample_intvs=K_c)
                    and fused_pe.supports(self.arch, opt.nerf,
                                          sample_intvs=K_f)):
                kw = dict(
                    progress=progress,
                    barf_c2f=tuple(opt.barf_c2f) if opt.get("barf_c2f")
                    else None,
                    setbg_opaque=bool(opt.nerf.get("setbg_opaque")),
                    bgcolor=opt.data.get("bgcolor"),
                    compute_dtype=self._kernel_compute_dtype(),
                    density_activ=self.arch.get("density_activ",
                                                "softplus"),
                    density_noise_reg=(opt.nerf.get("density_noise_reg")
                                       if noise_active else None))
                out_c, sq_c, n_c = fused_pe.fused_render_rays_pe_train(
                    params["nerf"], self.arch, center, ray, depth, target,
                    noise_key=jax.random.fold_in(k_noise, 0),
                    want_prob=True, **kw)
                pdf = out_c.pop("prob")   # already stop-gradiented
                depth_fine = sampling.sample_depth_from_pdf(
                    pdf, opt.nerf.sample_intvs, opt.nerf.sample_intvs_fine,
                    depth_range)
                depth_all = jnp.sort(
                    jnp.concatenate([depth, depth_fine], axis=2), axis=2)
                out_f, sq_f, n_f = fused_pe.fused_render_rays_pe_train(
                    params["nerf_fine"], self.arch, center, ray, depth_all,
                    target, noise_key=jax.random.fold_in(k_noise, 1), **kw)
                out_c.update(render_sq_sum=sq_c, render_n=n_c,
                             rgb_fine=out_f["rgb"],
                             depth_fine=out_f["depth"],
                             opacity_fine=out_f["opacity"],
                             render_fine_sq_sum=sq_f, render_fine_n=n_f)
                return out_c
        common = dict(
            view_dep=opt.nerf.view_dep,
            density_activ=self.arch.get("density_activ", "softplus"),
            progress=progress,
            barf_c2f=tuple(opt.barf_c2f) if opt.get("barf_c2f") else None,
            density_noise_reg=opt.nerf.get("density_noise_reg") if mode == "train" else None,
            # coarse and fine draw INDEPENDENT density noise (the reference
            # calls randn_like fresh per forward_samples call); fold_in keeps
            # the streams decorrelated without another split at trace time
            noise_key=jax.random.fold_in(k_noise, 0),
        )
        rgb, d, opac, prob = self._field_composite(
            params["nerf"], center, ray, depth, common)
        out = dict(rgb=rgb, depth=d, opacity=opac)
        if opt.nerf.fine_sampling:
            pdf = jax.lax.stop_gradient(prob)
            depth_fine = sampling.sample_depth_from_pdf(
                pdf, opt.nerf.sample_intvs, opt.nerf.sample_intvs_fine, depth_range)
            depth_all = jnp.sort(jnp.concatenate([depth, depth_fine], axis=2), axis=2)
            if (mode == "train" and target is not None
                    and self._use_fused_field() == "pe"
                    and (opt.get("tpu") or {}).get("fused_raymarch", False)
                    and (opt.get("tpu") or {}).get("fused_train", True)):
                # FALLBACK tier: reached only when the fully-fused branch
                # above could not fire (fused_pe.supports rejected K_c or
                # K_f — e.g. a sample count the kernel can't tile — or
                # `tpu.fused_raymarch_full: false` forces this tier for
                # A/B controls). The
                # coarse net then runs the SoA field pair (its prob comes
                # from XLA compositing) and only the FINE net — whose
                # outputs feed nothing downstream — runs the one-call fused
                # train kernel (fwd + in-kernel photometric cotangent + bwd
                # at K=intvs+intvs_fine). EVAL always stays on the SoA field
                # kernel + XLA compositing: the forward-only composited
                # kernel at K=192 measured 3.6x SLOWER than the SoA path
                # on-device (45.0 vs 12.5 ms per 1024-ray render, tools/
                # check_fine_eval_fused.py, 2026-08-19) — the train kernel
                # amortizes its start cost over the fused backward, a
                # forward-only call does not.
                from ..ops.pallas import fused_pe
                if fused_pe.supports(self.arch, opt.nerf,
                                     sample_intvs=depth_all.shape[2]):
                    out_f, sq_f, n_f = fused_pe.fused_render_rays_pe_train(
                        params["nerf_fine"], self.arch, center, ray,
                        depth_all, target, progress=progress,
                        barf_c2f=tuple(opt.barf_c2f) if opt.get("barf_c2f")
                        else None,
                        setbg_opaque=bool(opt.nerf.get("setbg_opaque")),
                        bgcolor=opt.data.get("bgcolor"),
                        compute_dtype=self._kernel_compute_dtype(),
                        density_activ=self.arch.get("density_activ",
                                                    "softplus"),
                        density_noise_reg=(opt.nerf.get("density_noise_reg")
                                           if noise_active else None),
                        noise_key=jax.random.fold_in(k_noise, 1))
                    out.update(rgb_fine=out_f["rgb"],
                               depth_fine=out_f["depth"],
                               opacity_fine=out_f["opacity"],
                               render_fine_sq_sum=sq_f, render_fine_n=n_f)
                    return out
            rgb_f, d_f, opac_f, _ = self._field_composite(
                params["nerf_fine"], center, ray, depth_all,
                dict(common, noise_key=jax.random.fold_in(k_noise, 1)))
            out.update(rgb_fine=rgb_f, depth_fine=d_f, opacity_fine=opac_f)
        return out

    def _field_composite(self, field_params, center, ray, depth, common):
        """Field eval + alpha compositing. On the PE-fused kernel path the
        channels stay separated ([B,R,K] each, lane-dense) through
        ``render.composite_soa`` — the AoS [B,R,K,3]/[N,4] shapes put the
        channel axis on the 128-lane minor dim, whose tile padding made the
        compositing glue ~1.9 ms/step at the bench shape (r3 profile).

        Returns (rgb [B,R,3], depth [B,R,1], opacity [B,R,1], prob [B,R,N]).
        """
        opt = self.opt
        bg = dict(setbg_opaque=bool(opt.nerf.get("setbg_opaque")),
                  bgcolor=opt.data.get("bgcolor"))
        if self._use_fused_field() == "pe":
            from ..ops.pallas import fused_pe
            if fused_pe.supports(self.arch, opt.nerf,
                                 sample_intvs=depth.shape[2]):
                # density_noise_reg rides into the kernel as an operand (r4)
                chans, dens = fused_pe.fused_apply_nerf_samples_pe_soa(
                    field_params, self.arch, center, ray, depth,
                    compute_dtype=self._kernel_compute_dtype(), **common)
                return render.composite_soa(ray, chans, dens, depth, **bg)
        rgb_s, dens = self.apply_field_samples(
            field_params, center, ray, depth, **common)
        rgb, d, opac, prob = render.composite(ray, rgb_s, dens, depth, **bg)
        return rgb, d, opac, prob[..., 0]

    # ---------------------------------------------------------------- losses

    def compute_loss(self, params, aux, data, out, target, step, extras):
        """Loss dict; models may also record per-step readouts into ``extras``
        (picked up by ``update_aux``)."""
        if "render_sq_sum" in out:
            # fused train kernel already computed the squared error with the
            # exact same compositing math; mean = sq_sum / (B*R*3)
            losses = {"render": out["render_sq_sum"] / out["render_n"]}
        else:
            losses = {"render": jnp.mean((out["rgb"] - target) ** 2)}
        if self.opt.loss_weight.get("render_fine") is not None:
            if "render_fine_sq_sum" in out:
                losses["render_fine"] = (out["render_fine_sq_sum"]
                                         / out["render_fine_n"])
            else:
                losses["render_fine"] = jnp.mean((out["rgb_fine"] - target) ** 2)
        return losses

    def summarize_loss(self, losses):
        """total = sum 10^w_k * L_k (reference model/base.py:130-142)."""
        total = 0.0
        for k, l in losses.items():
            w = self.opt.loss_weight.get(k)
            if w is not None:
                total = total + (10.0 ** float(w)) * l
        return total

    # ------------------------------------------------------------ train step

    def _forward_train(self, params, aux, data, ray_idx, key, step):
        """One training forward pass over the sampled rays; returns (out, target, extras).

        bug-for-bug parity (SURVEY Q7): ONE ray_idx draw is shared by every
        training image — the reference samples the same pixel indices across
        all B images each step (model/nerf.py:258, one randperm for the whole
        batch), not an independent subset per image. Keep it that way.
        """
        opt = self.opt
        pose = self.get_train_pose(params, aux, data)
        center, ray = rays.get_center_and_ray(pose, data["intr"], H=self.H,
                                              W=self.W, ray_idx=ray_idx)
        center = mesh_lib.shard_batch_rays(center)
        ray = mesh_lib.shard_batch_rays(ray)
        progress = step.astype(jnp.float32) / opt.max_iter
        target = mesh_lib.shard_batch_rays(data["pixels"][:, ray_idx])
        out = self.render_rays(params, center, ray, key, mode="train",
                               progress=progress, intr=data["intr"],
                               target=target)
        return out, target, {}

    def update_aux(self, aux, extras, step):
        return aux

    def make_train_step(self):
        opt = self.opt
        n_rays = opt.nerf.rand_rays // self.n_train

        def step_fn(state, data, key):
            step = state["step"]
            if key.ndim == 2:   # pre-split [3,2] (see train_multi_step)
                k_perm = key[0]
                k_render = key[1:]          # [2,2] consumed by render_rays
            else:
                k_perm, k_render = jax.random.split(key)
            # one global distinct-uniform ray draw (tpu.ray_sample), then
            # constrained onto the mesh: the ray batch (not the images) is
            # the sharded axis (SURVEY.md §2.4)
            ray_idx = mesh_lib.shard_rays(sampling.sample_ray_subset(
                k_perm, self.HW, n_rays,
                mode=(opt.get("tpu") or {}).get("ray_sample", "topk")))

            def loss_fn(params):
                out, target, extras = self._forward_train(
                    params, state["aux"], data, ray_idx, k_render, step)
                losses = self.compute_loss(params, state["aux"], data, out,
                                           target, step, extras)
                return self.summarize_loss(losses), (losses, extras)

            (total, (losses, extras)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"])
            updates, opt_state = self.tx.update(grads, state["opt_state"],
                                                state["params"])
            params = optax.apply_updates(state["params"], updates)
            aux = self.update_aux(state["aux"], extras, step)
            metrics = {"loss_" + k: v for k, v in losses.items()}
            metrics["loss_all"] = total
            metrics["psnr"] = -10.0 * jnp.log10(losses["render"])
            # scalar diagnostics recorded by the model (e.g. DTU depth errors)
            metrics.update({k: v for k, v in extras.items()
                            if hasattr(v, "ndim") and v.ndim == 0})
            return dict(params=params, opt_state=opt_state, step=step + 1,
                        aux=aux), metrics

        return step_fn

    def train_step(self, state, key):
        if self._train_step_jit is None:
            self._train_step_jit = jax.jit(self.make_train_step())
        return self._train_step_jit(state, self.train_data, key)

    def train_multi_step(self, state, keys):
        """Run len(keys) steps in ONE dispatch (lax.scan over the step body).

        Amortizes host->device dispatch latency — the per-step pytree transfer
        through the runtime otherwise dominates at this model scale. Returns
        (state, metrics-of-last-step).
        """
        if getattr(self, "_train_scan_jit", None) is None:
            step_fn = self.make_train_step()

            def scan_fn(state, data, keys):
                # pre-split every step's key chain in ONE batched threefry
                # (k_perm; k_depth; k_noise) — bit-identical to the in-body
                # split(key) -> split(k_render) chain, ~165 us/step cheaper
                def presplit(k):
                    k_perm, k_render = jax.random.split(k)
                    return jnp.concatenate(
                        [k_perm[None], jax.random.split(k_render)], axis=0)
                keys = jax.vmap(presplit)(keys)          # [spc,3,2]

                def body(carry, k):
                    new_state, metrics = step_fn(carry, data, k)
                    # pack the per-step scalars into ONE vector: scan stacks
                    # each output leaf with its own dynamic_update_slice per
                    # iteration, and ~10 scalar dus ops cost ~0.27 ms/step on
                    # TPU (profiled) vs one [M]-vector dus
                    names = sorted(metrics)
                    self._scan_metric_names = names   # static at trace time
                    return new_state, jnp.stack([metrics[n] for n in names])
                state, stacked = jax.lax.scan(body, state, keys)
                return state, stacked[-1]

            self._train_scan_jit = jax.jit(scan_fn)
        state, last = self._train_scan_jit(state, self.train_data, keys)
        return state, dict(zip(self._scan_metric_names, last))

    # ----------------------------------------------------------- eval render

    def make_render_image(self):
        """Full-image renderer: lax.map over ray chunks (static shapes).

        Under an active device mesh each chunk's ray axis is additionally
        sharded across chips (SURVEY.md §2.4: eval images sharded by rays,
        assembled by the output all_gather GSPMD inserts for the replicated
        result) — the serial chunk loop bounds per-chip memory while the
        in-chunk shard uses every chip.
        """
        opt = self.opt
        chunk = min(opt.nerf.rand_rays, self.HW)
        n_chunks = -(-self.HW // chunk)
        padded = n_chunks * chunk

        def render_one(params, aux, pose, intr, progress):
            idx_all = jnp.arange(padded) % self.HW
            idx_chunks = idx_all.reshape(n_chunks, chunk)

            def body(ray_idx):
                center, ray = rays.get_center_and_ray(
                    pose, intr, H=self.H, W=self.W, ray_idx=ray_idx)
                center = mesh_lib.shard_batch_rays(center)
                ray = mesh_lib.shard_batch_rays(ray)
                out = self.render_rays(params, center, ray,
                                       jax.random.PRNGKey(0), mode="eval",
                                       progress=progress, intr=intr)
                keep = ("rgb", "depth", "opacity", "rgb_fine", "depth_fine",
                        "opacity_fine")
                return {k: v for k, v in out.items() if k in keep}

            outs = jax.lax.map(body, idx_chunks)
            # [n_chunks, 1, chunk, C] -> [1, HW, C]; replicate so the host
            # reads one assembled image (the all_gather happens here)
            return {k: mesh_lib.replicate(
                        v.swapaxes(0, 1).reshape(v.shape[1], padded, -1)
                        [:, :self.HW])
                    for k, v in outs.items()}

        return render_one

    def render_image(self, params, aux, pose, intr, progress=1.0):
        if self._render_image_jit is None:
            self._render_image_jit = jax.jit(self.make_render_image())
        return self._render_image_jit(params, aux, pose, intr,
                                      jnp.float32(progress))

    # ------------------------------------------------------------ validation

    def get_all_training_poses(self, state):
        """(pose_pred or None, pose_GT) on host (reference model/nerf.py:156-160)."""
        return None, np.asarray(self.train_data["pose"])

    def prealign(self, state):
        """Hook: pose-optimizing models compute the val-time sim3 here."""
        return None

    def validate(self, state, max_views=None):
        """Render held-out views, return PSNR and mean losses."""
        self.prealign(state)
        data = self.test_data
        n = int(data["image"].shape[0])
        if max_views:
            n = min(n, max_views)
        progress = float(state["step"]) / self.opt.max_iter
        # number of views to keep for TB image grids (reference tb.num_images
        # [rows, cols], options/base.yaml:50 / util_vis.py:34-51)
        n_vis = 1
        tb_cfg = self.opt.get("tb")
        if tb_cfg and tb_cfg.get("num_images"):
            r, c = tb_cfg.num_images
            n_vis = int(r) * int(c)
        psnrs = []
        vis_all = []
        for i in range(n):
            pose_GT = data["pose"][i:i + 1]
            pose = self.get_eval_pose(state["params"], state["aux"], pose_GT)
            out = self.render_image(state["params"], state["aux"], pose,
                                    data["intr"][i:i + 1], progress)
            key = "rgb_fine" if "rgb_fine" in out else "rgb"
            mse = float(jnp.mean((out[key] - data["pixels"][i:i + 1]) ** 2))
            psnrs.append(-10.0 * np.log10(mse))
            if len(vis_all) < n_vis:
                vis_all.append({k: np.asarray(v) for k, v in out.items()})
        return dict(psnr_val=float(np.mean(psnrs)), vis=vis_all[0],
                    vis_all=vis_all)


# ---------------------------------------------------------------------------
# Full evaluation (the reference's missing evaluate.py calls into this;
# reference model/nerf.py:163-198 / model/barf.py:134-151)
# ---------------------------------------------------------------------------

def _save_png(path, arr):
    import imageio.v2 as imageio
    arr = np.clip(np.asarray(arr), 0.0, 1.0)
    imageio.imwrite(path, (arr * 255).astype(np.uint8))


class EvalMixin:
    """evaluate_full for any system; mixed into NerfSystem below."""

    def evaluate_full(self, state, output_path=None, dump_images=True,
                      test_optim=None):
        import os
        from ..ops import lpips as lpips_mod
        from ..ops import ssim as ssim_mod

        opt = self.opt
        self.prealign(state)
        if output_path is None:
            output_path = opt.output_path
        test_path = os.path.join(output_path, "test_view")
        if dump_images:
            os.makedirs(test_path, exist_ok=True)

        # pose error (pose-optimizing models only)
        results = {}
        if hasattr(self, "evaluate_camera_alignment"):
            R_err, t_err = self.evaluate_camera_alignment(state)
            results["rot_error_deg"] = float(np.rad2deg(np.mean(R_err)))
            results["trans_error"] = float(np.mean(t_err))
            with open(os.path.join(output_path, "quant_pose.txt"), "w") as f:
                for i, (r, t) in enumerate(zip(R_err, t_err)):
                    f.write("{} {} {}\n".format(i, float(r), float(t)))

        if test_optim is None:
            test_optim = bool(opt.optim.get("test_photo")) and \
                hasattr(self, "test_time_optimized_pose")

        lpips_ok = lpips_mod.available()
        if not lpips_ok:
            log.warn("LPIPS unavailable: no AlexNet-LPIPS weights found; "
                     "set {}=<npz> (see tools/convert_lpips_weights.py). "
                     "quant.txt will record 'unavailable'."
                     .format(lpips_mod.WEIGHTS_ENV))

        data = self.test_data
        n = int(data["image"].shape[0])
        progress = float(state["step"]) / opt.max_iter
        rows = []
        for i in range(n):
            pose_GT = data["pose"][i:i + 1]
            intr = data["intr"][i:i + 1]
            pose = self.get_eval_pose(state["params"], state["aux"], pose_GT)
            if test_optim:
                pose = self.test_time_optimized_pose(
                    state, pose, intr, data["pixels"][i:i + 1],
                    jax.random.PRNGKey(1000 + i), progress)
            out = self.render_image(state["params"], state["aux"], pose, intr,
                                    progress)
            key = "rgb_fine" if "rgb_fine" in out else "rgb"
            pred = np.asarray(out[key]).reshape(self.H, self.W, 3)
            gt = np.asarray(data["image"][i])
            mse = float(np.mean((pred - gt) ** 2))
            psnr = -10.0 * np.log10(mse)
            pred_t = jnp.asarray(pred).transpose(2, 0, 1)[None]
            gt_t = jnp.asarray(gt).transpose(2, 0, 1)[None]
            ssim_v = float(ssim_mod.ssim(pred_t, gt_t))
            lpips_v = lpips_mod.lpips(pred_t * 2 - 1, gt_t * 2 - 1) \
                if lpips_ok else None
            rows.append((psnr, ssim_v, lpips_v))
            if dump_images:
                depth_key = "depth_fine" if "depth_fine" in out else "depth"
                opac_key = "opacity_fine" if "opacity_fine" in out else "opacity"
                from ..ops.render import invdepth_map
                inv = np.asarray(invdepth_map(
                    jnp.asarray(out[depth_key]), jnp.asarray(out[opac_key]),
                    ndc=bool(opt.camera.ndc))).reshape(self.H, self.W)
                _save_png(os.path.join(test_path, "rgb_{}.png".format(i)), pred)
                _save_png(os.path.join(test_path, "rgb_GT_{}.png".format(i)), gt)
                _save_png(os.path.join(test_path, "depth_{}.png".format(i)),
                          inv / max(inv.max(), 1e-8))
        results["PSNR"] = float(np.mean([r[0] for r in rows]))
        results["SSIM"] = float(np.mean([r[1] for r in rows]))
        results["LPIPS"] = float(np.mean([r[2] for r in rows])) \
            if lpips_ok else None
        lpips_str = "{:.4f}".format(results["LPIPS"]) if lpips_ok \
            else "unavailable"
        with open(os.path.join(output_path, "quant.txt"), "w") as f:
            for i, (p, s, l) in enumerate(rows):
                f.write("{} {} {} {}\n".format(
                    i, p, s, l if l is not None else "unavailable"))
        log.info("PSNR {:.2f} | SSIM {:.3f} | LPIPS {}".format(
            results["PSNR"], results["SSIM"], lpips_str))
        return results


NerfSystem.evaluate_full = EvalMixin.evaluate_full
