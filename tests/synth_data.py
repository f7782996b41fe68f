"""Synthetic on-disk datasets in the exact reference formats, for tests/bench.

The scenes are procedurally generated but written as real ``poses_bounds.npy``
/ ``transforms_*.json`` files so the loaders exercise the true parsing paths.
"""

import json
import os

import numpy as np
import imageio.v2 as imageio

from neural_invertible_warp_tpu.dotdict import DotDict


def look_at_c2w(eye, target=(0, 0, 0), up=(0, 1, 0)):
    """OpenGL-style camera-to-world matrix (camera looks down -z)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = eye - target  # OpenGL: camera z points backwards
    fwd /= np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    R = np.stack([right, true_up, fwd], axis=1)
    return np.concatenate([R, eye[:, None]], axis=1).astype(np.float32)  # [3,4]


def _toy_image(H, W, seed, rgba=False):
    """A smooth procedural image (distinct per seed)."""
    r = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([
        0.5 + 0.5 * np.sin(xx / W * (3 + seed % 3) + r.rand() * 6),
        0.5 + 0.5 * np.cos(yy / H * (2 + seed % 4) + r.rand() * 6),
        0.5 + 0.5 * np.sin((xx + yy) / (H + W) * 5 + r.rand() * 6),
    ], axis=-1)
    img8 = (img * 255).astype(np.uint8)
    if rgba:
        alpha = np.full((H, W, 1), 255, np.uint8)
        img8 = np.concatenate([img8, alpha], axis=-1)
    return img8


def make_blender_scene(root, scene="toy", n_train=6, n_val=2, n_test=2,
                       img_size=40, radius=4.0, seed=0):
    """Write a blender-format scene; returns its camera_angle_x."""
    rng = np.random.RandomState(seed)
    path = os.path.join(root, scene)
    os.makedirs(path, exist_ok=True)
    camera_angle_x = 0.8
    counts = dict(train=n_train, val=n_val, test=n_test)
    for split, n in counts.items():
        frames = []
        os.makedirs(os.path.join(path, split), exist_ok=True)
        for i in range(n):
            theta = rng.rand() * 2 * np.pi
            phi = 0.3 + rng.rand() * 0.5
            eye = radius * np.array([
                np.cos(theta) * np.cos(phi),
                np.sin(phi),
                np.sin(theta) * np.cos(phi)])
            c2w = look_at_c2w(eye)
            mat = np.concatenate([c2w, [[0, 0, 0, 1]]], axis=0)
            fp = "./{}/r_{}".format(split, i)
            imageio.imwrite(os.path.join(path, split, "r_{}.png".format(i)),
                            _toy_image(img_size, img_size, seed * 100 + i, rgba=True))
            frames.append(dict(file_path=fp, transform_matrix=mat.tolist()))
        with open(os.path.join(path, "transforms_{}.json".format(split)), "w") as f:
            json.dump(dict(camera_angle_x=camera_angle_x, frames=frames), f)
    return camera_angle_x


def make_llff_scene(root, scene="toyfern", n_images=8, img_size=(48, 64), seed=0):
    """Write an llff-format scene (poses_bounds.npy + images/)."""
    rng = np.random.RandomState(seed)
    path = os.path.join(root, scene)
    img_dir = os.path.join(path, "images")
    os.makedirs(img_dir, exist_ok=True)
    raw_H, raw_W, focal = 3024.0, 4032.0, 3260.0
    rows = []
    for i in range(n_images):
        # forward-facing cluster of c2w poses ([down,right,back] raw convention)
        eye = np.array([0.1 * rng.randn(), 0.1 * rng.randn(), 4.0 + 0.2 * rng.randn()])
        c2w = look_at_c2w(eye, target=(0.05 * rng.randn(), 0.05 * rng.randn(), 0))
        # invert the loader's axis swap so parse recovers c2w-like matrices:
        # loader does new0 = old1, new1 = -old0  =>  old0 = -new1, old1 = new0
        raw = c2w.copy()
        raw[..., 0], raw[..., 1] = -c2w[..., 1], c2w[..., 0]
        hwf = np.array([raw_H, raw_W, focal], np.float32)[:, None]
        row = np.concatenate([np.concatenate([raw, hwf], axis=1).reshape(-1),
                              np.array([2.0 + rng.rand() * 0.1, 8.0])])
        rows.append(row)
        imageio.imwrite(os.path.join(img_dir, "img_{:03d}.png".format(i)),
                        _toy_image(img_size[0], img_size[1], seed * 100 + i))
    np.save(os.path.join(path, "poses_bounds.npy"), np.stack(rows))
    return path


def blender_opt(root, H=40, W=40, scene="toy", bgcolor=1):
    return DotDict(dict(
        H=H, W=W,
        data=dict(root=root, dataset="blender", scene=scene, image_size=[H, W],
                  num_workers=2, preload=True, bgcolor=bgcolor, augment={},
                  center_crop=None, val_on_test=False, train_sub=None, val_sub=None),
    ))


def llff_opt(root, H=24, W=32, scene="toyfern"):
    return DotDict(dict(
        H=H, W=W,
        data=dict(root=root, dataset="llff", scene=scene, image_size=[H, W],
                  num_workers=2, preload=True, val_ratio=0.25, augment={},
                  center_crop=None, val_on_test=False, train_sub=None, val_sub=None),
    ))


# ---------------------------------------------------------------------------
# View-consistent synthetic scene (analytic radiance field) for e2e tests
# ---------------------------------------------------------------------------

def analytic_render(pose_w2c, intr, H, W, n_samples=96, depth_range=(2.0, 6.0),
                    bgcolor=1.0, scene_kind="fog"):
    """Render an analytic scene from w2c poses. Returns [B,H,W,3].

    scene_kind:
      "fog"          — space-filling textured medium (good for reconstruction
                       tests; degenerate for pose recovery: cameras can carve
                       disjoint regions);
      "sphere_shell" — textured ball at the origin inside a textured enclosing
                       shell (bounded content, no empty escape region — the
                       right testbed for pose optimization).
    """
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.ops import rays, render, sampling
    import jax

    pose_w2c = jnp.asarray(pose_w2c)
    intr = jnp.asarray(intr)
    center, ray = rays.get_center_and_ray(pose_w2c, intr, H=H, W=W)
    depth = sampling.sample_depth(jax.random.PRNGKey(0), pose_w2c.shape[0],
                                  H * W, n_samples, depth_range,
                                  stratified=False)
    pts = center[..., None, :] + ray[..., None, :] * depth       # [B,HW,K,3]
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    if scene_kind == "fog":
        # space-filling textured medium: every ray sees signal everywhere, so
        # the toy problem has no "cameras escape to empty background" optimum
        sigma = 1.5 + 1.4 * jnp.sin(2.1 * x) * jnp.sin(1.7 * y) * jnp.sin(1.9 * z)
    else:
        r = jnp.sqrt(jnp.sum(pts ** 2, axis=-1))
        sigma = (25.0 * jax.nn.sigmoid(20.0 * (1.0 - r ** 2)) +
                 25.0 * jax.nn.sigmoid(6.0 * (0.5 - (r - 5.5) ** 2)))
    rgb = 0.5 + 0.5 * jnp.sin(4.0 * pts)                          # textured colors
    out_rgb, _, opac, _ = render.composite(ray, rgb, sigma, depth)
    out_rgb = out_rgb + bgcolor * (1 - opac)
    B = pose_w2c.shape[0]
    return np.asarray(out_rgb).reshape(B, H, W, 3)


def make_consistent_blender_scene(root, scene="sphere", n_train=6, n_val=2,
                                  n_test=2, img_size=40, seed=0,
                                  scene_kind="fog", depth_range=(2.0, 6.0)):
    """Blender-format scene whose images are true renders of one 3D scene."""
    from neural_invertible_warp_tpu.data import blender as blender_data

    make_blender_scene(root, scene=scene, n_train=n_train, n_val=n_val,
                       n_test=n_test, img_size=img_size, seed=seed)
    opt = blender_opt(root, H=img_size, W=img_size, scene=scene)
    for split in ("train", "val", "test"):
        ds = blender_data.Dataset(opt, split=split)
        arrays = ds.all_arrays(opt)
        imgs = analytic_render(arrays["pose"], arrays["intr"], img_size,
                               img_size, scene_kind=scene_kind,
                               depth_range=depth_range)
        for i in range(len(ds)):
            rgba = np.concatenate([
                (imgs[i] * 255).astype(np.uint8),
                np.full((img_size, img_size, 1), 255, np.uint8)], axis=-1)
            imageio.imwrite(
                os.path.join(root, scene, split, "r_{}.png".format(i)), rgba)
    return opt


def make_consistent_llff_scene(root, scene="toyfern", n_images=6,
                               img_size=(32, 32), seed=0):
    """LLFF-format scene whose images are true renders of one 3D scene
    (rendered from the loader-parsed w2c poses, so everything is consistent
    with the LLFF world frame after centering/rescale)."""
    from neural_invertible_warp_tpu.data import llff as llff_data

    make_llff_scene(root, scene=scene, n_images=n_images, img_size=img_size,
                    seed=seed)
    H, W = img_size
    opt = llff_opt(root, H=H, W=W, scene=scene)
    ds_all = llff_data.Dataset(opt, split="train")
    # render every image (train + val): rebuild the full list
    ds_val = llff_data.Dataset(opt, split="val")
    for ds in (ds_all, ds_val):
        arrays = ds.all_arrays(opt)
        imgs = analytic_render(arrays["pose"], arrays["intr"], H, W,
                               depth_range=(1.0, 6.0))
        for i in range(len(ds)):
            fname = os.path.join(root, scene, "images", ds.list[i][0])
            imageio.imwrite(fname, (imgs[i] * 255).astype(np.uint8))
    return opt


# ---------------------------------------------------------------------------
# Band-limited Gaussian-blob scenes (round-2 joint pose+field recovery runs)
#
# The round-1 procedural textures (sin products) alias at the rendered
# resolution and destroy the smooth photometric gradients BARF-style pose
# optimization needs (VERDICT.md Weak #2). These scenes are bounded and
# band-limited: a set of soft Gaussian density blobs with smooth per-blob
# colors — the BARF-friendly testbed the paper's behavior can be shown on.
# ---------------------------------------------------------------------------

def blob_params(seed=0, n_blobs=24, radius=1.1, center=(0.0, 0.0, 0.0),
                axis_scale=(1.0, 1.0, 1.0), s_range=(0.16, 0.38)):
    """Random bounded blob-field parameters (numpy, reproducible)."""
    r = np.random.RandomState(seed)
    v = r.randn(n_blobs, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    rad = radius * r.rand(n_blobs) ** (1.0 / 3.0)
    mu = v * rad[:, None] * np.asarray(axis_scale) + np.asarray(center)
    s = s_range[0] + (s_range[1] - s_range[0]) * r.rand(n_blobs)
    a = 25.0 + 35.0 * r.rand(n_blobs)
    c = 0.06 + 0.88 * r.rand(n_blobs, 3)
    return dict(mu=mu.astype(np.float32), s=s.astype(np.float32),
                a=a.astype(np.float32), c=c.astype(np.float32))


def backdrop_params(point, normal, seed=0):
    """A band-limited textured wall (plane) giving every pixel view-consistent
    content — real LLFF frames are full-frame textured, and without this the
    empty background lets joint pose+field optimization fall into the
    'every camera its own region' degenerate gauge (EVIDENCE_r2 run B)."""
    r = np.random.RandomState(seed)
    n = np.asarray(normal, np.float64)
    n = n / np.linalg.norm(n)
    u = np.cross(n, [0.0, 1.0, 0.1])
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    # low-frequency color field: 3 octaves, max ~4 rad/unit (band-limited)
    freqs = np.stack([r.uniform(0.8, 4.0, (3, 2)) for _ in range(3)])  # [3,3,2]
    phases = r.uniform(0, 2 * np.pi, (3, 3))
    amps = np.array([0.25, 0.15, 0.08])
    return dict(point=np.asarray(point, np.float32),
                normal=n.astype(np.float32), u=u.astype(np.float32),
                v=v.astype(np.float32), freqs=freqs.astype(np.float32),
                phases=phases.astype(np.float32), amps=amps.astype(np.float32))


def analytic_blob_render(pose_w2c, intr, H, W, blob, n_samples=192,
                         depth_range=(2.0, 6.0), bgcolor=1.0, backdrop=None,
                         return_depth=False):
    """Render the blob field from w2c poses. Returns [B,H,W,3] numpy.

    With ``backdrop`` (backdrop_params dict), rays that miss the blobs hit a
    textured wall instead of the flat background color.

    With ``return_depth``, returns (rgb, depth, opacity) where depth is the
    expected ray parameter (= camera z-depth, since the pixel grid lives on
    the z=1 plane) including the backdrop hit, and opacity is the blob-field
    alpha (the foreground mask signal for DTU-style scenes)."""
    import jax
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.ops import rays, render, sampling

    mu = jnp.asarray(blob["mu"])
    s = jnp.asarray(blob["s"])
    a = jnp.asarray(blob["a"])
    c = jnp.asarray(blob["c"])

    @jax.jit
    def render_one(pose, K):
        center, ray = rays.get_center_and_ray(pose[None], K[None], H=H, W=W)
        depth = sampling.sample_depth(jax.random.PRNGKey(0), 1, H * W,
                                      n_samples, depth_range, stratified=False)
        pts = center[..., None, :] + ray[..., None, :] * depth   # [1,HW,K,3]
        d2 = jnp.sum((pts[..., None, :] - mu) ** 2, axis=-1)     # [1,HW,K,NB]
        w_raw = jnp.exp(-0.5 * d2 / s ** 2)
        # truncate tails at 3-sigma (smoothly) so the blobs stay compact:
        # without this, 20+ Gaussian tails sum into a space-filling fog
        w_cut = float(np.exp(-4.5))
        w = a * jnp.maximum(w_raw - w_cut, 0.0) / (1.0 - w_cut)
        sigma = jnp.sum(w, axis=-1)
        wc = w_raw + 1e-8
        rgb = jnp.sum(wc[..., None] * c, axis=-2) / jnp.sum(wc, -1)[..., None]
        if "tex" in blob:
            # 3-D color texture on the blob bodies (corner-rich surface
            # detail for matcher tests; without it blob matches are
            # texture-free and all correspondences come from the coplanar
            # backdrop -> planar-degenerate two-view geometry)
            fx, fy, fz = (float(v) for v in blob["tex"]["freq"])
            amp = float(blob["tex"]["amp"])
            mod = 1.0 + amp * jnp.sin(fx * pts[..., 0]) \
                * jnp.sin(fy * pts[..., 1] + 1.3) \
                * jnp.sin(fz * pts[..., 2] + 2.1)
            rgb = rgb * mod[..., None]
        out_rgb, out_d, opac, _ = render.composite(ray, rgb, sigma, depth)
        if backdrop is None:
            rgb_final = out_rgb + bgcolor * (1 - opac)
            if return_depth:
                d = out_d + depth_range[1] * (1 - opac)
                return rgb_final, d, opac
            return rgb_final
        # ray-plane intersection: x = center + t*ray with (x-p).n = 0
        p = jnp.asarray(backdrop["point"])
        nrm = jnp.asarray(backdrop["normal"])
        uax = jnp.asarray(backdrop["u"])
        vax = jnp.asarray(backdrop["v"])
        denom = jnp.sum(ray * nrm, axis=-1)
        t = jnp.sum((p - center) * nrm, axis=-1) / jnp.where(
            jnp.abs(denom) < 1e-6, 1e-6, denom)
        hit = center + t[..., None] * ray
        uu = jnp.sum((hit - p) * uax, axis=-1)
        vv = jnp.sum((hit - p) * vax, axis=-1)
        col = 0.5 * jnp.ones(uu.shape + (3,))
        for o in range(3):
            f = jnp.asarray(backdrop["freqs"][o])       # [3,2]
            ph = jnp.asarray(backdrop["phases"][o])     # [3]
            amp = float(backdrop["amps"][o])
            col = col + amp * jnp.sin(uu[..., None] * f[:, 0]
                                      + vv[..., None] * f[:, 1] + ph)
        if "spot_uv" in backdrop:
            # 2-D corner-rich texture: Gaussian color spots on the wall
            # (sinusoid stripes alone are 1-D texture — a patch matcher
            # slides along them, the aperture problem)
            suv = jnp.asarray(backdrop["spot_uv"])      # [K,2]
            ss = jnp.asarray(backdrop["spot_s"])        # [K]
            sc = jnp.asarray(backdrop["spot_c"])        # [K,3]
            d2s = (uu[..., None] - suv[:, 0]) ** 2 \
                + (vv[..., None] - suv[:, 1]) ** 2      # [...,K]
            wspot = jnp.exp(-0.5 * d2s / ss ** 2)
            col = col + jnp.sum(wspot[..., None] * sc, axis=-2)
        col = jnp.clip(col, 0.02, 0.98)
        rgb_final = out_rgb + col * (1 - opac)
        if return_depth:
            d = out_d + t[..., None] * (1 - opac)
            return rgb_final, d, opac
        return rgb_final

    pose_w2c = np.asarray(pose_w2c, np.float32)
    intr = np.asarray(intr, np.float32)
    if return_depth:
        rgbs, depths, opacs = [], [], []
        for i in range(pose_w2c.shape[0]):
            r, d, o = render_one(jnp.asarray(pose_w2c[i]), jnp.asarray(intr[i]))
            rgbs.append(np.asarray(r).reshape(H, W, 3))
            depths.append(np.asarray(d).reshape(H, W))
            opacs.append(np.asarray(o).reshape(H, W))
        return np.stack(rgbs), np.stack(depths), np.stack(opacs)
    out = [np.asarray(render_one(jnp.asarray(pose_w2c[i]),
                                 jnp.asarray(intr[i]))).reshape(H, W, 3)
           for i in range(pose_w2c.shape[0])]
    return np.stack(out)


def make_blob_blender_scene(root, scene="blobs", n_train=100, n_val=4,
                            n_test=4, img_size=128, seed=0, n_blobs=24,
                            radius=1.2, depth_range=(2.0, 6.0),
                            s_range=(0.16, 0.38)):
    """Blender-format scene: cameras on the r=4 sphere, blob ball at origin.

    A DENSE ball (n_blobs >~ 150, wider s_range) approximates a solid
    textured object like the NeRF-synthetic scenes — needed for INN-warp
    recovery probes: the sparse default leaves most of space empty, which
    is the 'every camera its own region' degenerate gauge of EVIDENCE_r2
    run B2."""
    from neural_invertible_warp_tpu.data import blender as blender_data

    make_blender_scene(root, scene=scene, n_train=n_train, n_val=n_val,
                       n_test=n_test, img_size=img_size, seed=seed)
    blob = blob_params(seed=seed + 7, n_blobs=n_blobs, radius=radius,
                       s_range=s_range)
    opt = blender_opt(root, H=img_size, W=img_size, scene=scene)
    for split in ("train", "val", "test"):
        ds = blender_data.Dataset(opt, split=split)
        arrays = ds.all_arrays(opt)
        imgs = analytic_blob_render(arrays["pose"], arrays["intr"], img_size,
                                    img_size, blob, depth_range=depth_range)
        for i in range(len(ds)):
            rgba = np.concatenate([
                (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8),
                np.full((img_size, img_size, 1), 255, np.uint8)], axis=-1)
            imageio.imwrite(
                os.path.join(root, scene, split, "r_{}.png".format(i)), rgba)
    return opt, blob


def make_wide_llff_scene(root, scene="blobfern", n_images=40,
                         img_size=(240, 320), seed=0, spread=0.5):
    """LLFF-format poses_bounds with a WIDER forward-facing camera cluster
    (so identity pose init has a meaningfully large error to recover)."""
    rng = np.random.RandomState(seed)
    path = os.path.join(root, scene)
    img_dir = os.path.join(path, "images")
    os.makedirs(img_dir, exist_ok=True)
    raw_H, raw_W, focal = 3024.0, 4032.0, 3260.0
    rows = []
    for i in range(n_images):
        eye = np.array([spread * rng.randn(), spread * rng.randn(),
                        4.0 + 0.6 * spread * rng.randn()])
        c2w = look_at_c2w(eye, target=(0.3 * spread * rng.randn(),
                                       0.3 * spread * rng.randn(), 0))
        raw = c2w.copy()
        raw[..., 0], raw[..., 1] = -c2w[..., 1], c2w[..., 0]
        hwf = np.array([raw_H, raw_W, focal], np.float32)[:, None]
        row = np.concatenate([np.concatenate([raw, hwf], axis=1).reshape(-1),
                              np.array([2.0 + rng.rand() * 0.1, 8.0])])
        rows.append(row)
        imageio.imwrite(os.path.join(img_dir, "img_{:03d}.png".format(i)),
                        _toy_image(img_size[0], img_size[1], seed * 100 + i))
    np.save(os.path.join(path, "poses_bounds.npy"), np.stack(rows))
    return path


def make_blob_llff_scene(root, scene="blobfern", n_images=40,
                         img_size=(240, 320), seed=0, spread=0.5,
                         n_blobs=24, val_ratio=0.1, backdrop=False,
                         dense=False):
    """LLFF-format blob scene rendered from the loader-parsed poses.

    The blob slab is placed in the PARSED world frame (after the loader's
    centering + bounds rescale) at the mean look-at point of the cameras, so
    content placement is robust to the LLFF pose conventions.
    """
    from neural_invertible_warp_tpu.data import llff as llff_data

    make_wide_llff_scene(root, scene=scene, n_images=n_images,
                         img_size=img_size, seed=seed, spread=spread)
    H, W = img_size
    opt = llff_opt(root, H=H, W=W, scene=scene)
    opt.data.val_ratio = val_ratio
    ds_train = llff_data.Dataset(opt, split="train")
    arrays = ds_train.all_arrays(opt)
    pose = np.asarray(arrays["pose"])                       # w2c [B,3,4]
    R, t = pose[:, :, :3], pose[:, :, 3]
    centers = -np.einsum("bij,bi->bj", R, t)                # c2w centers
    look = R[:, 2, :]                                       # c2w z-axis rows
    # triangulate the common look-at point: least-squares intersection of the
    # view axes (the centered origin is the mean CAMERA position, so camera
    # distance from the origin says nothing about where the content is)
    P = np.eye(3)[None] - look[:, :, None] * look[:, None, :]
    A = P.sum(0) + 1e-4 * np.eye(3)
    b = np.einsum("bij,bj->i", P, centers)
    target = np.linalg.solve(A, b)
    dist = float(np.mean(np.linalg.norm(target - centers, axis=-1)))
    if dense:
        # full-frame 3D structure at many depths: a thick frustum-filling
        # blob cloud — breaks both the empty-space memorization gauge AND
        # the planar (homography) ambiguity a backdrop wall alone has
        blob = blob_params(seed=seed + 11, n_blobs=n_blobs,
                           center=tuple(target),
                           radius=1.25, axis_scale=(1.7, 1.3, 0.9),
                           s_range=(0.10, 0.26))
    else:
        blob = blob_params(seed=seed + 11, n_blobs=n_blobs,
                           center=tuple(target),
                           radius=0.9, axis_scale=(1.3, 1.0, 0.55),
                           s_range=(0.14, 0.32))
    near = max(0.3, dist - 1.6)
    bd = None
    if backdrop:
        # wall 1.4 units behind the blob slab, facing the cameras
        mean_look = look.mean(0)
        mean_look /= np.linalg.norm(mean_look)
        bd = backdrop_params(point=target + 1.4 * mean_look,
                             normal=-mean_look, seed=seed + 23)
    for split in ("train", "val"):
        ds = llff_data.Dataset(opt, split=split)
        arr = ds.all_arrays(opt)
        imgs = analytic_blob_render(arr["pose"], arr["intr"], H, W, blob,
                                    depth_range=(near, dist + 1.8),
                                    backdrop=bd)
        for i in range(len(ds)):
            fname = os.path.join(root, scene, "images", ds.list[i][0])
            imageio.imwrite(fname,
                            (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8))
    return opt, blob


def analytic_render_with_depth(pose_w2c, intr, H, W, n_samples=96,
                               depth_range=(2.0, 6.0), bgcolor=1.0):
    """Like analytic_render but also returns the expected depth map [B,H,W]."""
    import jax.numpy as jnp
    from neural_invertible_warp_tpu.ops import rays, render, sampling
    import jax

    pose_w2c = jnp.asarray(pose_w2c)
    intr = jnp.asarray(intr)
    center, ray = rays.get_center_and_ray(pose_w2c, intr, H=H, W=W)
    depth = sampling.sample_depth(jax.random.PRNGKey(0), pose_w2c.shape[0],
                                  H * W, n_samples, depth_range,
                                  stratified=False)
    pts = center[..., None, :] + ray[..., None, :] * depth
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    sigma = 1.5 + 1.4 * jnp.sin(2.1 * x) * jnp.sin(1.7 * y) * jnp.sin(1.9 * z)
    rgb = 0.5 + 0.5 * jnp.sin(4.0 * pts)
    out_rgb, out_d, opac, _ = render.composite(ray, rgb, sigma, depth)
    out_rgb = out_rgb + bgcolor * (1 - opac)
    B = pose_w2c.shape[0]
    return (np.asarray(out_rgb).reshape(B, H, W, 3),
            np.asarray(out_d).reshape(B, H, W))


def _write_pfm(fname, data):
    """Minimal grayscale little-endian PFM writer."""
    data = np.asarray(data, np.float32)
    with open(fname, "wb") as f:
        f.write(b"Pf\n")
        f.write("{} {} \n".format(data.shape[1], data.shape[0]).encode())
        f.write(b"-1.0\n")
        np.flipud(data).astype("<f4").tofile(f)


def make_dtu_scene(root, scene="scan1", n_images=12, H=30, W=40, seed=0):
    """DTU-format scene: cameras.npz with P = K [R|t] and scale_mat (300x),
    images rendered from an analytic field, PFM GT depth, all-ones masks."""
    rng = np.random.RandomState(seed)
    scene_dir = os.path.join(root, "rs_dtu_4", "DTU", scene)
    img_dir = os.path.join(scene_dir, "image")
    mask_dir = os.path.join(root, "submission_data", "idrmasks", scene)
    depth_dir = os.path.join(root, "Depths", scene)
    for d in (img_dir, mask_dir, depth_dir):
        os.makedirs(d, exist_ok=True)

    K = np.array([[35.0, 0, W / 2], [0, 35.0, H / 2], [0, 0, 1]], np.float64)
    trans_offset = np.array([3.0, -2.0, 5.0])
    cam_npz = {}
    poses_w2c_final = []
    for i in range(n_images):
        th = rng.rand() * 2 * np.pi
        ph = 0.3 + rng.rand() * 0.4
        eye = 3.5 * np.array([np.cos(th) * np.cos(ph), np.sin(ph),
                              np.sin(th) * np.cos(ph)])
        # desired final c2w (OpenCV convention: camera z towards scene)
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        x_ax = np.cross(up, z); x_ax /= np.linalg.norm(x_ax)
        y_ax = np.cross(z, x_ax)
        R_c2w = np.stack([x_ax, y_ax, z], axis=1)
        c2w_final = np.concatenate([R_c2w, eye[:, None]], axis=1)
        # invert the loader's normalization: t_raw = 300*t_final + offset
        c2w_raw = c2w_final.copy()
        c2w_raw[:, 3] = 300.0 * c2w_final[:, 3] + trans_offset
        w2c_raw = np.linalg.inv(np.concatenate([c2w_raw, [[0, 0, 0, 1]]], 0))
        P = K @ w2c_raw[:3]
        world_mat = np.concatenate([P, [[0, 0, 0, 1]]], 0)
        scale_mat = np.diag([300.0, 300.0, 300.0, 1.0])
        scale_mat[:3, 3] = trans_offset
        cam_npz["world_mat_{}".format(i)] = world_mat
        cam_npz["scale_mat_{}".format(i)] = scale_mat
        w2c_final = np.linalg.inv(np.concatenate([c2w_final, [[0, 0, 0, 1]]], 0))
        poses_w2c_final.append(w2c_final[:3].astype(np.float32))
    np.savez(os.path.join(scene_dir, "cameras.npz"), **cam_npz)

    poses = np.stack(poses_w2c_final)
    intr = np.tile(K.astype(np.float32), (n_images, 1, 1))
    imgs, depths = analytic_render_with_depth(poses, intr, H, W,
                                              depth_range=(1.2, 5.2))
    for i in range(n_images):
        imageio.imwrite(os.path.join(img_dir, "{:06d}.png".format(i)),
                        (imgs[i] * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(mask_dir, "{:03d}.png".format(i)),
                        np.full((H, W, 3), 255, np.uint8))
        # reference PFM depths are in the raw world scale; the loader divides
        # by 300 (data/dtu.py:285-290)
        _write_pfm(os.path.join(depth_dir, "depth_map_{:04d}.pfm".format(i)),
                   depths[i] * 300.0)
    return poses, intr


def dtu_ring_poses(n_views=49, seed=0, radius=3.2, theta_span=80.0):
    """DTU-like inward-facing camera arc (OpenCV convention, c2w z toward
    the scene) — the geometry of a real DTU robot-arm scan: cameras on a
    wobbly arc at ~constant distance, all looking at the table center."""
    rng = np.random.RandomState(seed)
    c2ws = []
    for i in range(n_views):
        theta = np.deg2rad(theta_span * (i / (n_views - 1) - 0.5))
        phi = np.deg2rad(20 + 12 * np.sin(3.0 * theta) + 2 * rng.randn())
        r = radius + 0.12 * rng.randn()
        eye = np.array([r * np.sin(theta) * np.cos(phi),
                        r * np.sin(phi),
                        -r * np.cos(theta) * np.cos(phi)])
        target = np.array([0.05 * rng.randn(), 0.05 * rng.randn(), 0.0])
        z = target - eye
        z = z / np.linalg.norm(z)
        up = np.array([0.0, 1.0, 0.0])
        x_ax = np.cross(up, z); x_ax /= np.linalg.norm(x_ax)
        y_ax = np.cross(z, x_ax)
        R_c2w = np.stack([x_ax, y_ax, z], axis=1)
        c2ws.append(np.concatenate([R_c2w, eye[:, None]], axis=1))
    return np.stack(c2ws)


def make_blob_dtu_scene(root, scene="scan1", n_images=49, H=150, W=200,
                        seed=0):
    """Evidence-scale DTU-format scene: a 49-view inward camera arc over an
    opaque textured blob cluster with a corner-rich backdrop wall, written
    in the pixelNeRF DVR layout the loader expects (cameras.npz with raw
    300x-scaled projection matrices, images, IDR fg masks derived from the
    blob-field opacity, PFM GT depth in the raw world scale).

    Scene content sits inside the loader's fixed [1.2, 5.2] depth range
    (cameras at r~3.2, object radius ~1.4, wall at z=+1.6); oblique wall
    hits can slightly exceed 5.2, so runs should widen the range
    (data.dtu.increase_depth_range_by_x_percent~0.15).
    """
    scene_dir = os.path.join(root, "rs_dtu_4", "DTU", scene)
    img_dir = os.path.join(scene_dir, "image")
    mask_dir = os.path.join(root, "submission_data", "idrmasks", scene)
    depth_dir = os.path.join(root, "Depths", scene)
    for d in (img_dir, mask_dir, depth_dir):
        os.makedirs(d, exist_ok=True)

    f = 1.1 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    c2ws = dtu_ring_poses(n_views=n_images, seed=seed)

    trans_offset = np.array([3.0, -2.0, 5.0])
    cam_npz = {}
    poses_w2c_final = []
    for i in range(n_images):
        c2w_final = c2ws[i]
        # invert the loader's normalization: t_raw = 300*t_final + offset
        c2w_raw = c2w_final.copy()
        c2w_raw[:, 3] = 300.0 * c2w_final[:, 3] + trans_offset
        w2c_raw = np.linalg.inv(np.concatenate([c2w_raw, [[0, 0, 0, 1]]], 0))
        P = K @ w2c_raw[:3]
        cam_npz["world_mat_{}".format(i)] = np.concatenate(
            [P, [[0, 0, 0, 1]]], 0)
        scale_mat = np.diag([300.0, 300.0, 300.0, 1.0])
        scale_mat[:3, 3] = trans_offset
        cam_npz["scale_mat_{}".format(i)] = scale_mat
        w2c_final = np.linalg.inv(
            np.concatenate([c2w_final, [[0, 0, 0, 1]]], 0))
        poses_w2c_final.append(w2c_final[:3].astype(np.float32))
    np.savez(os.path.join(scene_dir, "cameras.npz"), **cam_npz)

    # content: medium textured blobs (multi-depth occluded structure) +
    # small opaque dots (view-stable corner anchors for SfM) + dotted wall
    body = blob_params(seed=seed + 7, n_blobs=50, radius=1.2,
                       axis_scale=(1.2, 1.0, 1.3), s_range=(0.09, 0.22))
    body["a"] = body["a"] * 4.0
    dots = blob_params(seed=seed + 19, n_blobs=40, radius=1.45,
                       axis_scale=(1.2, 1.0, 1.3), s_range=(0.03, 0.06))
    dots["a"] = dots["a"] * 40.0
    blob = {k: np.concatenate([body[k], dots[k]]) for k in
            ("mu", "s", "a", "c")}
    blob["tex"] = dict(freq=(9.0, 8.0, 10.0), amp=0.35)
    bd = backdrop_params(point=(0, 0, 1.6), normal=(0, 0, -1.0),
                         seed=seed + 23)
    trng = np.random.RandomState(seed + 13)
    n_spots = 800
    bd["spot_uv"] = (trng.rand(n_spots, 2).astype(np.float32) - 0.5) * 10.0
    bd["spot_s"] = (0.015 + 0.03 * trng.rand(n_spots)).astype(np.float32)
    bd["spot_c"] = ((trng.rand(n_spots, 3) - 0.5) * 1.6).astype(np.float32)

    poses = np.stack(poses_w2c_final)
    intr = np.tile(K.astype(np.float32), (n_images, 1, 1))
    imgs, depths, opacs = analytic_blob_render(
        poses, intr, H, W, blob, n_samples=256, depth_range=(1.2, 6.2),
        backdrop=bd, return_depth=True)
    for i in range(n_images):
        imageio.imwrite(os.path.join(img_dir, "{:06d}.png".format(i)),
                        (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8))
        mask = (opacs[i] > 0.5).astype(np.uint8) * 255
        imageio.imwrite(os.path.join(mask_dir, "{:03d}.png".format(i)),
                        np.repeat(mask[..., None], 3, axis=-1))
        # PFM depths live in the raw world scale; the loader divides by 300
        _write_pfm(os.path.join(depth_dir, "depth_map_{:04d}.pfm".format(i)),
                   depths[i] * 300.0)
    return poses, intr


def dtu_opt(root, H=30, W=40, scene="scan1"):
    from neural_invertible_warp_tpu import config
    opt = config.load_options("options/nerf_dtu.yaml")
    opt.H, opt.W = H, W
    opt.data.root = root
    opt.data.scene = scene
    opt.data.image_size = [H, W]
    opt.data.num_workers = 2
    return opt


def iphone_opt(root, H=108, W=192, scene="vid"):
    from neural_invertible_warp_tpu.dotdict import DotDict
    return DotDict(dict(
        H=H, W=W,
        data=dict(root=root, dataset="iphone", scene=scene,
                  image_size=[H, W], num_workers=2, preload=True,
                  val_ratio=0.15, augment={}, center_crop=None),
    ))


def make_blob_iphone_scene(root, scene="vid", n_images=24, img_size=(108, 192),
                           seed=0, n_blobs=40, path_scale=1.0):
    """iPhone-format unposed video with 3D-CONSISTENT frames: a smooth
    handheld-style camera path orbiting a blob cloud, rendered at the
    loader's hard-coded intrinsics (data/iphone.py: focal = W*4.2/(12.8/2.55),
    principal point at center). The loader reports identity dummy poses (the
    protocol trains poses from identity); the TRUE generation w2c poses are
    saved to <scene>/poses_true_w2c.npy for probe-side gauge-aligned pose
    error readout."""
    from neural_invertible_warp_tpu.data import iphone as iphone_data

    H, W = img_size
    path = os.path.join(root, scene)
    img_dir = os.path.join(path, "images")
    os.makedirs(img_dir, exist_ok=True)
    # placeholder frames so the loader can parse intrinsics at target size
    for i in range(n_images):
        imageio.imwrite(os.path.join(img_dir, "{}.png".format(i)),
                        _toy_image(H, W, i))
    opt = iphone_opt(root, H=H, W=W, scene=scene)
    ds = iphone_data.Dataset(opt, split="train")
    intr0 = ds.all_arrays(opt)["intr"][0]            # loader-rescaled K
    # smooth video path: slow orbit + handheld bob, always looking at the
    # blob cloud (forward-facing cluster, so identity init is recoverable)
    poses_w2c = []
    for i in range(n_images):
        t = i / (n_images - 1)
        # path_scale shrinks the handheld excursion (1.0 = wide orbit,
        # ~8.6 deg mean pairwise rotation; ~0.35 = slow pan — the
        # narrow-baseline casual-video regime)
        eye = np.array([0.9 * path_scale * np.sin(1.6 * t * np.pi),
                        0.15 * path_scale * np.sin(2.3 * t * np.pi + 0.4),
                        4.0 + 0.4 * path_scale * np.sin(0.9 * t * np.pi)])
        target = np.array([0.15 * np.sin(2 * t * np.pi), 0.0, 0.0])
        # OpenCV convention (camera z TOWARD the scene — what
        # rays.get_center_and_ray expects; look_at_c2w is OpenGL -z)
        z = target - eye
        z /= np.linalg.norm(z)
        up = np.array([0.0, 1.0, 0.0])
        x_ax = np.cross(up, z); x_ax /= np.linalg.norm(x_ax)
        y_ax = np.cross(z, x_ax)
        c2w = np.concatenate([np.stack([x_ax, y_ax, z], axis=1),
                              eye[:, None]], axis=1)
        w2c = np.linalg.inv(np.concatenate([c2w, [[0, 0, 0, 1]]], 0))[:3]
        poses_w2c.append(w2c.astype(np.float32))
    poses_w2c = np.stack(poses_w2c)
    np.save(os.path.join(path, "poses_true_w2c.npy"), poses_w2c)
    blob = blob_params(seed=seed + 31, n_blobs=n_blobs, radius=1.15,
                       axis_scale=(1.5, 1.1, 0.7), s_range=(0.12, 0.30))
    # textured backdrop wall behind the blob cloud (cameras at z~+4 look
    # toward -z): frame-filling view-consistent content — without it the
    # empty background is the EVIDENCE_r2 B2 memorization gauge
    bd = backdrop_params(point=(0.0, 0.0, -1.7), normal=(0.0, 0.0, 1.0),
                         seed=seed + 23)
    intr = np.tile(intr0[None], (n_images, 1, 1))
    imgs = analytic_blob_render(poses_w2c, intr, H, W, blob,
                                depth_range=(2.2, 6.2), backdrop=bd)
    for i in range(n_images):
        imageio.imwrite(os.path.join(img_dir, "{}.png".format(i)),
                        (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8))
    return opt, poses_w2c


def tandt_opt(root, H=180, W=320, scene="Ballroom"):
    from neural_invertible_warp_tpu.dotdict import DotDict
    return DotDict(dict(
        H=H, W=W,
        data=dict(root=root, dataset="tandt", scene=scene,
                  image_size=[H, W], num_workers=2, preload=True,
                  val_ratio=8, augment={}, center_crop=None),
    ))


def make_blob_tandt_scene(root, scene="Ballroom", n_images=24,
                          img_size=(180, 320), seed=0, n_blobs=40,
                          arc_scale=1.0):
    """Tanks&Temples-format scene (poses_bounds.npy walk-through arc +
    images/) with 3D-consistent blob imagery rendered from the
    LOADER-PARSED poses — the same robust-to-conventions pattern as
    make_blob_llff_scene: whatever centering/spherification the loader
    applies (data/tandt.py), the images match its reported GT poses."""
    from neural_invertible_warp_tpu.data import tandt as tandt_data

    H, W = img_size
    path = os.path.join(root, scene)
    img_dir = os.path.join(path, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_images):
        # forward-facing walk-through arc (a pure ring degenerates the
        # reference's average-pose centering, see test_data_extra.py)
        # arc_scale shrinks the walk-through arc (1.0 = 69 deg spread —
        # identity init is out of the BARF recovery basin there; ~0.25 =
        # gentle 17 deg pan, the identity-recoverable regime)
        th = (i / n_images - 0.5) * 1.2 * arc_scale
        eye = np.array([2.5 * np.sin(th), 0.3 + 0.05 * rng.randn(),
                        2.5 * np.cos(th)])
        c2w = look_at_c2w(eye)
        raw = c2w.copy()
        raw[..., 0], raw[..., 1] = -c2w[..., 1], c2w[..., 0]
        hwf = np.array([540.0, 960.0, 800.0], np.float32)[:, None]
        rows.append(np.concatenate([
            np.concatenate([raw, hwf], axis=1).reshape(-1),
            np.array([1.5 + rng.rand() * 0.1, 6.0])]))
        imageio.imwrite(os.path.join(img_dir, "{:04d}.png".format(i)),
                        _toy_image(H, W, seed * 100 + i))
    np.save(os.path.join(path, "poses_bounds.npy"), np.stack(rows))

    opt = tandt_opt(root, H=H, W=W, scene=scene)
    # same look-at-triangulation content placement as make_blob_llff_scene
    from neural_invertible_warp_tpu.data import tandt as tdata
    ds_train = tdata.Dataset(opt, split="train")
    arrays = ds_train.all_arrays(opt)
    pose = np.asarray(arrays["pose"])
    R, t = pose[:, :, :3], pose[:, :, 3]
    centers = -np.einsum("bij,bi->bj", R, t)
    look = R[:, 2, :]
    P = np.eye(3)[None] - look[:, :, None] * look[:, None, :]
    A = P.sum(0) + 1e-4 * np.eye(3)
    b = np.einsum("bij,bj->i", P, centers)
    target = np.linalg.solve(A, b)
    dist = float(np.mean(np.linalg.norm(target - centers, axis=-1)))
    # Depth placement: the loader's NoPe spherification rescales camera
    # centers to UNIT RMS radius about the look-convergence point, so
    # content AT that point sits at depth ~1.0*dist — but barf_llff
    # samples inverse depth [1,0] => metric [1,inf): anything nearer
    # than 1 is unsampleable and the field can only explain it with
    # per-view floaters (measured: 59 dB train overfit with frozen
    # relative poses). Put the blob slab PAST the convergence point at
    # depth ~2.2*dist and the textured backdrop wall at ~3*dist — all
    # within the sampleable range. The wall supplies frame-filling
    # view-consistent content (without it, empty black background is the
    # EVIDENCE_r2 B2 degenerate gauge — same fix as make_blob_llff_scene
    # backdrop=True).
    mean_look = look.mean(0)
    mean_look /= np.linalg.norm(mean_look)
    blob_c = target + 1.2 * dist * mean_look
    blob = blob_params(seed=seed + 17, n_blobs=n_blobs,
                       center=tuple(blob_c),
                       radius=0.5 * dist, axis_scale=(1.5, 1.1, 0.8),
                       s_range=(0.10, 0.26))
    bd = backdrop_params(point=target + 2.0 * dist * mean_look,
                         normal=-mean_look, seed=seed + 23)
    near = max(0.2, 1.35 * dist)
    far = 3.3 * dist
    with open(os.path.join(path, "synth_meta.json"), "w") as f:
        json.dump(dict(depth_near=near, depth_far=far, dist=dist), f)
    for split in ("train", "test"):
        ds = tandt_data.Dataset(opt, split=split)
        arr = ds.all_arrays(opt)
        imgs = analytic_blob_render(arr["pose"], arr["intr"], H, W, blob,
                                    depth_range=(near, far), backdrop=bd)
        for i in range(len(ds)):
            fname = os.path.join(img_dir, ds.list[i] if isinstance(
                ds.list[i], str) else ds.list[i][0])
            imageio.imwrite(fname,
                            (np.clip(imgs[i], 0, 1) * 255).astype(np.uint8))
    return opt, blob
