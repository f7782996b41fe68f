"""Generate the shared on-disk LLFF control scene (B3 protocol: blob slab +
band-limited textured backdrop wall, full-frame view-consistent content).

Written once; consumed byte-identically by BOTH the reference torch loader
(`/root/reference/data/llff.py`) and the rebuild's loader
(`neural_invertible_warp_tpu/data/llff.py`) — same `poses_bounds.npy`
conventions (raw 3024x4032 claim, [right,up,backwards] c2w columns).
"""

import argparse
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def ensure_scene(root, scene="blobfern", n_images=40, img_size=(240, 320),
                 seed=0, dense=False):
    scene_dir = os.path.join(root, scene)
    if os.path.isdir(scene_dir):
        return scene_dir
    import synth_data
    synth_data.make_blob_llff_scene(
        root, scene=scene, n_images=n_images, img_size=img_size,
        n_blobs=24, val_ratio=0.1, backdrop=True, spread=0.5, seed=seed,
        dense=dense)
    return scene_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/refctl/llff")
    ap.add_argument("--scene", default="blobfern")
    ap.add_argument("--n-images", type=int, default=40)
    ap.add_argument("--size", default="240,320")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dense", action="store_true")
    args = ap.parse_args()
    H, W = (int(x) for x in args.size.split(","))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    d = ensure_scene(args.root, scene=args.scene, n_images=args.n_images,
                     img_size=(H, W), seed=args.seed, dense=args.dense)
    print("scene at", d)
