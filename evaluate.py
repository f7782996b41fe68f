"""Evaluation driver (reconstructs the reference's missing evaluate.py;
invoked by scripts/eval_llff.sh / eval_dtu.sh — SURVEY.md §2.3 Q2):

    python evaluate.py --model=<model> --yaml=<options file> \
        [--resume | --load=<ckpt>] [--key.sub=value ...]

Loads the latest (or given) checkpoint, reports pose errors and novel-view
PSNR/SSIM/LPIPS, dumps quant.txt / quant_pose.txt / test-view PNGs, and writes
the novel-view videos when ffmpeg is available.
"""

import os
import shutil
import sys

from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.models.engine import Trainer
from neural_invertible_warp_tpu.utils import log


def generate_videos_synthesis(opt):
    """ffmpeg assembly of the dumped test views (reference model/nerf.py:201-239)."""
    if shutil.which("ffmpeg") is None:
        log.warn("ffmpeg not found; skipping video export")
        return
    test_path = os.path.join(opt.output_path, "test_view")
    for name, pattern in [("test_view_rgb.mp4", "rgb_%d.png"),
                          ("test_view_depth.mp4", "depth_%d.png")]:
        out = os.path.join(opt.output_path, name)
        os.system("ffmpeg -y -framerate 30 -i {}/{} -pix_fmt yuv420p {} "
                  ">/dev/null 2>&1".format(test_path, pattern, out))
        log.info("wrote {}".format(out))


def main():
    opt_cmd = config.parse_arguments(sys.argv[1:])
    if "resume" not in opt_cmd and "load" not in opt_cmd:
        opt_cmd.resume = True
    opt = config.set_options(opt_cmd)
    trainer = Trainer(opt)
    trainer.load_dataset(eval_split="test" if opt.data.dataset == "blender" else "val")
    trainer.build_system()
    trainer.restore_checkpoint()
    results = trainer.system.evaluate_full(trainer.state)
    log.info("evaluation results: {}".format(results))
    generate_videos_synthesis(opt)


if __name__ == "__main__":
    main()
