"""Training driver (CLI parity with reference train.py):

    python train.py --model=<model> --yaml=<options file> [--key.sub=value ...]
"""

import sys

from neural_invertible_warp_tpu import config
from neural_invertible_warp_tpu.models.engine import run_training
from neural_invertible_warp_tpu.utils import log


def main():
    log.title("[{}] (PyTorch-free TPU rebuild of neural_invertible_warp)".format(
        sys.argv[0]))
    opt_cmd = config.parse_arguments(sys.argv[1:])
    opt = config.set_options(opt_cmd)
    config.save_options_file(opt)
    run_training(opt)


if __name__ == "__main__":
    main()
