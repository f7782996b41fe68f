"""torchvision stand-in for the reference control harness.

Only the pieces on the reference's LLFF *training* path are functional
(`to_tensor` at data/base.py:106); everything else raises if reached.
"""

from . import models, transforms, utils  # noqa: F401

__version__ = "0.0-control-shim"
