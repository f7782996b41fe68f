"""Model zoo registry.

Maps the reference's model names (train.py --model=<name>) onto system classes.
Unlike the reference's per-model subclass pyramid with copy-pasted render
cores (SURVEY.md Q8), every model here is a thin specialization of
``system.NerfSystem``: a parameter-pytree layout, a pose provider, and a loss
set — the render core, optimizers, eval, and checkpointing are shared.
"""

from __future__ import annotations


def get_system_class(name):
    if name == "nerf":
        from .system import NerfSystem
        return NerfSystem
    if name in ("barf", "barf_se3_field"):
        from .barf import BarfSystem
        return BarfSystem
    if name in ("barf_inn_llff", "nerf_inn_llff", "barf_inn_blender"):
        from .inn_warp import InnWarpSystem
        return InnWarpSystem
    if name in ("nerf_dtu",):
        from .dtu import NerfDTUSystem
        return NerfDTUSystem
    if name in ("barf_dtu",):
        from .dtu import BarfDTUSystem
        return BarfDTUSystem
    if name in ("barf_inn_dtu", "nerf_inn_dtu"):
        from .dtu import InnDTUSystem
        return InnDTUSystem
    if name in ("nerf_gaussian",):
        from .garf import NerfGaussianSystem
        return NerfGaussianSystem
    if name in ("garf",):
        from .garf import GarfSystem
        return GarfSystem
    if name in ("garf_se3_field",):
        from .garf import GarfSE3FieldSystem
        return GarfSE3FieldSystem
    raise KeyError("unknown model: {}".format(name))
