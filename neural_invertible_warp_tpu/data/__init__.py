"""Dataset loaders (host-side numpy; device upload happens in the engine).

Each loader module exposes a ``Dataset`` class with the same public surface as
the reference data layer (reference data/base.py): construction with
``(opt, split, subset)``, ``len()``, ``get_all_camera_poses(opt)``, and
``all_arrays(opt)`` which returns the whole split as stacked numpy arrays
(the TPU-native replacement for prefetch_all_data + DataLoader — datasets here
are tiny, so the entire split lives on device as one batch).
"""

import importlib


def get_dataset(name):
    """Resolve a dataset module by its reference name (llff, blender, ...)."""
    return importlib.import_module(
        "neural_invertible_warp_tpu.data.{}".format(name))
