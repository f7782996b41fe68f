"""Device-mesh sharding for the ray axis (data parallelism over rays).

The reference is strictly single-GPU (reference options.py:103). The TPU-native
scaling story (SURVEY.md §2.4): rays are embarrassingly parallel, parameters
are tiny (~2-3M) and replicated, so the train step shards the per-image ray
batch across chips over ICI and lets GSPMD insert the collectives — gradient
psum across the ray shards, an all-gather of the (tiny) warped point sets
feeding the SVD global-alignment fit.

Usage: ``activate(mesh)`` installs a process-global mesh; the render/step code
calls ``shard_rays`` / ``shard_batch`` on its intermediates, which are no-ops
when no mesh is active (single-chip path identical).

Determinism: ray indices are drawn globally (one permutation, then constrained
onto the mesh), so results are chip-count invariant up to float reduction
order (SURVEY.md §7.3 "ray-sharding determinism").
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"

_active_mesh = None


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.array(devices), (RAY_AXIS,))


def activate(mesh):
    global _active_mesh
    _active_mesh = mesh


def deactivate():
    global _active_mesh
    _active_mesh = None


@contextmanager
def use_mesh(mesh):
    activate(mesh)
    try:
        yield mesh
    finally:
        deactivate()


def active_mesh():
    return _active_mesh


def _constrain(x, spec):
    if _active_mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_active_mesh, spec))


def shard_rays(x):
    """Shard a [N_rays] (or [N_rays, ...]) array over the ray axis."""
    spec = P(RAY_AXIS) if x.ndim == 1 else P(RAY_AXIS, *([None] * (x.ndim - 1)))
    return _constrain(x, spec)


def shard_batch_rays(x):
    """Shard a [B, N_rays, ...] array over the ray axis (dim 1)."""
    spec = P(None, RAY_AXIS, *([None] * (x.ndim - 2)))
    return _constrain(x, spec)


def replicate(x):
    return _constrain(x, P())
