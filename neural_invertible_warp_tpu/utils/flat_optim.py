"""Flattened multi-group optimizer.

optax applies elementwise transforms leaf-by-leaf; with ~70 parameter leaves
that is hundreds of tiny device ops per step — measurable overhead at this
model scale. Adam is purely elementwise, so each label group can be raveled
into ONE vector, updated with a handful of fused ops, and unraveled — the
update is bit-identical to the per-leaf computation.

Exposes the same ``init(params)`` / ``update(grads, state, params)`` interface
as ``optax.multi_transform`` over top-level-keyed label maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class FlatMultiOptimizer:
    """Per-label optax transforms over raveled top-level param groups."""

    def __init__(self, transforms, labels):
        """
        Args:
            transforms: dict label -> optax.GradientTransformation.
            labels: dict top-level param key -> label.
        """
        self.transforms = transforms
        self.labels = labels
        self._unravel = {}

    def _groups(self):
        groups = {}
        for key, label in self.labels.items():
            groups.setdefault(label, []).append(key)
        return groups

    def init(self, params):
        state = {}
        for label, keys in self._groups().items():
            sub = {k: params[k] for k in keys}
            flat, unravel = ravel_pytree(sub)
            self._unravel[label] = unravel
            state[label] = self.transforms[label].init(flat)
        return state

    def update(self, grads, state, params=None):
        updates = {}
        new_state = {}
        for label, keys in self._groups().items():
            sub_g = {k: grads[k] for k in keys}
            flat_g, unravel = ravel_pytree(sub_g)
            flat_p = (ravel_pytree({k: params[k] for k in keys})[0]
                      if params is not None else None)
            flat_u, new_state[label] = self.transforms[label].update(
                flat_g, state[label], flat_p)
            updates.update(unravel(flat_u))
        return updates, new_state
