"""Checkpointing: latest + per-iteration snapshots.

Layout parity with reference util.py:124-163:
  <output_path>/model.ckpt          (latest)
  <output_path>/model/<iter>.ckpt   (numbered snapshots)
State pytrees are stored as pickled numpy trees (framework-independent, no
device buffers in the file). ``restore`` tolerates missing/extra top-level
param groups like the reference's per-child partial load (util.py:121-145).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax

from . import log


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(output_path, state, it, latest_name="model.ckpt"):
    payload = dict(iter=int(it), state=_to_numpy(state))
    os.makedirs(os.path.join(output_path, "model"), exist_ok=True)
    numbered = os.path.join(output_path, "model", "{}.ckpt".format(int(it)))
    with open(numbered, "wb") as f:
        pickle.dump(payload, f)
    latest = os.path.join(output_path, latest_name)
    tmp = latest + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, latest)
    return numbered


def restore_checkpoint(output_path, state_template, resume=True,
                       load_name=None):
    """Load a checkpoint into the shape of ``state_template``.

    resume=True loads the latest; an integer loads that snapshot;
    load_name loads an explicit path. Returns (state, iter).
    """
    if load_name is not None:
        path = load_name
    elif resume is True:
        path = os.path.join(output_path, "model.ckpt")
    else:
        path = os.path.join(output_path, "model", "{}.ckpt".format(int(resume)))
    with open(path, "rb") as f:
        payload = pickle.load(f)
    saved = payload["state"]

    def merge(tmpl, loaded):
        if isinstance(tmpl, dict):
            out = {}
            for k in tmpl:
                if isinstance(loaded, dict) and k in loaded:
                    out[k] = merge(tmpl[k], loaded[k])
                else:
                    log.warn("checkpoint missing key '{}'; keeping init".format(k))
                    out[k] = tmpl[k]
            return out
        if isinstance(tmpl, tuple):
            merged = [merge(t, l) for t, l in zip(tmpl, loaded)]
            if hasattr(tmpl, "_fields"):  # namedtuple (optax states)
                return type(tmpl)(*merged)
            return tuple(merged)
        if isinstance(tmpl, list):
            return [merge(t, l) for t, l in zip(tmpl, loaded)]
        return loaded

    state = merge(state_template, saved)
    log.info("restored checkpoint {} (iter {})".format(path, payload["iter"]))
    return state, payload["iter"]


# ---------------------------------------------------------------------------
# Orbax backend (optional): async-capable checkpointing for TPU pods
# (SURVEY.md §5.3-5.4: orbax gives preemption recovery on pods; the pickle
# backend above keeps the reference's single-file model.ckpt layout)
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(output_path, state, it):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(output_path, "model_orbax",
                                        str(int(it))))
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, _to_numpy(state), force=True)
    return path


def restore_checkpoint_orbax(output_path, state_template, it):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(output_path, "model_orbax",
                                        str(int(it))))
    checkpointer = ocp.PyTreeCheckpointer()
    restored = checkpointer.restore(path, item=_to_numpy(state_template))
    log.info("restored orbax checkpoint {}".format(path))
    return restored, int(it)


def latest_orbax_iter(output_path):
    root = os.path.join(output_path, "model_orbax")
    its = [int(d) for d in os.listdir(root) if d.isdigit()] \
        if os.path.isdir(root) else []
    if not its:
        raise FileNotFoundError("no orbax checkpoints under {}".format(root))
    return max(its)


# ---------------------------------------------------------------------------
# backend dispatch (config flag ckpt.backend: pickle | orbax)
# ---------------------------------------------------------------------------

def save(output_path, state, it, backend="pickle"):
    if backend == "orbax":
        return save_checkpoint_orbax(output_path, state, it)
    return save_checkpoint(output_path, state, it)


def restore(output_path, state_template, resume=True, load_name=None,
            backend="pickle"):
    if backend == "orbax":
        if load_name is not None:
            raise ValueError("--load with the orbax backend: pass the "
                             "iteration number via --resume=<it> instead")
        it = latest_orbax_iter(output_path) if resume is True else int(resume)
        return restore_checkpoint_orbax(output_path, state_template, it)
    return restore_checkpoint(output_path, state_template, resume=resume,
                              load_name=load_name)
