"""Config system: YAML files with ``_parent_`` inheritance + dot-notation CLI.

Behavior parity with the reference ``options.py:16-129``:

* CLI syntax (``parse_arguments``):
    ``--key1.key2=value``  -> YAML-parsed value
    ``--key1.key2=``       -> None
    ``--key1.key2``        -> True
    ``--key1.key2!``       -> False
* YAML loading (``load_options``): a file may name one or more parents via
  ``_parent_``; parents load first and are recursively overridden by the child.
* CLI overrides (``override_options``) are checked against existing keys
  (``safe_check``); unknown keys prompt interactively on a TTY and raise
  otherwise (the reference always prompts, reference ``options.py:76-83``).
* ``process_options``: seed handling, run-name suffixing, output dir layout
  ``<output_root>/<group>/<name>``, derived ``opt.H/opt.W``
  (reference ``options.py:87-105``).
* ``save_options_file``: dumps ``options.yaml`` into the run dir, detecting
  drift against an existing file (reference ``options.py:107-129``).
"""

from __future__ import annotations

import os
import random
import string
import sys

import yaml

from .dotdict import DotDict
from .utils import log

# Root against which relative option paths (e.g. "options/base.yaml") resolve.
# Defaults to the repo root (parent of this package); overridable for tests.
OPTIONS_ROOT = os.environ.get(
    "NIW_OPTIONS_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)


def parse_arguments(args):
    """Parse ``--a.b.c=val`` style CLI arguments into a nested DotDict."""
    opt_cmd = {}
    for arg in args:
        assert arg.startswith("--"), "arguments must start with '--': {}".format(arg)
        if "=" not in arg[2:]:
            key_str, value = (arg[2:-1], "false") if arg.endswith("!") else (arg[2:], "true")
        else:
            key_str, value = arg[2:].split("=", 1)
        keys_sub = key_str.split(".")
        opt_sub = opt_cmd
        for k in keys_sub[:-1]:
            opt_sub = opt_sub.setdefault(k, {})
        assert keys_sub[-1] not in opt_sub, "duplicate CLI key: {}".format(key_str)
        opt_sub[keys_sub[-1]] = yaml.safe_load(value)
    return DotDict(opt_cmd)


def load_options(fname):
    """Load a YAML options file, resolving the ``_parent_`` chain."""
    path = fname if os.path.isabs(fname) else os.path.join(OPTIONS_ROOT, fname)
    with open(path) as f:
        opt = DotDict(yaml.safe_load(f) or {})
    if "_parent_" in opt:
        parents = opt.pop("_parent_")
        if isinstance(parents, str):
            parents = [parents]
        for parent in parents:
            opt_parent = load_options(parent)
            opt_parent = override_options(opt_parent, opt, key_stack=[])
            opt = opt_parent
    return opt


def override_options(opt, opt_over, key_stack=None, safe_check=False):
    """Recursively override ``opt`` with ``opt_over`` (leaf-wise)."""
    key_stack = key_stack or []
    for key, value in opt_over.items():
        if isinstance(value, dict):
            opt[key] = override_options(
                opt.get(key, DotDict()), value,
                key_stack=key_stack + [key], safe_check=safe_check,
            )
        else:
            if safe_check and key not in opt:
                key_str = ".".join(key_stack + [key])
                if sys.stdin.isatty():
                    add_new = None
                    while add_new not in ["y", "n"]:
                        add_new = input('"{}" not found in original opt, add? (y/n) '.format(key_str))
                    if add_new == "n":
                        print("safe exiting...")
                        sys.exit(0)
                else:
                    raise KeyError(
                        'unknown option "{}" (not present in the YAML config); '
                        "add it to the YAML or fix the flag".format(key_str)
                    )
            opt[key] = value
    return opt


def process_options(opt):
    """Seed handling, run naming, output dir layout, derived H/W."""
    if opt.get("seed") is not None:
        random.seed(opt.seed)
        if opt.seed != 0:
            opt.name = "{}_seed{}".format(opt.name, opt.seed)
    else:
        randkey = "".join(random.choice(string.ascii_uppercase) for _ in range(4))
        opt.name = "{}_{}".format(opt.name, randkey)
    opt.output_path = os.path.join(opt.output_root, str(opt.group), str(opt.name))
    os.makedirs(opt.output_path, exist_ok=True)
    opt.H, opt.W = opt.data.image_size
    # On TPU, jax's DEFAULT matmul precision runs fp32 matmuls as
    # single-pass bfloat16 — which quantizes the INN warp's full-frequency
    # PE features enough to break joint pose+field recovery
    # (EVIDENCE_r3.md §4). Real fp32 for the XLA path by default; the fused
    # Pallas kernels manage their own MXU dtype (tpu.compute_dtype).
    prec = (opt.get("tpu") or {}).get("matmul_precision", "highest")
    if prec:
        import jax
        jax.config.update("jax_default_matmul_precision", str(prec))
    # Persistent compilation cache: remote TPU compiles through the axon
    # tunnel take 3-8 min for a fresh program; caching serialized
    # executables on disk makes repeated runs of the same config start in
    # seconds (tpu.compile_cache: path | empty to disable).
    cache_dir = (opt.get("tpu") or {}).get("compile_cache",
                                           "/tmp/jax_compile_cache")
    if cache_dir:
        import jax
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return opt


def set_options(opt_cmd=None, makedirs=True):
    """Entry point: merge YAML + CLI, then post-process. Mirrors options.set()."""
    opt_cmd = opt_cmd or DotDict()
    log.info("setting configurations...")
    assert "model" in opt_cmd, "--model=<name> is required"
    assert "yaml" in opt_cmd, "--yaml=<options file> is required"
    fname = "options/{}.yaml".format(opt_cmd.yaml)
    opt_base = load_options(fname)
    opt = override_options(opt_base, opt_cmd, key_stack=[], safe_check=True)
    if makedirs:
        process_options(opt)
    else:
        opt.H, opt.W = opt.data.image_size
    return opt


def save_options_file(opt):
    """Dump the resolved options into the run dir, guarding against drift."""
    opt_fname = os.path.join(opt.output_path, "options.yaml")
    plain = {k: v for k, v in opt.to_plain().items() if k not in ("device",)}
    if os.path.isfile(opt_fname):
        with open(opt_fname) as f:
            opt_old = yaml.safe_load(f)
        if plain != opt_old:
            if sys.stdin.isatty():
                override = None
                while override not in ["y", "n"]:
                    override = input("existing options file differs; override? (y/n) ")
                if override == "n":
                    print("safe exiting...")
                    sys.exit(0)
            else:
                log.warn("existing options file differs from current run; overwriting "
                         "(previous file saved as options_prev.yaml)")
                os.replace(opt_fname, os.path.join(opt.output_path, "options_prev.yaml"))
    with open(opt_fname, "w") as f:
        yaml.safe_dump(plain, f, default_flow_style=False, indent=4)
