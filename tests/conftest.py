"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding is validated by emulating devices on the CPU host
(`xla_force_host_platform_device_count`), per the build plan (SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Hermetic children: any subprocess spawned by a test (CLI e2e, dryrun
# re-exec) must not inherit the container's TPU-relay hooks. The axon
# sitecustomize (on PYTHONPATH) dials the relay at interpreter start
# regardless of JAX_PLATFORMS, so strip it and the relay env vars here —
# the parent already ran its sitecustomize, so this only affects children.
for _k in [k for k in os.environ if k.startswith(("PALLAS_AXON", "AXON"))]:
    os.environ.pop(_k, None)
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and "axon" not in p
)

import jax  # noqa: E402

# The container's sitecustomize may pre-import jax with a TPU platform plugin;
# the config update (read lazily at backend init) forces the CPU host platform.
jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, jax.devices()
