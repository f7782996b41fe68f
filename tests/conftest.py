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

import jax  # noqa: E402

# The container's sitecustomize may pre-import jax with a TPU platform plugin;
# the config update (read lazily at backend init) forces the CPU host platform.
jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, jax.devices()
