"""Test configuration: force an 8-device virtual CPU mesh.

Collectives and sharding are exercised without hardware the idiomatic JAX way
(SURVEY.md §4): ``xla_force_host_platform_device_count=8`` on the CPU backend.

Note: this environment's sitecustomize registers a TPU ("axon") PJRT plugin in
every process and programmatically sets ``jax_platforms``, so the env var
alone is not enough — we must override the config after import (backends
initialize lazily, so this is safe as long as it runs before first use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
