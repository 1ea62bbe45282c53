"""Test configuration: force an 8-device virtual CPU mesh.

Collectives and sharding are exercised without hardware the idiomatic JAX way
(SURVEY.md §4): ``xla_force_host_platform_device_count=8`` on the CPU backend.
This must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
