"""Test configuration: CPU backend, 8 virtual devices, float64.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon before any user code runs, so plain env vars are too
late — we switch platform via jax.config (backends initialize lazily, at
the first jax operation, which has not happened yet at conftest time).

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs
__graft_entry__.dryrun_multichip). x64 is enabled for the accuracy-gated
numerics (f64 is native on CPU).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
