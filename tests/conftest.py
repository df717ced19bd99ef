"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a simulated mesh (the driver separately
dry-runs the multi-chip path); kernel parity tests run Pallas in
interpreter mode on CPU.

This environment's sitecustomize registers the axon TPU plugin in every
Python process and jax is imported at interpreter startup, so env-var
overrides are too late — use jax.config instead (backends initialize
lazily, so this still wins).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
