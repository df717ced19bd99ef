"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a simulated mesh (the driver separately
dry-runs the multi-chip path); kernel parity tests run Pallas in
interpreter mode on CPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
