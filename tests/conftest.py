"""Test configuration: force CPU backend with 8 virtual devices.

Must run before jax initializes a backend — the standard JAX trick for
testing N-device sharding without TPU hardware (SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
