"""Test configuration: force CPU backend with 8 virtual devices.

Must run before jax initializes a backend — the standard JAX trick for
testing N-device sharding without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers the axon TPU plugin
whenever PALLAS_AXON_POOL_IPS is set, which overrides JAX_PLATFORMS; blank
it so tests run on true CPU.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
