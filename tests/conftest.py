"""Test configuration: force a true-CPU backend with 8 virtual devices.

The standard JAX trick for testing N-device sharding without TPU hardware
(SURVEY.md §4) — with a twist: this image's sitecustomize registers the axon
TPU plugin at interpreter startup, and pytest plugins import jax before any
conftest runs, so jax.config has already read JAX_PLATFORMS from the
original environment.  Updating the *config* (not the env) still works as
long as no backend has been initialized, which holds at conftest-import
time.  XLA_FLAGS is read lazily at CPU-client creation, so the env tweak
below is still effective.

Opt out (run tests against the real TPU) with INSIDER_TEST_BACKEND=tpu.
"""

import os

if os.environ.get("INSIDER_TEST_BACKEND", "").lower() != "tpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


# --- XLA CPU compiler-state guard -----------------------------------------
# With the whole suite in one process, jaxlib's CPU compiler segfaults
# after ~140 accumulated compilations (reproducible at
# test_sharding::test_sharded_ridge_path; each prefix subset passes, and
# the same programs compile fine in a fresh process).  Dropping the traced/
# compiled caches between test modules keeps the per-process compilation
# count under the threshold.
import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    import jax as _jax

    _jax.clear_caches()
