"""Forced-fault tests of the transient-backend-error retry path.

BENCH_r03.json died on its first scalar fetch with a transient
FAILED_PRECONDITION and took the round's perf record with it; these tests
inject that exact failure and verify the retry machinery survives it
(VERDICT r3 #1).
"""

import jax
import jax.numpy as jnp
import pytest

from insider_tpu import resilience


def _transient_error():
    # The exact error text of BENCH_r03.json's crash.
    return jax.errors.JaxRuntimeError(
        "FAILED_PRECONDITION: TPU backend error (FailedPrecondition).")


def test_is_transient_classification():
    assert resilience.is_transient(_transient_error())
    assert resilience.is_transient(
        RuntimeError("UNAVAILABLE: Socket closed"))
    assert resilience.is_transient(
        RuntimeError("DEADLINE_EXCEEDED: deadline exceeded"))
    # programming/OOM errors must NOT be retried
    assert not resilience.is_transient(ValueError("FAILED_PRECONDITION"))
    assert not resilience.is_transient(
        RuntimeError("RESOURCE_EXHAUSTED: out of memory on TPU"))
    assert not resilience.is_transient(
        RuntimeError("INVALID_ARGUMENT: shapes do not match"))
    assert not resilience.is_transient(RuntimeError("some other failure"))
    # ADVICE r4: broad-substring matches must not reclassify real failures
    # as blips — a compiler bug reported as INTERNAL, or prose that merely
    # mentions a connection, are deterministic.
    assert not resilience.is_transient(
        RuntimeError("INTERNAL: ran out of registers while compiling"))
    assert not resilience.is_transient(
        RuntimeError("bad graph: node has no connection to output"))
    # ... while genuinely transport-flavored INTERNAL errors still retry
    assert resilience.is_transient(
        RuntimeError("INTERNAL: TPU backend error: Socket closed"))
    assert resilience.is_transient(
        ConnectionResetError(104, "Connection reset by peer"))


def test_swallowed_errors_are_recorded():
    before = len(resilience.get_swallowed())
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("UNAVAILABLE: Socket closed")
        return 42

    assert resilience.run_resilient(flaky, attempts=2,
                                    reset_between=False) == 42
    rec = resilience.get_swallowed()[before:]
    assert len(rec) == 1
    assert "UNAVAILABLE" in rec[0]["error"]
    assert "traceback" in rec[0] and "flaky" in rec[0]["traceback"]


def test_fetch_retries_transient_then_succeeds(monkeypatch):
    calls = {"n": 0}
    real = resilience._device_get

    def flaky(x):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise _transient_error()
        return real(x)

    monkeypatch.setattr(resilience, "_device_get", flaky)
    monkeypatch.setattr(resilience.time, "sleep", lambda s: None)
    out = resilience.fetch(jnp.float32(41.0) + 1.0)
    assert float(out) == 42.0
    assert calls["n"] == 3


def test_fetch_scalar_retries():
    # the exact call shape BENCH_r03 died on: float(<device scalar>)
    n = {"c": 0}
    real = resilience._device_get

    def flaky(x):
        n["c"] += 1
        if n["c"] == 1:
            raise _transient_error()
        return real(x)

    orig_sleep = resilience.time.sleep
    resilience._device_get, resilience.time.sleep = flaky, lambda s: None
    try:
        assert resilience.fetch_scalar(jnp.float32(7.0)) == 7.0
    finally:
        resilience._device_get, resilience.time.sleep = real, orig_sleep


def test_fetch_does_not_retry_nontransient(monkeypatch):
    def broken(x):
        raise ValueError("a real bug")

    monkeypatch.setattr(resilience, "_device_get", broken)
    with pytest.raises(ValueError):
        resilience.fetch(jnp.zeros(3))


def test_fetch_exhausts_attempts(monkeypatch):
    calls = {"n": 0}

    def always_down(x):
        calls["n"] += 1
        raise _transient_error()

    monkeypatch.setattr(resilience, "_device_get", always_down)
    monkeypatch.setattr(resilience.time, "sleep", lambda s: None)
    with pytest.raises(jax.errors.JaxRuntimeError):
        resilience.fetch(jnp.zeros(3), attempts=3)
    assert calls["n"] == 3


def test_run_resilient_rebuilds_and_retries(monkeypatch):
    monkeypatch.setattr(resilience.time, "sleep", lambda s: None)
    state = {"attempt": 0}

    def make():
        state["attempt"] += 1
        if state["attempt"] == 1:
            raise _transient_error()
        # rebuild-from-host path: create fresh device arrays and compute
        return float(jnp.sum(jnp.arange(4.0)))

    out = resilience.run_resilient(make, attempts=3, reset_between=False)
    assert out == 6.0
    assert state["attempt"] == 2


def test_run_resilient_propagates_nontransient(monkeypatch):
    def make():
        raise KeyError("bug")

    with pytest.raises(KeyError):
        resilience.run_resilient(make, attempts=3, reset_between=False)
