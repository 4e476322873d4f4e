"""Transient-TPU-backend-error resilience for device→host transfers.

Why this exists: the round-3 bench record (BENCH_r03.json) died on its FIRST
scalar fetch with a transient ``FAILED_PRECONDITION: TPU backend error`` from
the remote-tunnel backend — one flaky moment cost the round its committed
perf artifact, and an immediate rerun succeeded.  The reference has no analog
(single-process CPU, src/Makevars:11-13); on a networked TPU runtime,
transfer retry + client re-initialization is part of the failure-detection
subsystem (SURVEY.md §5).

Three layers, used by bench.py and the tools/ capture scripts:

  * ``fetch(x)``            — device_get with bounded exponential-backoff
                              retries; handles blips where the buffer is
                              still alive and only the transfer failed.
  * ``reset_backend()``     — tear down the XLA client and caches so the
                              next trace re-establishes the device
                              connection.  All existing jax.Arrays die with
                              the client, so callers must rebuild device
                              state from host data afterwards.
  * ``run_resilient(make)`` — run a self-contained closure (it must create
                              its own device arrays); on a transient error,
                              reset the backend and re-run, bounded attempts.

Only *transient* runtime errors are retried (FAILED_PRECONDITION /
UNAVAILABLE / INTERNAL / DEADLINE_EXCEEDED / connection drops).  Programming
errors, OOMs (RESOURCE_EXHAUSTED) and shape errors re-raise immediately.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, TypeVar

logger = logging.getLogger("insider_tpu.resilience")

T = TypeVar("T")

# Status-code markers in the "CODE:" form the XLA runtime uses at message
# start ("FAILED_PRECONDITION: TPU backend error ...").  Requiring the
# colon-suffixed form (ADVICE r4) stops genuine failures whose prose merely
# mentions a word like "connection" from being reclassified as blips.
_TRANSIENT_STATUS = (
    "FAILED_PRECONDITION:",
    "UNAVAILABLE:",
    "DEADLINE_EXCEEDED:",
    "ABORTED:",
)
# INTERNAL: is ambiguous — the compiler reports its own bugs as
# "INTERNAL: ..." too, and those are deterministic.  Retry it only when
# the message also implicates the transport/backend layer.
_INTERNAL_CONTEXT = (
    "TPU backend error",
    "Socket closed",
    "socket",
    "stream",
    "transfer",
    "network",
    "connection reset",
    "Connection reset",
)
_CONNECTION_MARKERS = (
    "Socket closed",
    "Connection reset",
    "connection reset",
    "Broken pipe",
    "ECONNRESET",
    "EPIPE",
)
_NON_TRANSIENT_MARKERS = (
    "RESOURCE_EXHAUSTED",    # OOM: deterministic, retry cannot help
    "ResourceExhausted",
    "INVALID_ARGUMENT",
    "OUT_OF_RANGE",
)

# Every error swallowed by a retry layer, with its full traceback — the
# capture scripts (bench.py, tools/*) attach this to their JSON artifacts
# so a silently-retried real regression is still visible (ADVICE r4).
_SWALLOWED: list = []


def get_swallowed() -> list:
    """Records of every transient-classified error retried this process."""
    return list(_SWALLOWED)


def _record_swallowed(where: str, exc: BaseException) -> None:
    import traceback

    _SWALLOWED.append({
        "where": where,
        "error": f"{type(exc).__name__}: {exc}",
        "traceback": "".join(traceback.format_exception(
            type(exc), exc, exc.__traceback__))[-4000:],
        "time": time.time(),
    })


def is_transient(exc: BaseException) -> bool:
    """Heuristic: a runtime-layer error worth retrying?"""
    try:
        import jax

        if not isinstance(exc, (jax.errors.JaxRuntimeError, RuntimeError,
                                OSError)):
            return False
    except Exception:
        if not isinstance(exc, (RuntimeError, OSError)):
            return False
    msg = f"{type(exc).__name__}: {exc}"
    if any(m in msg for m in _NON_TRANSIENT_MARKERS):
        return False
    if any(m in msg for m in _TRANSIENT_STATUS):
        return True
    if "INTERNAL:" in msg and any(m in msg for m in _INTERNAL_CONTEXT):
        return True
    # Raw transport failures surface as OSError/ConnectionError subclasses;
    # only those types get the connection-prose markers.
    if isinstance(exc, OSError) and any(m in msg
                                        for m in _CONNECTION_MARKERS):
        return True
    return False


def _device_get(x):
    """Indirection point (monkeypatched by the forced-fault tests)."""
    import jax

    return jax.device_get(x)


def fetch(x, attempts: int = 4, base_delay: float = 1.0):
    """device_get with retries.  Returns host numpy (pytree ok).

    Retries only transient runtime errors, with exponential backoff
    (base_delay * 2^k seconds).  If the buffer itself was lost with the
    client, retries keep failing and the last error propagates — callers
    that can rebuild state should wrap the whole computation in
    run_resilient instead.
    """
    last = None
    for k in range(attempts):
        try:
            return _device_get(x)
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if not is_transient(e):
                raise
            last = e
            _record_swallowed("fetch", e)
            delay = base_delay * (2.0 ** k)
            logger.warning(
                "transient backend error on fetch (attempt %d/%d): %s; "
                "retrying in %.1fs", k + 1, attempts, e, delay)
            time.sleep(delay)
    raise last


def fetch_scalar(x, attempts: int = 4, base_delay: float = 1.0) -> float:
    """float(x) with retries (the exact call BENCH_r03 died on)."""
    return float(fetch(x, attempts=attempts, base_delay=base_delay))


def reset_backend() -> None:
    """Tear down the XLA client(s) so the next op reconnects.

    Invalidates every live jax.Array and compiled executable (the
    persistent compilation cache on disk survives, so recompiles are
    cheap).  Failures here are swallowed: if the runtime cannot be torn
    down, the subsequent retry will surface the real problem.
    """
    import jax

    for f in (
        lambda: jax.clear_caches(),
        lambda: __import__("jax.extend.backend", fromlist=["clear_backends"])
        .clear_backends(),
    ):
        try:
            f()
        except Exception as e:  # noqa: BLE001
            logger.warning("backend reset step failed: %s", e)


def run_resilient(make: Callable[[], T], attempts: int = 3,
                  base_delay: float = 2.0,
                  reset_between: bool = True) -> T:
    """Run ``make()`` (a self-contained closure that creates its own device
    arrays) with transient-error retries, resetting the backend between
    attempts so a poisoned client cannot sink every retry."""
    last = None
    for k in range(attempts):
        try:
            return make()
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if not is_transient(e):
                raise
            last = e
            _record_swallowed("run_resilient", e)
            logger.warning(
                "transient backend error (attempt %d/%d): %s", k + 1,
                attempts, e)
            if k + 1 < attempts:
                if reset_between:
                    reset_backend()
                time.sleep(base_delay * (2.0 ** k))
    raise last
