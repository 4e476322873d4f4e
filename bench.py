"""Benchmark: factor-update throughput on the flagship masked workload.

Config mirrors the full ageing workload (tests/ageing.R:13-40 and
README.md:30): a 377 x 44477 matrix, 4 discrete confounders with the
reference's level structure (2/16/8/107 — pid, interaction, sid, did),
K=24, lambda=11, alpha=0.4, 10% held-out element mask.

Metric (BASELINE.json north star): factor-update nnz/s per chip — the number
of observed training entries processed per factor-update block, times blocks
per ALS iteration (4 row blocks + 1 column block), divided by steady-state
wall time per iteration.  The reference publishes no numbers (BASELINE.md);
vs_baseline is measured against the round-1 naive-XLA implementation
recorded in bench_baseline.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")

N_ROWS, N_COLS, K = 377, 44477, 24
LEVELS = (2, 16, 8, 107)
LAMBDA, ALPHA = 11.0, 0.4
WARMUP_ITERS, TIMED_ITERS = 12, 30


def _sync(x) -> float:
    """Force a real device sync: on the axon remote backend,
    block_until_ready can return before execution completes for donated
    buffers; a scalar transfer cannot."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def build():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the flagship program takes minutes to
    # compile over the remote-compile tunnel; cache it across runs.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import insider_tpu as it
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.train import als

    sim = it.simulate_scale(N_ROWS, N_COLS, K, level_counts=LEVELS,
                            noise_std=1.0, seed=0)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    problem = als.build_problem(
        split.data, sim.confounder, split.train_indicator,
        split.test_indicator, masked=True,
    )
    config = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                       alpha=ALPHA, masked=True)
    state = init_state(jax.random.PRNGKey(0), problem.n_levels, N_COLS, K)
    ss = als.StepStatics.from_config(config)
    hy = als.Hypers(jnp.float32(LAMBDA), jnp.float32(LAMBDA),
                    jnp.float32(ALPHA))
    nnz = int(np.asarray(split.train_indicator).sum())
    return problem, state, ss, hy, nnz


def main():
    import jax
    import jax.numpy as jnp

    from insider_tpu.train import als

    problem, state, ss, hy, nnz = build()
    sub_tol = jnp.float32(1e-5)

    # Warmup: compile + settle into the converged-ish CD regime so sweep
    # counts are steady-state.
    state = als._run_steps(problem.arrays, problem.statics, ss, hy, state,
                           sub_tol, jnp.int32(WARMUP_ITERS))
    _sync(state.column_factor)

    t0 = time.perf_counter()
    state = als._run_steps(problem.arrays, problem.statics, ss, hy, state,
                           sub_tol, jnp.int32(TIMED_ITERS))
    _sync(state.column_factor)
    dt = (time.perf_counter() - t0) / TIMED_ITERS

    blocks = len(LEVELS) + 1
    nnz_per_s = blocks * nnz / dt

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["value"]
        vs_baseline = nnz_per_s / base

    print(json.dumps({
        "metric": "factor_update_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "config": f"{N_ROWS}x{N_COLS} K={K} levels={LEVELS} "
                      f"lambda={LAMBDA} alpha={ALPHA} masked 10%",
            "sec_per_iter": dt,
            "train_nnz": nnz,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
