"""Focused device timing of the column-solver configurations.

Times the FULL flagship ALS iteration under a grid of solver caps
(max_fss_outer x max_fss_polish_sweeps, plus the cd solver and decay
regimes), attributing the solver's in-loop convergence work the same way
tools/profile_iter.py does but at finer grain — this is the measurement
behind the round-5 solver optimizations (VERDICT r4 next #1/#3/#6).

Usage: python tools/solver_bench.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROWS, N_COLS, K = 377, 44477, 24
LEVELS = (2, 16, 8, 107)
LAMBDA, ALPHA = 11.0, 0.4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import insider_tpu as it
    from insider_tpu import resilience
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.train import als

    def fetch_scalar(x):
        return resilience.fetch_scalar(x)

    def device_time(body, carry0, n_lo=4, n_hi=44, trials=3):
        @partial(jax.jit, static_argnums=(0,))
        def run(n, carry):
            out = lax.fori_loop(0, n, lambda i, c: body(c), carry)
            return jnp.sum(jax.tree_util.tree_leaves(out)[0])

        fetch_scalar(run(n_lo, carry0))
        fetch_scalar(run(n_hi, carry0))
        diffs = []
        for _ in range(trials):
            t0 = time.perf_counter()
            fetch_scalar(run(n_lo, carry0))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch_scalar(run(n_hi, carry0))
            t_hi = time.perf_counter() - t0
            diffs.append((t_hi - t_lo) / (n_hi - n_lo))
        return min(diffs)

    sim = it.simulate_scale(N_ROWS, N_COLS, K, level_counts=LEVELS,
                            noise_std=1.0, seed=0)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    problem = als.build_problem(
        split.data, sim.confounder, split.train_indicator,
        split.test_indicator, masked=True,
    )
    arrays, statics = problem.arrays, problem.statics
    hy = als.Hypers(jnp.float32(LAMBDA), jnp.float32(LAMBDA),
                    jnp.float32(ALPHA))

    def settled_state(ss, sub_tol):
        st = init_state(jax.random.PRNGKey(0), problem.n_levels, N_COLS, K)
        st = als._run_steps(arrays, statics, ss, hy, st, sub_tol,
                            jnp.int32(12))
        fetch_scalar(jnp.sum(st.column_factor))
        return st

    results = {}
    # Each distinct static config costs a fresh ~10 min remote compile of
    # the full-iteration program (the persistent cache only helps reruns),
    # so the grid is the minimal attribution set: default, minimal caps
    # (isolates the solver's in-loop convergence work the way
    # profile_iter does), polish-only, and cd.
    grid = [
        ("fss o48 p32 (default)", dict(max_fss_outer=48,
                                       max_fss_polish_sweeps=32)),
        ("fss o1  p1", dict(max_fss_outer=1, max_fss_polish_sweeps=1)),
        ("fss o48 p1", dict(max_fss_outer=48, max_fss_polish_sweeps=1)),
        ("cd  (packed)", dict(col_solver="cd")),
    ]
    sub_tol = jnp.float32(1e-5)
    for name, kw in grid:
        cfg = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                        alpha=ALPHA, masked=True, **kw)
        ss = als.StepStatics.from_config(cfg)
        st = settled_state(ss, sub_tol)
        n_hi = 24 if kw.get("col_solver") == "cd" else 44
        dt = device_time(
            lambda s, ss=ss: als._als_iteration(arrays, statics, ss, hy, s,
                                                sub_tol),
            st, n_hi=n_hi)
        results[name] = dt * 1e3
        print(f"{name:<28} {dt * 1e3:8.3f} ms/iter", flush=True)

    # fit-regime decay sweep on the default config (VERDICT r4 weak #4)
    cfg = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                    alpha=ALPHA, masked=True)
    ss = als.StepStatics.from_config(cfg)
    for decay in (1.0, 0.1, 0.01):
        stol = jnp.float32(1e-5 * decay)
        st = settled_state(ss, stol)
        dt = device_time(
            lambda s, ss=ss, stol=stol: als._als_iteration(
                arrays, statics, ss, hy, s, stol),
            st)
        results[f"fss decay={decay}"] = dt * 1e3
        print(f"{'fss decay=' + str(decay):<28} {dt * 1e3:8.3f} ms/iter",
              flush=True)

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
