"""Standalone FSS-kernel timing from an in-loop-like state.

The full-iteration grid (tools/solver_bench.py) showed the fss iteration is
outer-step-bound.  This probe times ONLY the gram-fused FSS kernel, warm
started from a settled ALS state that was then perturbed by half an ALS
iteration (the row updates) — exactly the subproblem the in-loop solver
sees — across column-block sizes and outer caps.  Block size trades
per-outer cost (linear in BM) against early-exit granularity (a block runs
until its SLOWEST column converges); the cap trades exact solves against
polish mop-up.

Usage: python tools/fss_block_probe.py
"""

from __future__ import annotations

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
    from insider_tpu.kernels.fss_pallas import feature_sign_fused_pallas
    from insider_tpu.model.state import InsiderState, init_state
    from insider_tpu.train import als

    fetch_scalar = resilience.fetch_scalar

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
    cfg = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                    alpha=ALPHA, masked=True)
    ss = als.StepStatics.from_config(cfg)
    hy = als.Hypers(jnp.float32(LAMBDA), jnp.float32(LAMBDA),
                    jnp.float32(ALPHA))
    sub_tol = jnp.float32(1e-5)

    st = init_state(jax.random.PRNGKey(0), problem.n_levels, N_COLS, K)
    st = als._run_steps(arrays, statics, ss, hy, st, sub_tol, jnp.int32(12))
    fetch_scalar(jnp.sum(st.column_factor))

    # The in-loop subproblem: the kernel call of the NEXT iteration, i.e.
    # the row factor after that iteration's row updates with the previous
    # F as warm start.  One more full iteration gives exactly that R via
    # _row_factor on its output state paired with the pre-iteration F.
    st2 = als._als_iteration(arrays, statics, ss, hy,
                             jax.tree_util.tree_map(lambda x: x, st),
                             sub_tol)
    R = als._row_factor(arrays, st2)
    F_warm = st.column_factor
    mask = arrays.train_mask
    data = arrays.data
    jax.block_until_ready(R)

    for block in (1024, 512, 256):
        for max_outer, polish in ((48, 32), (12, 32), (6, 32)):
            def body(beta, block=block, max_outer=max_outer, polish=polish):
                out = feature_sign_fused_pallas(
                    mask, data, R, beta, LAMBDA, ALPHA, max_outer,
                    block=block, polish_sweeps=polish, tol=sub_tol)
                # re-feed the warm start so every call solves the same
                # subproblem (not a fixed point)
                return 0.5 * F_warm + 0.5 * out

            dt = device_time(body, F_warm, n_lo=4, n_hi=24)
            print(f"block={block:<5} outer<={max_outer:<3} polish<={polish:<3}"
                  f" {dt * 1e3:8.3f} ms/solve", flush=True)


if __name__ == "__main__":
    main()
