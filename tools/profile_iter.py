"""Per-component timing of one ALS iteration on the current backend.

Breaks the flagship bench config (377 x 44477, K=24, 4 confounders, masked)
into its constituent device programs and times each in steady state, printing
a speed-of-light table: measured time vs the HBM-bandwidth and MXU-FLOPs
lower bounds.  This is the profiling subsystem the reference lacks
(SURVEY.md §5, tracing row) applied to kernel accounting; `optimize(...,
profile_dir=...)` captures full XLA traces for timeline analysis.

Usage:  python tools/profile_iter.py [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROWS, N_COLS, K = 377, 44477, 24
LEVELS = (2, 16, 8, 107)
LAMBDA, ALPHA = 11.0, 0.4
REPS = 30

# TPU v5e (v5 lite) peaks; adjust per target chip.
HBM_GBPS = 819.0
F32_TFLOPS = 49.0   # MXU f32 (HIGHEST precision ~= bf16_6x path)


def timeit(fn, *args, reps=REPS):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import insider_tpu as it
    from insider_tpu.config import FitConfig
    from insider_tpu.kernels.cd_pallas import elastic_net_cd_pallas
    from insider_tpu.model.state import init_state
    from insider_tpu.ops import col_update, row_update
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
    sub_tol = jnp.float32(1e-5)
    arrays, statics = problem.arrays, problem.statics

    # Settle into steady state (warm CD sweeps counts).
    state = als._run_steps(arrays, statics, ss, hy, state, sub_tol,
                           jnp.int32(12))
    jax.block_until_ready(state.column_factor)

    NM4 = N_ROWS * N_COLS * 4e-9          # GB of one (N, M) f32
    rows = []

    def row(name, dt, gb, gflop):
        bound = max(gb / HBM_GBPS, gflop / (F32_TFLOPS * 1e3))
        rows.append({
            "component": name, "ms": dt * 1e3, "hbm_gb": gb,
            "gflop": gflop, "sol_ms": bound * 1e3,
            "sol_frac": bound / dt if dt > 0 else 0.0,
        })

    # --- full iteration ---
    @jax.jit
    def one_iter(st):
        return als._als_iteration(arrays, statics, ss, hy, st, sub_tol)

    dt, _ = timeit(one_iter, state)
    total_gb = 0.0
    row("FULL_ITERATION", dt, 0.0, 0.0)

    # --- row updates (all 4 confounders, fast path) ---
    @jax.jit
    def rows_only(st):
        F = st.column_factor
        mask = arrays.train_mask
        R = als._row_factor(arrays, st)
        pre = arrays.pre
        out = []
        for v in range(len(arrays.codes)):
            R_minus = R - st.cfd_factors[v][arrays.codes[v]]
            V = row_update.update_row_factor_masked_fast(
                pre.e[v], pre.mw[v], pre.d[v], mask, R_minus, F, hy.lam1)
            out.append(V)
            R = R_minus + V[arrays.codes[v]]
        return out

    dt_rows, _ = timeit(rows_only, state)
    # per confounder: P write+read (2), mask read, mw/e reads small, Lgram
    gb = len(LEVELS) * 3 * NM4
    L = sum(LEVELS)
    gflop = 2e-9 * (len(LEVELS) * N_ROWS * N_COLS * K       # P = R_minus @ F
                    + L * N_ROWS * N_COLS / len(LEVELS) * len(LEVELS)  # E^T
                    + L * N_COLS * K * K)                   # level grams
    row("row_updates_x4", dt_rows, gb, gflop)

    # --- column gram build ---
    R = als._row_factor(arrays, state)
    mask = arrays.train_mask

    @jax.jit
    def gram_build(Rv):
        XtXt = col_update.col_gram_masked_t(Rv, mask)
        Xty = jnp.matmul(Rv.T, arrays.pre.wx,
                         precision=jax.lax.Precision.HIGHEST)
        return XtXt, Xty

    dt_g, (XtXt, Xty) = timeit(gram_build, R)
    gb_g = NM4 + (K * K + K) * N_COLS * 4e-9
    gflop_g = 2e-9 * (K * K * N_ROWS * N_COLS + K * N_ROWS * N_COLS)
    row("col_gram_build", dt_g, gb_g, gflop_g)

    # --- CD kernel alone (warm beta) ---
    beta0 = state.column_factor

    def cd_only(xt, xy, b0):
        return elastic_net_cd_pallas(xt, xy, b0, LAMBDA, ALPHA, sub_tol, 200)

    dt_cd, _ = timeit(cd_only, XtXt, Xty, beta0)
    gb_cd = (K * K + 3 * K) * N_COLS * 4e-9
    row("cd_kernel", dt_cd, gb_cd, 0.0)

    # --- evaluate (amortized /10 in the driver) ---
    @jax.jit
    def ev(st):
        return als._evaluate(arrays, statics, st)

    dt_ev, _ = timeit(ev, state)
    row("evaluate(/10)", dt_ev, 3 * NM4, 2e-9 * N_ROWS * N_COLS * K)

    accounted = dt_rows + dt_g + dt_cd
    rows.append({"component": "accounted(rows+gram+cd)", "ms": accounted * 1e3,
                 "hbm_gb": 0, "gflop": 0, "sol_ms": 0, "sol_frac": 0})

    if args.json:
        print(json.dumps(rows))
    else:
        print(f"device={jax.devices()[0]}  config={N_ROWS}x{N_COLS} K={K} "
              f"levels={LEVELS}")
        print(f"{'component':<28}{'ms':>9}{'HBM GB':>9}{'GFLOP':>9}"
              f"{'SoL ms':>9}{'SoL %':>7}")
        for r in rows:
            print(f"{r['component']:<28}{r['ms']:>9.3f}{r['hbm_gb']:>9.3f}"
                  f"{r['gflop']:>9.2f}{r['sol_ms']:>9.3f}"
                  f"{100 * r['sol_frac']:>6.1f}%")


if __name__ == "__main__":
    main()
