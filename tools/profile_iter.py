"""Per-component device timing of one ALS iteration + measured rooflines.

Breaks the flagship bench config (377 x 44477, K=24, 4 confounders, masked)
into its constituent device programs and times each with the only methodology
that is sound on this backend: an in-jit `lax.fori_loop` of the component
with a data dependency between repetitions, differenced between two
repetition counts, synced by a scalar fetch.  (Naive per-dispatch timing with
`block_until_ready` is wildly wrong over the remote axon tunnel — queued
work is not awaited — and XLA will narrow a matmul whose output is only
partially consumed, so each body feeds a full reduction of its output back
into the carry.)

Also measures the chip's ACHIEVED peaks (4096^3 matmul per precision class,
big-array copy bandwidth) so the speed-of-light column uses real ceilings,
and accounts MXU work in bf16 PASS-flops: an f32 HIGHEST matmul costs 6
bf16 passes, a per-operand (HIGHEST, DEFAULT) matmul against an exact-bf16
0/1 operand costs 3, a DEFAULT matmul 1.  This is the profiling subsystem
the reference lacks (SURVEY.md §5, tracing row); `optimize(...,
profile_dir=...)` captures full XLA traces for timeline analysis.

Usage:  python tools/profile_iter.py [--json] [--out PROFILE.json]
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

# bf16 MXU pass cost of each precision class (TPU).
PASSES = {"HIGHEST": 6, "EXACT01": 3, "HIGH": 3, "DEFAULT": 1}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", default=None, help="write JSON to this path")
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
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.ops import col_update, row_update
    from insider_tpu.train import als

    HI = lax.Precision.HIGHEST

    def device_time(body, carry0, n_lo=6, n_hi=54):
        """Per-call device seconds of body(carry)->carry via fori_loop
        differencing; the caller must make each call consume the previous
        call's result."""

        @partial(jax.jit, static_argnums=(0,))
        def run(n, carry):
            out = lax.fori_loop(0, n, lambda i, c: body(c), carry)
            return jnp.sum(jax.tree_util.tree_leaves(out)[0])

        float(run(n_lo, carry0))
        float(run(n_hi, carry0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(n_lo, carry0))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(n_hi, carry0))
            t_hi = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        return best

    # --- measured chip peaks ---
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32) * 0.01
    dt = device_time(lambda c: jnp.matmul(c, c, precision=HI) * 1e-2, A,
                     n_lo=2, n_hi=14)
    peak_highest = 2 * 4096**3 / dt
    dt = device_time(lambda c: jnp.matmul(c, c) * 1e-2, A, n_lo=2, n_hi=14)
    peak_default = 2 * 4096**3 / dt
    X8 = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.float32)
    dt = device_time(lambda c: c * 1.0000001, X8, n_lo=4, n_hi=36)
    hbm_gbps = 2 * X8.size * 4 / dt / 1e9
    bf16_peak = peak_default  # pass rate for the pass-flop accounting

    # --- flagship problem ---
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
    ss_cd = als.StepStatics.from_config(
        FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA, alpha=ALPHA,
                  masked=True, col_solver="cd"))
    hy = als.Hypers(jnp.float32(LAMBDA), jnp.float32(LAMBDA),
                    jnp.float32(ALPHA))
    sub_tol = jnp.float32(1e-5)
    arrays, statics = problem.arrays, problem.statics

    # settle into steady state (warm sweep counts)
    state = als._run_steps(arrays, statics, ss, hy, state, sub_tol,
                           jnp.int32(12))
    float(jnp.sum(state.column_factor))

    mask = arrays.train_mask
    L_TOT = sum(LEVELS)
    NM = N_ROWS * N_COLS
    rows = []

    def row(name, dt, gb, pass_gflop):
        bound = max(gb / hbm_gbps, pass_gflop * 1e9 / bf16_peak)
        rows.append({
            "component": name, "ms": dt * 1e3, "hbm_gb": gb,
            "pass_gflop": pass_gflop, "sol_ms": bound * 1e3,
            "sol_frac": bound / dt if dt > 0 else 0.0,
        })

    # --- full iteration (both solvers) ---
    dt_full = device_time(
        lambda st: als._als_iteration(arrays, statics, ss, hy, st, sub_tol),
        state, n_lo=2, n_hi=14)
    dt_full_cd = device_time(
        lambda st: als._als_iteration(arrays, statics, ss_cd, hy, st,
                                      sub_tol),
        state, n_lo=2, n_hi=14)

    # --- row-side block (Gauss-Seidel over 4 confounders, batched grams) ---
    pre = arrays.pre

    def rows_body(st):
        F = st.column_factor
        R = als._row_factor(arrays, st)
        from insider_tpu.ops.row_update import (factor_outer_table,
                                                level_gram_masked)

        mw_cat = jnp.concatenate([pre.mw[v] for v in range(len(LEVELS))], 0)
        xtx_cat = level_gram_masked(mw_cat, F, factor_outer_table(F))
        cfd = list(st.cfd_factors)
        off = 0
        for v in range(len(arrays.codes)):
            R_minus = R - cfd[v][arrays.codes[v]]
            V = row_update.update_row_factor_masked_fast(
                pre.e[v], pre.mw[v], pre.d[v], mask, R_minus, F, hy.lam1,
                xtx=xtx_cat[off:off + LEVELS[v]])
            off += LEVELS[v]
            cfd[v] = V
            R = R_minus + V[arrays.codes[v]]
        from insider_tpu.model.state import InsiderState

        return InsiderState(cfd, st.ctns_factor, F, st.key)

    dt_rows = device_time(rows_body, state, n_lo=4, n_hi=28)
    # 4x [P(N,K,M) 6p + E^T(L,N,M) 3p] + grams (Ltot,M,K^2) 6p + Xty 6p
    pg = 2e-9 * (len(LEVELS) * N_ROWS * K * N_COLS * 6
                 + L_TOT * N_ROWS * N_COLS * 3
                 + L_TOT * N_COLS * K * K * 6
                 + L_TOT * N_COLS * K * 6)
    row("row_block_x4", dt_rows, len(LEVELS) * 3 * NM * 4e-9, pg)

    # --- column gram ((HIGHEST, DEFAULT): exact at 3 passes) + Xty ---
    R0 = als._row_factor(arrays, state)

    def gram_body(R):
        XtXt = col_update.col_gram_masked_t(R, mask)
        Xty = jnp.matmul(R.T, arrays.pre.wx, precision=HI)
        return R * (1.0 + 1e-24 * (jnp.sum(XtXt) + jnp.sum(Xty)))

    dt_g = device_time(gram_body, R0, n_lo=4, n_hi=28)
    row("col_gram+xty", dt_g,
        2 * NM * 4e-9 + (K * K + K) * N_COLS * 4e-9,
        2e-9 * (K * K * N_ROWS * N_COLS * 3 + K * N_ROWS * N_COLS * 6))

    # --- solver kernels alone (steady-state warm start) ---
    XtXt = col_update.col_gram_masked_t(R0, mask)
    Xty0 = jnp.matmul(R0.T, arrays.pre.wx, precision=HI)
    from insider_tpu.kernels.cd_pallas import elastic_net_cd_pallas
    from insider_tpu.kernels.fss_pallas import feature_sign_pallas

    def fss_body(beta):
        out = feature_sign_pallas(XtXt, Xty0, beta, LAMBDA, ALPHA,
                                  ss.max_fss_outer,
                                  polish_sweeps=ss.max_fss_polish_sweeps,
                                  tol=sub_tol)
        return 0.5 * beta + 0.5 * out

    dt_fss = device_time(fss_body, state.column_factor, n_lo=2, n_hi=14)
    kernel_gb = (K * K + 3 * K) * N_COLS * 4e-9
    row("fss_kernel(+polish)", dt_fss, kernel_gb, 0.0)

    def cd_body(beta):
        out = elastic_net_cd_pallas(XtXt, Xty0, beta, LAMBDA, ALPHA, sub_tol,
                                    ss_cd.max_cd_sweeps)
        return 0.5 * beta + 0.5 * out

    dt_cd = device_time(cd_body, state.column_factor, n_lo=2, n_hi=14)
    row("cd_kernel", dt_cd, kernel_gb, 0.0)

    # --- evaluate (amortized /10 in the driver) ---
    def ev_body(st):
        ev, reg = als._evaluate_impl(arrays, statics, st)
        from insider_tpu.model.state import InsiderState

        F = st.column_factor * (1.0 + 1e-24 * ev.train_sse[0])
        return InsiderState(st.cfd_factors, st.ctns_factor, F, st.key)

    dt_ev = device_time(ev_body, state, n_lo=4, n_hi=28)
    row("evaluate(per-call)", dt_ev, 3 * NM * 4e-9,
        2e-9 * N_ROWS * N_COLS * K * 6)

    accounted = dt_rows + dt_g + dt_fss
    out = {
        "device": str(jax.devices()[0]),
        "config": f"{N_ROWS}x{N_COLS} K={K} levels={LEVELS}",
        "measured_peaks": {
            "matmul_highest_tflops": peak_highest / 1e12,
            "matmul_default_bf16_tflops": peak_default / 1e12,
            "copy_gbps_rw": hbm_gbps,
        },
        "full_iteration_ms": {"fss": dt_full * 1e3, "cd": dt_full_cd * 1e3},
        "accounted_ms_fss": accounted * 1e3,
        "components": rows,
        "methodology": "in-jit fori_loop differencing (n_hi-n_lo calls), "
                       "scalar-fetch sync, full-output consumption; "
                       "pass_gflop = matmul flops x bf16 MXU passes "
                       "(HIGHEST=6, exact-0/1-operand=3, DEFAULT=1), "
                       "sol = max(bytes/copy_bw, pass_flops/default_peak)",
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    if args.json:
        print(json.dumps(out))
    else:
        print(f"device={out['device']}  config={out['config']}")
        p = out["measured_peaks"]
        print(f"measured peaks: HIGHEST {p['matmul_highest_tflops']:.1f} "
              f"TFLOP/s, DEFAULT/bf16 {p['matmul_default_bf16_tflops']:.1f} "
              f"TFLOP/s, copy {p['copy_gbps_rw']:.0f} GB/s (r+w)")
        print(f"full iteration: fss {dt_full * 1e3:.3f} ms, "
              f"cd {dt_full_cd * 1e3:.3f} ms; accounted(fss) "
              f"{accounted * 1e3:.3f} ms")
        print(f"{'component':<24}{'ms':>9}{'HBM GB':>9}{'passGF':>9}"
              f"{'SoL ms':>9}{'SoL %':>7}")
        for r in rows:
            print(f"{r['component']:<24}{r['ms']:>9.3f}{r['hbm_gb']:>9.3f}"
                  f"{r['pass_gflop']:>9.2f}{r['sol_ms']:>9.3f}"
                  f"{100 * r['sol_frac']:>6.1f}%")


if __name__ == "__main__":
    main()
