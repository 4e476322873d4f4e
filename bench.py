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

Methodology (VERDICT r1 #7): both column solvers are timed — "fss" (the
default exact active-set kernel) and "cd" (the reference's strong-rule
coordinate descent) — and each is first warmed into its *converged* regime
by running the driver's actual convergence protocol (sub_tol decay ladder,
10-iter check cadence) until the relative loss delta falls below 1e-7, so
steady-state sweep/outer-step counts are honest.  The JSON line carries the
analytic per-iteration FLOP and HBM-byte accounting and the resulting
speed-of-light fraction (sol_frac = roofline lower bound / measured time)
for the primary (fss) number.

Resilience (VERDICT r3 #1): every device->host fetch goes through
insider_tpu.resilience (bounded-backoff retries); each solver's whole
measurement runs under run_resilient, which resets the XLA client and
rebuilds the problem from cached host data on a transient backend error.
On final failure the JSON line still carries whatever was measured plus the
error — the bench never exits nonzero for a backend blip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
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
# 200 iters per timed dispatch: the tunnel's ~30 ms dispatch+fetch
# round-trip amortizes to ~0.15 ms/iter (at 30 iters it added ~1 ms/iter
# of pure transport latency to the reported steady state).
TIMED_ITERS = 200
MAX_WARM_CHUNKS = 20          # x check_every iterations
WARM_REL_DELTA = 1e-7

# Roofline peaks (TPU v5e / v5 lite spec; override via env for other chips).
# MXU work is accounted in bf16 PASS-flops against the bf16 peak: an f32
# HIGHEST matmul costs 6 passes, a per-operand (HIGHEST, DEFAULT) matmul
# whose 0/1 operand is exact in bf16 costs 3, a DEFAULT matmul 1.
# (tools/profile_iter.py measures the *achieved* peaks; spec peaks keep the
# bound a true speed of light.)
HBM_GBPS = float(os.environ.get("INSIDER_BENCH_HBM_GBPS", 819.0))
BF16_TFLOPS = float(os.environ.get("INSIDER_BENCH_BF16_TFLOPS", 197.0))


def iteration_accounting(n_cfd_levels=LEVELS, n=N_ROWS, m=N_COLS, k=K):
    """Analytic MXU pass-FLOP and HBM-byte lower bounds of one masked ALS
    iteration (fast row path + column gram + solver kernel + eval/10).

    Pass-flops count the dense matmuls x their bf16 pass multiplier (the MXU
    work); the in-VMEM solver sweeps are VPU work excluded from the bound
    (they make the bound conservative).  Bytes count each (N, M)-scale array
    once per producing/consuming op.
    """
    nm4 = n * m * 4.0
    flops = 0.0
    bytes_ = 0.0
    for L in n_cfd_levels:
        flops += 2.0 * n * k * m * 6        # P = R_minus @ F (HIGHEST)
        flops += 2.0 * L * n * m * 3        # T = E^T @ (W .* P) (exact-0/1)
        flops += 2.0 * L * m * k * k * 6    # level grams (batched) (HIGHEST)
        flops += 2.0 * L * m * k * 6        # Xty (HIGHEST)
        bytes_ += 3.0 * nm4                 # P write+read, mask read
    # column update: gram (K^2,N)@(N,M) exact-0/1, Xty (K,N)@(N,M) HIGHEST
    flops += 2.0 * k * k * n * m * 3
    flops += 2.0 * k * n * m * 6
    bytes_ += 2.0 * nm4                     # mask read, wx read
    bytes_ += 2.0 * (k * k + 2 * k) * m * 4.0   # gram/xty write + kernel read
    # evaluate every 10 iters: predict + masked reductions
    flops += 2.0 * n * k * m * 6 / 10.0
    bytes_ += 3.0 * nm4 / 10.0
    return flops, bytes_


def _sync(x) -> float:
    """Force a real device sync: on the axon remote backend,
    block_until_ready can return before execution completes for donated
    buffers; a scalar transfer cannot.  Retried on transient errors."""
    import jax.numpy as jnp

    from insider_tpu import resilience

    return resilience.fetch_scalar(jnp.sum(x))


_HOST_CACHE = {}


def build_host():
    """Host-side data (numpy): generated once, survives backend resets."""
    if "host" not in _HOST_CACHE:
        import insider_tpu as it

        sim = it.simulate_scale(N_ROWS, N_COLS, K, level_counts=LEVELS,
                                noise_std=1.0, seed=0)
        split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                                  rm_na_col=False)
        _HOST_CACHE["host"] = (split.data, sim.confounder,
                               split.train_indicator, split.test_indicator)
    return _HOST_CACHE["host"]


def build():
    import jax

    # Persistent compilation cache: the flagship program takes minutes to
    # compile over the remote-compile tunnel; cache it across runs (and
    # across backend resets after a transient error).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from insider_tpu.train import als

    data, confounder, train_ind, test_ind = build_host()
    problem = als.build_problem(data, confounder, train_ind, test_ind,
                                masked=True)
    nnz = int(np.asarray(train_ind).sum())
    return problem, nnz


def run_solver(problem, solver: str):
    """Warm to the converged regime under the driver's protocol, then time
    TIMED_ITERS at the settled decay.  Returns (sec_per_iter, detail)."""
    import jax
    import jax.numpy as jnp

    from insider_tpu import resilience
    from insider_tpu.config import FitConfig, decay_from_delta_loss
    from insider_tpu.model.state import init_state
    from insider_tpu.ops import losses
    from insider_tpu.train import als

    config = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                       alpha=ALPHA, masked=True, col_solver=solver)
    state = init_state(jax.random.PRNGKey(0), problem.n_levels, N_COLS, K)
    ss = als.StepStatics.from_config(config)
    hy = als.Hypers(jnp.float32(LAMBDA), jnp.float32(LAMBDA),
                    jnp.float32(ALPHA))
    arrays, statics = problem.arrays, problem.statics

    def loss_of(st):
        # ONE packed transfer (not 12 scalar pulls), retried on transient
        # backend errors — the exact fetch BENCH_r03 died on.
        ev, reg = als._evaluate(arrays, statics, st)
        vec = resilience.fetch(losses.pack_metrics(ev, reg))
        return losses.finalize_metrics_vec(vec, LAMBDA, LAMBDA, ALPHA,
                                           True)["loss"]

    # --- warm into the converged regime (the driver's own protocol) ---
    decay = 1.0
    loss = loss_of(state)
    chunks = 0
    for _ in range(MAX_WARM_CHUNKS):
        sub_tol = jnp.float32(config.sub_tol * decay)
        state = als._run_steps(arrays, statics, ss, hy, state, sub_tol,
                               jnp.int32(config.check_every))
        pre, loss = loss, loss_of(state)
        delta = pre - loss
        decay = decay_from_delta_loss(delta)
        chunks += 1
        if abs(delta) / max(abs(pre), 1e-30) < WARM_REL_DELTA:
            break
    _sync(state.column_factor)

    sub_tol = jnp.float32(config.sub_tol * decay)
    t0 = time.perf_counter()
    state = als._run_steps(arrays, statics, ss, hy, state, sub_tol,
                           jnp.int32(TIMED_ITERS))
    _sync(state.column_factor)
    dt = (time.perf_counter() - t0) / TIMED_ITERS

    # --- fit-regime figure (ADVICE r2): the regime a real fit lives in —
    # decay <= 0.1 (tighter inner solves) INCLUDING the every-10-iter eval
    # boundary, measured through the REAL driver path: the on-device
    # boundary chain (round 5 — the ladder/stop run between boundaries
    # without a host round-trip; one metrics transfer per
    # boundaries_per_dispatch boundaries).  The primary number above is
    # the kernel steady state at the settled decay. ---
    fit_decay = min(decay, 0.1)
    n_per = config.check_every
    bpd = config.boundaries_per_dispatch
    n_disp = 2

    def dispatch(st, cur_loss):
        pre_pair = jnp.asarray(
            [np.float32(cur_loss),
             np.float32(cur_loss - np.float64(np.float32(cur_loss)))],
            jnp.float32)
        st, mbuf, flags = als._run_boundary_chain(
            arrays, statics, ss, hy, st, jnp.float32(config.sub_tol),
            jnp.float32(fit_decay), pre_pair,
            (bpd, n_per, 0.0))
        mb = resilience.fetch(mbuf)
        m = losses.finalize_metrics_vec(mb[-1, :12], LAMBDA, LAMBDA, ALPHA,
                                        True)
        return st, m["loss"]

    cur = loss_of(state)
    state, cur = dispatch(state, cur)   # warm/compile at this decay
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, cur = dispatch(state, cur)
    fit_dt = (time.perf_counter() - t0) / (n_disp * bpd * n_per)
    return dt, {"warm_iters": chunks * 10, "decay": decay,
                "fit_regime_sec_per_iter": fit_dt,
                "fit_regime_decay": fit_decay,
                "fit_regime_boundaries_per_dispatch": bpd}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", choices=["fss", "cd", "both"],
                    default="both")
    ap.add_argument("--attempts", type=int, default=3,
                    help="retries per solver on transient backend errors")
    args = ap.parse_args()

    from insider_tpu import resilience

    blocks = len(LEVELS) + 1
    flops, bytes_ = iteration_accounting()
    sol_s = max(bytes_ / (HBM_GBPS * 1e9), flops / (BF16_TFLOPS * 1e12))

    solvers = ["fss", "cd"] if args.solver == "both" else [args.solver]
    per_solver = {}
    errors = {}
    nnz = None
    for s in solvers:

        def attempt(s=s):
            # Self-contained: rebuilds device arrays from cached host data,
            # so a backend reset between attempts cannot strand it.
            problem, nnz = build()
            dt, det = run_solver(problem, s)
            return dt, det, nnz

        try:
            dt, det, nnz = resilience.run_resilient(
                attempt, attempts=args.attempts)
        except Exception as e:  # noqa: BLE001 — record, keep benching
            errors[s] = f"{type(e).__name__}: {e}"
            continue
        per_solver[s] = {
            "sec_per_iter": dt,
            "nnz_per_s": blocks * nnz / dt,
            "sol_frac": sol_s / dt,
            **det,
        }

    primary = per_solver.get("fss") or (
        per_solver[next(iter(per_solver))] if per_solver else None)
    nnz_per_s = primary["nnz_per_s"] if primary else 0.0

    vs_baseline = 1.0
    if primary and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["value"]
        vs_baseline = nnz_per_s / base

    try:
        import jax

        device = str(jax.devices()[0])
    except Exception as e:  # noqa: BLE001
        device = f"unavailable ({type(e).__name__})"

    out = {
        "metric": "factor_update_nnz_per_s",
        "value": nnz_per_s,
        "unit": "nnz/s/chip",
        "vs_baseline": round(vs_baseline, 4),
        "detail": {
            "config": f"{N_ROWS}x{N_COLS} K={K} levels={LEVELS} "
                      f"lambda={LAMBDA} alpha={ALPHA} masked 10%",
            "train_nnz": nnz,
            "device": device,
            "iter_pass_gflop": flops / 1e9,
            "iter_hbm_gb": bytes_ / 1e9,
            "sol_ms": sol_s * 1e3,
            "roofline": {"hbm_gbps": HBM_GBPS, "bf16_tflops": BF16_TFLOPS},
            "solvers": per_solver,
        },
    }
    if errors:
        out["detail"]["errors"] = errors
    swallowed = resilience.get_swallowed()
    if swallowed:
        # every transiently-retried error, with traceback — so a real
        # regression reclassified as a blip is still visible (ADVICE r4)
        out["detail"]["retried_transient_errors"] = swallowed
    print(json.dumps(out))
    # A backend blip must not zero the round's perf record: partial results
    # still exit 0 (the error detail says what failed).  Only a run with NO
    # measurements at all is a failure.
    sys.exit(0 if per_solver else 1)


if __name__ == "__main__":
    main()
