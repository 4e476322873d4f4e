"""Hardware benchmark of the device-batched tuning sweep (VERDICT r3 #7).

Runs the reference's stage-2 regularization grid (R/insider.R:145-173
semantics: fresh init per point, tuning_iter boundaries, test-RMSE
selection) at the flagship ageing shape three ways on the attached TPU:

  * serial_pallas — one optimize-style run per grid point with the Pallas
    kernels (the best serial path on this hardware);
  * serial_jnp   — the same loop on the jnp op path (what the serial loop
    costs without kernels — the honest baseline for the batching claim);
  * batched_jnp  — the whole grid as ONE vmapped program
    (tune/batched.run_batched_trials; kernels are not vmap-batchable, so
    the batched path is jnp by construction).

All three must select the same best (lambda, alpha) and agree on per-point
test RMSE to vectorization-order noise.  Writes TUNE_r04.json with wall
clocks (compile excluded via a warm-up run at identical shapes) and the
speedup matrix.

Measured verdict (committed TUNE_r04.json, v5e): at the flagship shape the
vmapped grid is ~4x SLOWER than the serial jnp loop and ~27x slower than
serial+Pallas — under vmap every (N, M)-scale op materializes G copies and
the sweep becomes HBM-bound, while the serial loop runs the VMEM-resident
fused kernels.  The production tune driver (tune/grid.py -> als.optimize)
therefore keeps the serial+kernels path on TPU; the batched path's regime
is many small trials on CPU/virtual meshes (tests) or future multi-chip
grids with one trial per device group.

Usage:  python tools/tune_bench.py [--out TUNE_r04.json]
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
GRID = [(l, a) for l in (6.0, 11.0, 16.0, 21.0) for a in (0.3, 0.4)]
TUNING_ITER = 30
GLOBAL_TOL = 1e-10
SUB_TOL = 1e-5
SEEDS = list(range(len(GRID)))


def build_problem():
    import insider_tpu as it
    from insider_tpu.train import als

    sim = it.simulate_scale(N_ROWS, N_COLS, K, level_counts=LEVELS,
                            noise_std=1.0, seed=0)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    return als.build_problem(split.data, sim.confounder,
                             split.train_indicator, split.test_indicator,
                             masked=True)


def run_serial(problem, use_pallas: bool):
    """The reference's serial loop (R/insider.R:147-173): one full
    convergence-protocol run per grid point, fresh init per point."""
    import jax
    import jax.numpy as jnp

    from insider_tpu.config import FitConfig, decay_from_delta_loss
    from insider_tpu.model.state import init_state
    from insider_tpu.ops import losses
    from insider_tpu.resilience import fetch
    from insider_tpu.train import als

    arrays, statics = problem.arrays, problem.statics
    results = []
    for (lam, alpha), seed in zip(GRID, SEEDS):
        cfg = FitConfig(latent_dim=K, lambda1=lam, lambda2=lam, alpha=alpha,
                        masked=True, use_pallas=use_pallas)
        ss = als.StepStatics.from_config(cfg)
        hy = als.Hypers(jnp.float32(lam), jnp.float32(lam),
                        jnp.float32(alpha))
        state = init_state(jax.random.PRNGKey(seed), problem.n_levels,
                           N_COLS, K)
        state, metrics = als._run_steps_eval(arrays, statics, ss, hy, state,
                                             jnp.float32(SUB_TOL),
                                             jnp.int32(0))
        m = losses.finalize_metrics_vec(fetch(metrics), lam, lam, alpha,
                                        True)
        loss, decay, it_ = m["loss"], 1.0, 0
        while it_ <= TUNING_ITER:
            boundary = min(it_ if it_ % 10 == 0 else (it_ // 10 + 1) * 10,
                           TUNING_ITER)
            n = boundary - it_ + 1
            state, metrics = als._run_steps_eval(
                arrays, statics, ss, hy, state,
                jnp.float32(SUB_TOL * decay), jnp.int32(n))
            m = losses.finalize_metrics_vec(fetch(metrics), lam, lam, alpha,
                                            True)
            pre, loss = loss, m["loss"]
            decay = decay_from_delta_loss(pre - loss)
            it_ = boundary + 1
            if (pre - loss) / pre < GLOBAL_TOL or boundary >= TUNING_ITER:
                break
        results.append({"lambda": lam, "alpha": alpha,
                        "test_rmse": m["test_rmse"], "loss": loss})
    return results


def run_batched(problem):
    from insider_tpu.tune.batched import run_batched_trials

    return run_batched_trials(problem, K, GRID, TUNING_ITER, GLOBAL_TOL,
                              SUB_TOL, SEEDS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TUNE_r04.json")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    problem = build_problem()

    timings, outputs = {}, {}
    for name, fn in (
        ("serial_pallas", lambda: run_serial(problem, True)),
        ("serial_jnp", lambda: run_serial(problem, False)),
        ("batched_jnp", lambda: run_batched(problem)),
    ):
        fn()                       # warm-up: compile everything
        t0 = time.perf_counter()
        outputs[name] = fn()
        timings[name] = time.perf_counter() - t0

    def best(res):
        i = int(np.nanargmin([r["test_rmse"] for r in res]))
        # round: the batched path echoes hypers through f32 device scalars
        return (round(res[i]["lambda"], 5), round(res[i]["alpha"], 5))

    bests = {k: best(v) for k, v in outputs.items()}
    rmse = {k: [r["test_rmse"] for r in v] for k, v in outputs.items()}
    worst_gap = float(max(
        abs(a - b) / abs(b)
        for a, b in zip(rmse["batched_jnp"], rmse["serial_jnp"])
    ))

    out = {
        "device": str(jax.devices()[0]),
        "config": f"{N_ROWS}x{N_COLS} K={K} levels={LEVELS} masked 10%, "
                  f"grid={GRID}, tuning_iter={TUNING_ITER}",
        "wall_s": timings,
        "speedup_batched_vs_serial_jnp":
            timings["serial_jnp"] / timings["batched_jnp"],
        "speedup_batched_vs_serial_pallas":
            timings["serial_pallas"] / timings["batched_jnp"],
        "best_point": {k: list(v) for k, v in bests.items()},
        "same_selection": len(set(bests.values())) == 1,
        "worst_rel_test_rmse_gap_batched_vs_serial_jnp": worst_gap,
        "per_point_test_rmse": rmse,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
