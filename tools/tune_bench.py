"""Hardware benchmark of the device-batched tuning sweep (VERDICT r4 #7).

Runs the reference's stage-2 regularization grid (R/insider.R:145-173
semantics: fresh init per point, tuning_iter boundaries, test-RMSE
selection) on the attached TPU three ways:

  * serial_pallas — one optimize-style run per grid point with the Pallas
    kernels (the best serial path on this hardware);
  * serial_jnp   — the same loop on the jnp op path (the serial cost
    without kernels — the honest baseline for the batching claim);
  * batched_jnp  — the whole grid as ONE vmapped program
    (tune/batched.run_batched_trials; kernels are not vmap-batchable, so
    the batched path is jnp by construction).

Two scenarios settle the batched tuner's regime with evidence:

  * flagship — 377 x 44477, 8 grid points: the r4 negative result (vmap
    materializes G copies of every (N, M) intermediate; serial+Pallas
    wins by a wide margin).
  * many_small — 377 x 5000 (the README.md:30 example shape), 64 grid
    points: the regime the batched path was built for — each trial is
    dominated by dispatch + boundary latency serially, while one vmapped
    program runs all 64 together.

All paths must select the same best (lambda, alpha) and agree on per-point
test RMSE to vectorization-order noise.  Writes TUNE_r05.json.

Usage:  python tools/tune_bench.py [--out TUNE_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 24
LEVELS = (2, 16, 8, 107)
TUNING_ITER = 30
GLOBAL_TOL = 1e-10
SUB_TOL = 1e-5

SCENARIOS = {
    "flagship": dict(
        n_rows=377, n_cols=44477,
        grid=[(l, a) for l in (6.0, 11.0, 16.0, 21.0) for a in (0.3, 0.4)],
    ),
    "many_small": dict(
        n_rows=377, n_cols=5000,
        grid=[(l, a) for l in (2.0, 5.0, 8.0, 11.0, 14.0, 17.0, 20.0, 23.0)
              for a in (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)],
    ),
}


def build_problem(n_rows, n_cols):
    import insider_tpu as it
    from insider_tpu.train import als

    sim = it.simulate_scale(n_rows, n_cols, K, level_counts=LEVELS,
                            noise_std=1.0, seed=0)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    return als.build_problem(split.data, sim.confounder,
                             split.train_indicator, split.test_indicator,
                             masked=True)


def run_serial(problem, grid, seeds, use_pallas: bool):
    """The reference's serial loop (R/insider.R:147-173): one full
    convergence-protocol run per grid point, fresh init per point (via
    als.optimize, which chains boundaries on device)."""
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.train import als

    import jax

    n_cols = problem.shape[1]
    results = []
    for (lam, alpha), seed in zip(grid, seeds):
        cfg = FitConfig(latent_dim=K, lambda1=lam, lambda2=lam, alpha=alpha,
                        masked=True, use_pallas=use_pallas,
                        max_iter=TUNING_ITER, global_tol=GLOBAL_TOL,
                        sub_tol=SUB_TOL)
        state = init_state(jax.random.PRNGKey(seed), problem.n_levels,
                           n_cols, K)
        res = als.optimize(problem, cfg, state=state, verbose=False)
        results.append({"lambda": lam, "alpha": alpha,
                        "test_rmse": res.test_rmse, "loss": res.loss})
    return results


def run_batched(problem, grid, seeds):
    from insider_tpu.tune.batched import run_batched_trials

    return run_batched_trials(problem, K, grid, TUNING_ITER, GLOBAL_TOL,
                              SUB_TOL, seeds)


def run_scenario(name, spec):
    import jax

    grid = spec["grid"]
    seeds = list(range(len(grid)))
    problem = build_problem(spec["n_rows"], spec["n_cols"])

    timings, outputs = {}, {}
    for pname, fn in (
        ("serial_pallas", lambda: run_serial(problem, grid, seeds, True)),
        ("serial_jnp", lambda: run_serial(problem, grid, seeds, False)),
        ("batched_jnp", lambda: run_batched(problem, grid, seeds)),
    ):
        fn()                       # warm-up: compile everything
        t0 = time.perf_counter()
        outputs[pname] = fn()
        timings[pname] = time.perf_counter() - t0

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
    return {
        "config": f"{spec['n_rows']}x{spec['n_cols']} K={K} levels={LEVELS} "
                  f"masked 10%, {len(grid)} grid points, "
                  f"tuning_iter={TUNING_ITER}",
        "wall_s": timings,
        "speedup_batched_vs_serial_jnp":
            timings["serial_jnp"] / timings["batched_jnp"],
        "speedup_batched_vs_serial_pallas":
            timings["serial_pallas"] / timings["batched_jnp"],
        "best_point": {k: list(v) for k, v in bests.items()},
        "same_selection": len(set(bests.values())) == 1,
        "worst_rel_test_rmse_gap_batched_vs_serial_jnp": worst_gap,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TUNE_r05.json")
    ap.add_argument("--scenario", default=None,
                    help="run only this scenario")
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    out = {"device": str(jax.devices()[0]), "scenarios": {}}
    for name, spec in SCENARIOS.items():
        if args.scenario and name != args.scenario:
            continue
        out["scenarios"][name] = run_scenario(name, spec)
        print(json.dumps({name: out["scenarios"][name]}), file=sys.stderr,
              flush=True)

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
