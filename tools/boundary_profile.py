"""Measure one check boundary (check_every iters + eval) end-to-end in the
fit regime (VERDICT r2 missing #2): where do the ~93 ms/iter of PARITY_r02
wall time go, vs the ~5.4 ms/iter bench steady state?

Breaks a boundary into:
  * run_steps(10)   — the jitted 10-iteration chunk, device wall
  * evaluate        — the separate eval program, device wall
  * host            — finalize_loss + decay + logging + dispatch overhead

at decay in {1.0, 0.1, 0.01, 1e-6} (the fit regime spends its life at
<= 0.1; PARITY_r02.jsonl shows decay 0.1 at iter 2000).

Usage: python tools/boundary_profile.py [--solver fss|cd]
Writes JSON to stdout.
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
LEVELS = (2, 8, 107)
LAMBDA, ALPHA = 11.0, 0.4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="fss")
    ap.add_argument("--warm-chunks", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import insider_tpu as it
    from insider_tpu.api import build_interaction_codes
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.train import als

    sim = it.simulate_scale(N_ROWS, N_COLS, K, level_counts=LEVELS,
                            noise_std=1.0, seed=0)
    conf = sim.confounder
    inter = build_interaction_codes(conf, [0, 1])
    conf_full = np.column_stack([conf[:, 0], inter, conf[:, 1:]])
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    problem = als.build_problem(
        split.data, conf_full, split.train_indicator, split.test_indicator,
        masked=True)

    cfg = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA, alpha=ALPHA,
                    masked=True, col_solver=args.solver, seed=0)
    state = init_state(jax.random.PRNGKey(0), problem.n_levels, N_COLS, K)
    arrays, statics = problem.arrays, problem.statics
    step_statics = als.StepStatics.from_config(cfg)
    hypers = als.Hypers(jnp.float32(LAMBDA), jnp.float32(LAMBDA),
                        jnp.float32(ALPHA))

    # Warm into the converged-ish regime so the inner while_loops behave like
    # the fit regime, not the first transient iterations.
    for _ in range(args.warm_chunks):
        state = als._run_steps(arrays, statics, step_statics, hypers, state,
                               jnp.float32(cfg.sub_tol), jnp.int32(10))
    jax.block_until_ready(state.column_factor)

    out = {"solver": args.solver, "device": str(jax.devices()[0]),
           "boundaries": {}}
    for decay in (1.0, 0.1, 0.01, 1e-6):
        sub = jnp.float32(cfg.sub_tol * decay)
        # run_steps(10) wall (keep state evolving: measure reps successive
        # chunks, report median)
        t_steps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state = als._run_steps(arrays, statics, step_statics, hypers,
                                   state, sub, jnp.int32(10))
            jax.block_until_ready(state.column_factor)
            t_steps.append(time.perf_counter() - t0)
        # eval device wall
        t_eval = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ev, reg = als._evaluate(arrays, statics, state)
            jax.block_until_ready(ev.train_sse[0])
            t_eval.append(time.perf_counter() - t0)
        # host finalize
        from insider_tpu.ops import losses as L
        t0 = time.perf_counter()
        for _ in range(args.reps):
            L.finalize_loss(ev, reg, LAMBDA, LAMBDA, ALPHA, True)
        t_host = (time.perf_counter() - t0) / args.reps
        # fused path: one dispatch + one packed transfer + host finalize —
        # exactly what the driver now does per boundary
        t_fused = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, metrics = als._run_steps_eval(
                arrays, statics, step_statics, hypers, state, sub,
                jnp.int32(10))
            L.finalize_metrics_vec(np.asarray(metrics), LAMBDA, LAMBDA,
                                   ALPHA, True)
            t_fused.append(time.perf_counter() - t0)
        out["boundaries"][str(decay)] = {
            "run_steps10_s": float(np.median(t_steps)),
            "eval_s": float(np.median(t_eval)),
            "host_finalize_s": t_host,
            "per_iter_ms": float(np.median(t_steps) + np.median(t_eval))
            / 10 * 1e3,
            "fused_boundary_s": float(np.median(t_fused)),
            "fused_per_iter_ms": float(np.median(t_fused)) / 10 * 1e3,
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
