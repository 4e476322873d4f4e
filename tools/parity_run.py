"""Run-to-convergence parity artifact (SURVEY.md gate M5; VERDICT r1 #2).

Fits the flagship ageing configuration (/root/reference/tests/ageing.R:13-46:
377 samples, confounders pid/sid/did + interaction(pid, sid) -> level
structure (2, 16, 8, 107), K=24, lambda=11, alpha=0.4, global_tol=1e-10,
sub_tol=1e-5, checked every 10 iterations) TO CONVERGENCE on the attached
device, twice: once with col_solver="cd" (the reference's strong-rule
coordinate descent, coordinate_descent.cpp:57-127) and once with
col_solver="fss" (this framework's default exact active-set solver).

The real Allen ageing matrix is an external .RData the reference repo itself
does not ship (.MISSING_LARGE_BLOBS); the artifact therefore runs the
reference's synthetic-generator analog at the full 377 x 44477 shape with a
10% held-out element mask (seed-123 splitter parity, R/utils.R:78-117) — the
masked configuration BASELINE.json names.  R is not installed in this image,
so cd-vs-fss agreement at tol is the standing substitute for R-package
parity: both solvers must reach the same fit (rel <= 1e-5 on loss and RMSE),
and the fitted factor shapes must match the reference's structural contract
(README.md:113-118 scaled to K=24).

Writes PARITY_r02.md (summary table) + PARITY_r02.jsonl (full per-boundary
history of both runs).  tests/test_parity_replay.py replays the same
assertions at reduced scale in CI.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_ROWS, N_COLS, K = 377, 44477, 24
LEVELS = (2, 8, 107)        # pid, sid, did; interaction(pid, sid) -> 16
LAMBDA, ALPHA = 11.0, 0.4
GLOBAL_TOL, SUB_TOL = 1e-10, 1e-5
MAX_ITER = 2000
REL_TOL = 1e-5              # cd-vs-fss agreement requirement


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-prefix", default="PARITY_r02")
    ap.add_argument("--max-iter", type=int, default=MAX_ITER)
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
    from insider_tpu.train import als

    # Ageing-shaped problem: 3 confounders + interaction of the first two
    # inserted as column 2 (R/insider.R:40) -> 4 factor matrices.
    sim = it.simulate_scale(N_ROWS, N_COLS, K, level_counts=LEVELS,
                            noise_std=1.0, seed=0)
    conf = sim.confounder                              # (N, 3)
    from insider_tpu.api import build_interaction_codes

    inter = build_interaction_codes(conf, [0, 1])
    conf_full = np.column_stack([conf[:, 0], inter, conf[:, 1:]])
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    problem = als.build_problem(
        split.data, conf_full, split.train_indicator, split.test_indicator,
        masked=True,
    )
    n_levels = problem.n_levels
    print(f"levels: {n_levels}", file=sys.stderr)

    jsonl_path = args.out_prefix + ".jsonl"
    if os.path.exists(jsonl_path):
        os.remove(jsonl_path)

    results = {}
    for solver in ("cd", "fss"):
        cfg = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                        alpha=ALPHA, masked=True, global_tol=GLOBAL_TOL,
                        sub_tol=SUB_TOL, max_iter=args.max_iter,
                        col_solver=solver, seed=0)
        t0 = time.time()
        with open(jsonl_path, "a") as fh:
            fh.write(json.dumps({"run": solver,
                                 "config": dataclasses.asdict(cfg)}) + "\n")
        res = als.optimize(problem, cfg, log_jsonl=jsonl_path, verbose=False)
        wall = time.time() - t0
        final = res.history[-1]
        results[solver] = {
            "solver": solver,
            "converged": (not res.diverged) and res.n_iter < args.max_iter,
            "iters_to_tol": res.n_iter,
            "wall_s": wall,
            "loss": res.loss,
            "train_rmse": res.train_rmse,
            "test_rmse": res.test_rmse,
            "sum_residual": final["sum_residual"],
            "row_reg_loss": final["row_reg_loss"],
            "col_reg_loss": final["col_reg_loss"],
            "l1_reg_loss": final["l1_reg_loss"],
            "factor_shapes": [list(np.asarray(f).shape)
                              for f in res.row_matrices],
            "column_factor_shape": list(res.column_factor.shape),
            "f_exact_zero_frac": float((res.column_factor == 0).mean()),
        }
        print(json.dumps(results[solver]), file=sys.stderr)

    cd, fss = results["cd"], results["fss"]

    def rel(a, b):
        return abs(a - b) / max(abs(a), abs(b), 1e-30)

    checks = {
        "both_converged": cd["converged"] and fss["converged"],
        "rel_loss": rel(cd["loss"], fss["loss"]),
        "rel_train_rmse": rel(cd["train_rmse"], fss["train_rmse"]),
        "rel_test_rmse": rel(cd["test_rmse"], fss["test_rmse"]),
        # Structural contract (README.md:113-118): one (L_v, K) factor per
        # confounder (interaction in position 2, R/insider.R:40) + (K, M)
        # column factor.  L_v = the data's realized level counts (the
        # random 107-level did assignment realizes 105-107 of them in 377
        # rows).
        "shapes_match_reference": (
            [s[0] for s in cd["factor_shapes"]] == list(n_levels)
            and n_levels[0] == 2 and n_levels[1] == 16 and n_levels[2] == 8
            and n_levels[3] >= 100
            and all(s[1] == K for s in cd["factor_shapes"])
            and cd["column_factor_shape"] == [K, N_COLS]
        ),
    }
    checks["pass"] = bool(
        checks["both_converged"]
        and checks["rel_loss"] <= REL_TOL
        and checks["rel_train_rmse"] <= REL_TOL
        and checks["rel_test_rmse"] <= REL_TOL
        and checks["shapes_match_reference"]
    )

    import jax as _jax

    md = []
    md.append("# PARITY_r02 — ageing config run-to-convergence (gate M5)\n")
    md.append(f"Device: `{_jax.devices()[0]}`; config: 377x44477, "
              f"confounders (pid, interaction, sid, did) = levels "
              f"{tuple(n_levels)}, K={K}, lambda={LAMBDA}, alpha={ALPHA}, "
              f"global_tol={GLOBAL_TOL} checked every 10 iters, "
              f"sub_tol={SUB_TOL} with the reference decay ladder, 10% "
              f"held-out element mask (seed 123).  Synthetic ageing-shaped "
              f"matrix (the real .RData is absent from the reference repo "
              f"too); both solvers fit the identical problem from the "
              f"identical init.\n")
    md.append("| metric | cd (reference algorithm) | fss (default) | rel diff |")
    md.append("|---|---|---|---|")
    for k_ in ("loss", "train_rmse", "test_rmse"):
        md.append(f"| {k_} | {cd[k_]:.10g} | {fss[k_]:.10g} | "
                  f"{rel(cd[k_], fss[k_]):.3g} |")
    md.append(f"| iters_to_tol | {cd['iters_to_tol']} | "
              f"{fss['iters_to_tol']} | — |")
    md.append(f"| wall_s | {cd['wall_s']:.1f} | {fss['wall_s']:.1f} | — |")
    md.append(f"| exact-zero frac of F | {cd['f_exact_zero_frac']:.4f} | "
              f"{fss['f_exact_zero_frac']:.4f} | — |")
    md.append("")
    md.append(f"Loss decomposition (fss): residual/2 = "
              f"{fss['sum_residual'] / 2:.6g}, row_reg = "
              f"{fss['row_reg_loss']:.6g}, col_reg = "
              f"{fss['col_reg_loss']:.6g}, l1 = {fss['l1_reg_loss']:.6g}\n")
    md.append(f"Factor shapes: {cd['factor_shapes']} + column_factor "
              f"{cd['column_factor_shape']} — matches the reference "
              f"structural contract (README.md:113-118 at K=24: interaction "
              f"factor in position 2 per R/insider.R:40).\n")
    md.append(f"## Checks\n\n```json\n{json.dumps(checks, indent=2)}\n```\n")
    md.append(f"Full per-boundary histories: `{jsonl_path}`.  Replayed at "
              f"reduced scale by `tests/test_parity_replay.py`.\n")
    with open(args.out_prefix + ".md", "w") as fh:
        fh.write("\n".join(md))
    print(json.dumps(checks))
    sys.exit(0 if checks["pass"] else 1)


if __name__ == "__main__":
    main()
