"""Shared helpers for the workload scripts.

Each script mirrors one reference workload (tests/*.R, SURVEY.md §2c): load a
table whose leading columns are covariates, log2(x+1)-transform, build the
Insider object with the reference's exact configuration, tune/fit, save
artifacts.  Real datasets are external (the reference repo ships none
either, .MISSING_LARGE_BLOBS); pass --data, or omit it to run the same
configuration on a shape-matched synthetic matrix so every workload is
executable out of the box.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def parse_args(name: str):
    ap = argparse.ArgumentParser(prog=name)
    ap.add_argument("--data", default=None,
                    help=".npz with 'data'+'confounder', or csv/tsv")
    ap.add_argument("--confounder-cols", type=int, default=None)
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--synthetic-cols", type=int, default=2000,
                    help="gene count for the synthetic fallback")
    return ap.parse_args()


def load_or_simulate(args, n_rows, level_counts, latent_dim, log2=True,
                     confounder_cols=None, seed=0):
    import insider_tpu as it

    if args.data:
        from insider_tpu.cli import _load_table

        cols = args.confounder_cols or confounder_cols or len(level_counts)
        data, conf = _load_table(args.data, cols, log2, 0)
        return data, conf
    sim = it.simulate_scale(n_rows, args.synthetic_cols, latent_dim,
                            level_counts=level_counts, seed=seed)
    return sim.data.astype(np.float64), sim.confounder


def save_fitted(obj, out_path: str):
    arrays = {f"factor{i}": f for i, f in enumerate(obj.cfd_matrices)}
    arrays["column_factor"] = obj.column_factor
    np.savez(out_path, **arrays)
    meta = {"test_rmse": obj.test_rmse, "loss": obj.fit_result.loss,
            "n_iter": obj.fit_result.n_iter}
    with open(out_path + ".json", "w") as fh:
        json.dump(meta, fh, indent=2)
    print(json.dumps(meta))
