"""Weak-scaling harness: per-iteration time vs device count at fixed
per-device problem size (BASELINE.md target: >=70% efficiency 1 chip ->
multi-host).

On a real pod slice each point uses n real chips and the efficiency column is
the deliverable.  On CPU (default here: no pod available) the devices are
virtual (--xla_force_host_platform_device_count) and share one socket, so the
numbers validate the *scaling path* (compilation, collectives, sharded
layouts execute) rather than hardware efficiency — run with JAX_PLATFORMS=cpu.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/weak_scaling.py --devices 1,2,4,8 --axis cols

Per-device block: --rows-per / --cols-per (the gene axis grows with devices
for axis=cols — the INSIDER regime where M >> N).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point(n_dev: int, axis: str, rows_per: int, cols_per: int, K: int,
              iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import insider_tpu as it
    from insider_tpu.config import FitConfig, ShardingConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.train import als

    if axis == "cols":
        sharding = ShardingConfig(rows=1, cols=n_dev)
        N, M = rows_per, cols_per * n_dev
    else:
        sharding = ShardingConfig(rows=n_dev, cols=1)
        N, M = rows_per * n_dev, cols_per

    sim = it.simulate_scale(N, M, K, level_counts=(2, 8, 16), seed=0)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    problem = als.build_problem(
        split.data, sim.confounder, split.train_indicator,
        split.test_indicator, masked=True, sharding=sharding,
    )
    config = FitConfig(latent_dim=K, lambda1=10.0, lambda2=10.0, alpha=0.4)
    state = init_state(jax.random.PRNGKey(0), problem.n_levels, M, K)
    ss = als.StepStatics.from_config(config)
    hy = als.Hypers(jnp.float32(10.0), jnp.float32(10.0), jnp.float32(0.4))
    sub_tol = jnp.float32(1e-5)

    state = als._run_steps(problem.arrays, problem.statics, ss, hy, state,
                           sub_tol, jnp.int32(3))
    jax.block_until_ready(state.column_factor)
    t0 = time.perf_counter()
    state = als._run_steps(problem.arrays, problem.statics, ss, hy, state,
                           sub_tol, jnp.int32(iters))
    jax.block_until_ready(state.column_factor)
    dt = (time.perf_counter() - t0) / iters
    nnz = float(np.asarray(split.train_indicator).sum())
    return {"devices": n_dev, "mesh": (sharding.rows, sharding.cols),
            "shape": (N, M), "sec_per_iter": dt,
            "nnz_per_s": 5 * nnz / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--axis", choices=("cols", "rows"), default="cols")
    ap.add_argument("--rows-per", type=int, default=256)
    ap.add_argument("--cols-per", type=int, default=4096)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    points = [int(x) for x in args.devices.split(",")]
    avail = len(jax.devices())
    results = []
    for n in points:
        if n > avail:
            print(f"# skip {n} devices ({avail} available)", file=sys.stderr)
            continue
        r = run_point(n, args.axis, args.rows_per, args.cols_per, args.rank,
                      args.iters)
        base = results[0] if results else r
        # Weak scaling: per-iter time should stay flat as devices and total
        # work grow together.
        r["weak_efficiency"] = base["sec_per_iter"] / r["sec_per_iter"]
        results.append(r)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
