"""Largest-masked-problem-on-one-chip probe via the memory-lean path
(VERDICT r2 #5; BASELINE.json configs 4-5 scaled to what one v5e holds).

Climbs a ladder of problem sizes through the memory-lean ingestion options
(uint8 indicator storage, precompute=False so no (N, M) wx/one-hot
constants are materialized), runs a few ALS iterations per size, records
steady-ish nnz/s and the device's peak memory, and stops at the first size
that exhausts HBM.  The committed SCALE_r04.json is the record of what is
and is not provable on this hardware; the 50k x 200k / 500k x 1M BASELINE
configs need the multi-chip meshes whose sharding path is validated by
dryrun_multichip + tools/multiprocess_run.py.

Usage:  python tools/scale_run.py [--out SCALE_r04.json]
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
LEVELS = (8, 32, 128)
LAMBDA, ALPHA = 11.0, 0.4
ITERS = 8

# (N, M) ladder, smallest first.  N*M*4 bytes of f32 data + 2*N*M uint8
# masks persist; the iteration adds (N, M)-scale transients (predict,
# masked residual), so the footprint is several data-sized buffers.
LADDER = [
    (4096, 32768),
    (8192, 49152),
    (8192, 98304),
    (12288, 98304),
    (16384, 131072),
]


def try_point(n, m):
    import jax
    import jax.numpy as jnp

    import insider_tpu as it
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.train import als

    sim = it.simulate_scale(n, m, K, level_counts=LEVELS, noise_std=1.0,
                            seed=0)
    # Memory-lean split: build uint8 indicators directly (the f64 splitter
    # parity matrix would double host RAM at this scale).
    rng = np.random.default_rng(123)
    test = (rng.random((n, m)) < 0.1)
    train = ~test
    problem = als.build_problem(
        sim.data, sim.confounder,
        train.astype(np.uint8), test.astype(np.uint8),
        masked=True, mask_dtype=jnp.uint8, precompute=False,
    )
    del train, test
    nnz = int(n * m * 0.9)

    config = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                       alpha=ALPHA, masked=True)
    state = init_state(jax.random.PRNGKey(0), problem.n_levels, m, K)
    ss = als.StepStatics.from_config(config)
    hy = als.Hypers(jnp.float32(LAMBDA), jnp.float32(LAMBDA),
                    jnp.float32(ALPHA))
    arrays, statics = problem.arrays, problem.statics

    state = als._run_steps(arrays, statics, ss, hy, state, jnp.float32(1e-5),
                           jnp.int32(2))
    float(jnp.sum(state.column_factor))          # real sync on the tunnel
    t0 = time.perf_counter()
    state = als._run_steps(arrays, statics, ss, hy, state, jnp.float32(1e-5),
                           jnp.int32(ITERS))
    float(jnp.sum(state.column_factor))
    dt = (time.perf_counter() - t0) / ITERS

    peak = None
    try:
        stats = jax.devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use")
    except Exception:
        pass
    blocks = len(LEVELS) + 1 + 1
    return {
        "shape": [n, m],
        "nnz": nnz,
        "sec_per_iter": dt,
        "nnz_per_s": blocks * nnz / dt,
        "peak_bytes_in_use": peak,
        "data_gb": n * m * 4 / 1e9,
        "masks_gb": 2 * n * m / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_r04.json")
    args = ap.parse_args()

    import jax

    from insider_tpu import resilience

    results, failed = [], None
    for n, m in LADDER:
        try:
            # transient tunnel errors retry (with a backend reset);
            # a real OOM (RESOURCE_EXHAUSTED) is the ladder's stop signal.
            r = resilience.run_resilient(lambda n=n, m=m: try_point(n, m),
                                         attempts=3)
            results.append(r)
            print(json.dumps(r), file=sys.stderr)
        except Exception as e:
            failed = {"shape": [n, m], "error": type(e).__name__,
                      "message": str(e)[:400]}
            print(json.dumps(failed), file=sys.stderr)
            break

    out = {
        "device": str(jax.devices()[0]),
        "config": f"K={K} levels={LEVELS} lambda={LAMBDA} alpha={ALPHA} "
                  f"masked 10%, mask_dtype=uint8, precompute=False "
                  f"(memory-lean ingestion), {ITERS} timed iters",
        "points": results,
        "first_oom": failed,
        "note": ("single chip; the 50k x 200k and 500k x 1M BASELINE "
                 "configs require the multi-chip mesh (sharding validated "
                 "by __graft_entry__.dryrun_multichip and "
                 "tools/multiprocess_run.py, per-shard-callback ingestion "
                 "by build_problem_distributed)"),
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
