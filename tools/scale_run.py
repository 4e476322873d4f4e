"""Largest-masked-problem-on-one-chip probe via the memory-lean path
(VERDICT r4 next #2; BASELINE.json configs 4-5 scaled to what one v5e holds).

Climbs a ladder of problem sizes, runs a few ALS iterations per size,
records steady-ish nnz/s and the memory footprint, and stops at the first
size that exhausts HBM.

Round-5 capacity path (all (N, M) transients removed):
  * uint8 indicator storage (4x less than f32 masks);
  * NO persistent wx copy (column kernels multiply by the mask in VMEM);
  * precompute=True with column-chunked contractions (the r4 ladder ran
    precompute=False, which pushed the row updates onto the jnp
    residual path with two (N, M) transients per confounder);
  * row-chunked row_xty kernel (r4's single-shot kernel capped N at VMEM);
  * streamed gram+xty builder kernel (r4 materialized the widened mask AND
    mask.*data per iteration);
  * fused evaluation kernel (r4's jnp eval materialized predict+residual).

Peak memory: the axon tunnel's device.memory_stats() returns no
peak_bytes_in_use, so in addition to trying it we record XLA's own
compile-time memory analysis of the step executable (argument + temp +
output bytes) — the honest upper-bound accounting of what the program
needs (VERDICT r4 weak #3: "peak_bytes_in_use is null at every point").

Usage:  python tools/scale_run.py [--out SCALE_r05.json]
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

# (N, M) ladder, smallest first.  Persistent: N*M*4 B f32 data + 2*N*M B
# uint8 masks + (L, M)-scale precompute constants; the round-5 iteration
# adds no (N, M) transients.
LADDER = [
    (4096, 32768),
    (8192, 49152),
    (8192, 98304),
    (12288, 98304),
    (16384, 131072),
    (16384, 196608),
    (24576, 196608),
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
        masked=True, mask_dtype=jnp.uint8, precompute=True,
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

    # XLA's own memory accounting of the step executable (the committed
    # record of the transient footprint at this point).
    mem = None
    try:
        lowered = als._run_steps.lower(arrays, statics, ss, hy, state,
                                       jnp.float32(1e-5), jnp.int32(ITERS))
        ma = lowered.compile().memory_analysis()
        mem = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
            "peak_model_bytes": int(ma.argument_size_in_bytes
                                    + ma.output_size_in_bytes
                                    + ma.temp_size_in_bytes
                                    - ma.alias_size_in_bytes),
        }
    except Exception as e:  # pragma: no cover - backend-dependent
        mem = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

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
        if stats:
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
        "xla_memory_analysis": mem,
        "data_gb": n * m * 4 / 1e9,
        "masks_gb": 2 * n * m / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALE_r05.json")
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
            print(json.dumps(r), file=sys.stderr, flush=True)
        except Exception as e:
            failed = {"shape": [n, m], "error": type(e).__name__,
                      "message": str(e)[:400]}
            print(json.dumps(failed), file=sys.stderr, flush=True)
            break

    out = {
        "device": str(jax.devices()[0]),
        "config": f"K={K} levels={LEVELS} lambda={LAMBDA} alpha={ALPHA} "
                  f"masked 10%, mask_dtype=uint8, precompute=True "
                  f"(chunked, no persistent wx), {ITERS} timed iters",
        "points": results,
        "first_oom": failed,
        "swallowed_transient_errors": resilience.get_swallowed(),
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
