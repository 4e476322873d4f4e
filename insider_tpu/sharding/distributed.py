"""Multi-host runtime: jax.distributed bring-up and pod-slice mesh layout.

The reference is a single OpenMP process with no communication backend at all
(src/Makevars:11-13; SURVEY.md §2d).  For the rebuild, multi-host scaling is a
first-class subsystem: each host runs the same SPMD program; XLA places
collectives on ICI within a slice and DCN across slices.

Design for the INSIDER workload (see also sharding/mesh.py):

  * The gene axis ('cols') carries almost all the data (M >> N in every
    reference workload) — shard it as wide as possible.  The CD column update
    and the per-column Gram build are fully column-local: ZERO bytes on the
    interconnect in the hot loop.
  * The sample axis ('rows') is the data-parallel axis for the huge-N
    synthetic configs (500k x 1M, BASELINE.md).  Its only collectives are
    psums of (L, K, K) level Grams and (L, K) level RHS — kilobytes per
    iteration, latency- not bandwidth-bound.
  * The column factor F lives column-sharded and is NEVER all-gathered: row
    updates need X F^T and the level Grams Mw @ (F*F)^T, both of which
    contract over the gene axis, so each shard contributes a partial (L, K)
    / (L, K, K) term and one tiny psum finishes the job.  This is the
    blockwise-F design SURVEY.md §7 sketches, with the all-gather eliminated
    rather than overlapped — the strictly better version.

Bring-up order (call before any jax array op):

    from insider_tpu.sharding.distributed import initialize_distributed
    initialize_distributed()                       # no-op single-process
    cfg = pod_sharding(rows=..., cols=...)         # global mesh layout
    problem = als.build_problem(..., sharding=cfg)

Per-host data loading: `host_row_block` / `host_col_block` give the slice of
the global matrix this host should read (jax.make_array_from_process_local_data
assembles the global array), so a 500k x 1M matrix is never resident on one
host.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from insider_tpu.config import ShardingConfig


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if running multi-process; else no-op.

    Detection: explicit args > JAX_COORDINATOR_ADDRESS / standard cluster env
    (TPU pod metadata, SLURM, Open MPI) which jax.distributed auto-detects.
    Returns True if a multi-process runtime was initialized.
    """
    import jax

    explicit = coordinator_address is not None
    env = ("JAX_COORDINATOR_ADDRESS" in os.environ
           or "COORDINATOR_ADDRESS" in os.environ
           or os.environ.get("SLURM_NTASKS", "1") not in ("", "1"))
    if not (explicit or env):
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def pod_sharding(rows: int = 0, cols: int = 0) -> ShardingConfig:
    """A ShardingConfig over ALL global devices (every process's chips).

    With rows/cols both 0, auto-layout: put every device on the gene axis
    (cols), the zero-communication direction, unless the caller asks for a
    rows axis.  rows*cols must equal the global device count when both given;
    a single 0 is inferred.
    """
    import jax

    n = len(jax.devices())
    if rows == 0 and cols == 0:
        rows, cols = 1, n
    elif rows == 0:
        if n % cols:
            raise ValueError(f"{n} devices not divisible by cols={cols}")
        rows = n // cols
    elif cols == 0:
        if n % rows:
            raise ValueError(f"{n} devices not divisible by rows={rows}")
        cols = n // rows
    if rows * cols != n:
        raise ValueError(f"mesh {rows}x{cols} != {n} global devices")
    return ShardingConfig(rows=rows, cols=cols)


def host_row_block(n_rows: int, cfg: ShardingConfig) -> Tuple[int, int]:
    """[start, stop) of the global row axis this process should load."""
    import jax

    pid, pc = jax.process_index(), jax.process_count()
    # Processes tile the mesh in device order; rows-major blocks.
    per = -(-n_rows // pc) if cfg.rows >= pc else n_rows
    if cfg.rows >= pc:
        start = min(pid * per, n_rows)
        return start, min(start + per, n_rows)
    return 0, n_rows


def host_col_block(n_cols: int, cfg: ShardingConfig) -> Tuple[int, int]:
    """[start, stop) of the global gene axis this process should load."""
    import jax

    pid, pc = jax.process_index(), jax.process_count()
    if cfg.rows >= pc:
        return 0, n_cols
    per = -(-n_cols // pc)
    start = min(pid * per, n_cols)
    return start, min(start + per, n_cols)


def make_global_array(local_block, mesh, spec):
    """Assemble a globally-sharded array from per-process local blocks."""
    import jax

    return jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, spec), local_block
    )
