"""Multi-host runtime layout logic (sharding/distributed.py).

Single-process here, so initialize_distributed must no-op and the layout
helpers must agree with the global device/process counts (1 process, 8
virtual devices via conftest).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from insider_tpu.config import ShardingConfig
from insider_tpu.sharding.distributed import (
    host_col_block,
    host_row_block,
    initialize_distributed,
    make_global_array,
    pod_sharding,
)
from insider_tpu.sharding.mesh import make_mesh


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    assert initialize_distributed() is False


def test_pod_sharding_layouts():
    n = len(jax.devices())
    assert pod_sharding() == ShardingConfig(rows=1, cols=n)
    assert pod_sharding(rows=2) == ShardingConfig(rows=2, cols=n // 2)
    assert pod_sharding(cols=2) == ShardingConfig(rows=n // 2, cols=2)
    with pytest.raises(ValueError):
        pod_sharding(rows=3)  # 8 not divisible
    with pytest.raises(ValueError):
        pod_sharding(rows=n, cols=n)


def test_host_blocks_cover_matrix_single_process():
    cfg = pod_sharding()
    r0, r1 = host_row_block(137, cfg)
    c0, c1 = host_col_block(533, cfg)
    assert (r0, r1) == (0, 137)
    assert (c0, c1) == (0, 533)


def test_make_global_array_roundtrip():
    cfg = pod_sharding()
    mesh = make_mesh(cfg)
    x = np.arange(16 * len(jax.devices()) * 8, dtype=np.float32).reshape(
        16, -1)
    g = make_global_array(x, mesh, P(None, "cols"))
    assert g.shape == x.shape
    np.testing.assert_array_equal(np.asarray(g), x)
