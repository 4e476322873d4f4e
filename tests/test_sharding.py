"""Sharded execution on the 8-device virtual CPU mesh (SURVEY.md §2d).

Verifies that the full ALS step compiles and runs under real
('rows','cols') shardings and that sharded results match single-device
results (GSPMD must only insert collectives, never change math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import insider_tpu as it
from insider_tpu.config import FitConfig, ShardingConfig
from insider_tpu.model.state import init_state
from insider_tpu.train import als


def _fit(sharding, seed=0, alpha=0.4):
    sim = it.simulate_scale(16, 128, 3, level_counts=(3, 5), seed=seed)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1)
    problem = als.build_problem(
        split.data, sim.confounder, split.train_indicator,
        split.test_indicator, masked=True, sharding=sharding,
    )
    cfg = FitConfig(latent_dim=3, lambda1=1.0, lambda2=1.0, alpha=alpha,
                    masked=True, max_iter=20, seed=7)
    state = init_state(jax.random.PRNGKey(7), problem.n_levels, 128, 3)
    return als.optimize(problem, cfg, state=state, verbose=False)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (8, 1)])
def test_sharded_matches_single_device(mesh_shape):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rows, cols = mesh_shape
    ref = _fit(None)
    shd = _fit(ShardingConfig(rows=rows, cols=cols))
    assert shd.loss == pytest.approx(ref.loss, rel=1e-4)
    np.testing.assert_allclose(shd.column_factor, ref.column_factor,
                               rtol=5e-3, atol=1e-4)
    for a, b in zip(shd.row_matrices, ref.row_matrices):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)


def test_sharded_ridge_path():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ref = _fit(None, alpha=0.0)
    shd = _fit(ShardingConfig(rows=2, cols=4), alpha=0.0)
    assert shd.loss == pytest.approx(ref.loss, rel=1e-4)
