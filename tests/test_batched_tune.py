"""Device-batched tuning vs serial trials."""

import numpy as np
import pytest

import insider_tpu as it
from insider_tpu.tune.batched import run_batched_trials
from insider_tpu.tune.grid import _run_trial


@pytest.fixture(scope="module")
def small():
    sim = it.simulate_insider_data(v1_num=8, v2_num=3, gene_num=40,
                                   latent_dim=3, seed=0,
                                   with_interaction=False)
    obj = it.Insider(sim.data, sim.confounder, split_ratio=0.1,
                     tuning_iter=20)
    return obj, obj.tuning_problem()


def test_batched_matches_serial(small):
    obj, problem = small
    grid = [(0.5, 0.3), (2.0, 0.3), (1.0, 0.8)]
    seeds = [11, 12, 13]
    batched = run_batched_trials(problem, 3, grid, tuning_iter=20,
                                 global_tol=obj.params["global_tol"],
                                 sub_tol=obj.params["sub_tol"], seeds=seeds)
    for (lam, al), seed, b in zip(grid, seeds, batched):
        serial = _run_trial(problem, obj, 3, lam, al, trial_seed=seed,
                            tuning_iter=20)
        assert b["train_rmse"] == pytest.approx(serial.train_rmse, rel=2e-2)
        assert b["test_rmse"] == pytest.approx(serial.test_rmse, rel=2e-2)


def test_tune_api_batched_csv(small, tmp_path):
    obj, _ = small
    res = obj.tune(latent_dimension=3, lambda_=[0.5, 1.0], alpha=[0.3, 0.6],
                   out_dir=str(tmp_path))
    assert res["reg_tuning"].shape == (4, 4)
    assert (tmp_path / "insider_R3_reg_tuning_result.csv").exists()
    # grid order: lambda fastest (R expand.grid)
    lams = res["reg_tuning"][:, 0]
    assert list(lams) == [0.5, 1.0, 0.5, 1.0]
