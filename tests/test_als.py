"""End-to-end ALS properties: monotone loss, convergence protocol, recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
import insider_tpu as it
from insider_tpu.config import FitConfig
from insider_tpu.model.state import init_state
from insider_tpu.train import als


def _small_problem(seed=0, masked=True, alpha=0.4):
    sim = it.simulate_insider_data(v1_num=8, v2_num=3, gene_num=50,
                                   latent_dim=3, seed=seed,
                                   with_interaction=False)
    obj = it.Insider(sim.data, sim.confounder, split_ratio=0.1,
                     split_seed=123)
    problem = obj.tuning_problem()
    cfg = FitConfig(latent_dim=3, lambda1=1.0, lambda2=1.0, alpha=alpha,
                    masked=masked, max_iter=40, global_tol=1e-9)
    return sim, obj, problem, cfg


def test_loss_monotone_nonincreasing():
    """Each checked loss must not increase (block coordinate minimization)."""
    _, _, problem, cfg = _small_problem()
    res = als.optimize(problem, cfg, verbose=False)
    losses = [h["loss"] for h in res.history]
    for a, b in zip(losses, losses[1:]):
        assert b <= a + 1e-6 * abs(a), (a, b)


def test_loss_matches_numpy_oracle():
    """The compensated device loss equals the f64 numpy objective."""
    sim, obj, problem, cfg = _small_problem()
    res = als.optimize(problem, cfg, verbose=False)
    codes = [np.asarray(c) for c in problem.codes]
    want = oracles.global_loss(
        np.asarray(problem.data, np.float64),
        np.asarray(problem.train_mask, np.float64),
        [f.astype(np.float64) for f in res.row_matrices],
        codes,
        res.column_factor.astype(np.float64),
        cfg.lambda1, cfg.lambda2, cfg.alpha,
    )
    assert res.loss == pytest.approx(want, rel=1e-5)


def test_factor_shapes_and_structure():
    sim, obj, problem, cfg = _small_problem()
    res = als.optimize(problem, cfg, verbose=False)
    assert [f.shape for f in res.row_matrices] == [(8, 3), (3, 3)]
    assert res.column_factor.shape == (3, 50)
    assert np.isfinite(res.loss)
    assert res.test_rmse < res.history[0]["test_rmse"]  # learned something


def test_l1_induces_exact_zeros():
    _, _, problem, cfg = _small_problem(alpha=1.0)
    import dataclasses
    cfg = dataclasses.replace(cfg, lambda1=5.0, lambda2=5.0)
    res = als.optimize(problem, cfg, verbose=False)
    assert np.mean(res.column_factor == 0.0) > 0.05


def test_planted_factor_recovery():
    """Simulation fixture: the fitted low-rank fit must explain the signal
    (R^2 vs noiseless expr high), the planted-factor recovery check of
    tests/simulation.rmd (SURVEY.md §4)."""
    sim = it.simulate_insider_data(v1_num=10, v2_num=4, gene_num=60,
                                   latent_dim=4, seed=3,
                                   with_interaction=False, noise_std=0.5)
    obj = it.Insider(sim.data, sim.confounder, split_ratio=0.1, max_iter=200)
    obj = obj.fit(latent_dimension=4, lambda_=0.5, alpha=0.1, partition=1,
                  verbose=False)
    R = sum(V[np.asarray(obj.confounder[:, i]) - 1]
            for i, V in enumerate(obj.cfd_matrices))
    pred = R @ obj.column_factor
    ss_res = np.sum((sim.expr - pred) ** 2)
    ss_tot = np.sum((sim.expr - sim.expr.mean()) ** 2)
    assert 1 - ss_res / ss_tot > 0.9


def test_dense_and_masked_paths_agree_on_full_mask():
    """With a ratio-0 split and no NaNs, masked(mask=all) ~= dense."""
    sim = it.simulate_insider_data(v1_num=6, v2_num=2, gene_num=30,
                                   latent_dim=2, seed=5,
                                   with_interaction=False)
    obj = it.Insider(sim.data, sim.confounder, split_ratio=0.0, max_iter=100)
    a = obj.fit(latent_dimension=2, lambda_=1.0, alpha=0.3, partition=1,
                verbose=False).fit_result.loss
    obj2 = it.Insider(sim.data, sim.confounder, split_ratio=0.0, max_iter=100)
    b = obj2.fit(latent_dimension=2, lambda_=1.0, alpha=0.3, partition=0,
                 verbose=False).fit_result.loss
    assert a == pytest.approx(b, rel=1e-3)


def test_continuous_covariate_path():
    rng = np.random.default_rng(7)
    sim = it.simulate_insider_data(v1_num=6, v2_num=3, gene_num=40,
                                   latent_dim=3, seed=6,
                                   with_interaction=False)
    ctns = rng.standard_normal((sim.data.shape[0], 2))
    w_true = rng.standard_normal((2, 40))
    data = sim.data + ctns @ w_true * 0.5
    obj = it.Insider(data, sim.confounder, ctns_confounder=ctns,
                     split_ratio=0.1, max_iter=100)
    obj = obj.fit(latent_dimension=3, lambda_=1.0, alpha=0.2, partition=1,
                  verbose=False)
    # continuous factor is appended last, like the reference cfd list
    assert obj.cfd_matrices[-1].shape == (2, 3)
    assert np.isfinite(obj.fit_result.loss)


def test_convergence_stops_before_max_iter():
    _, _, problem, cfg = _small_problem()
    import dataclasses
    cfg = dataclasses.replace(cfg, max_iter=2000, global_tol=1e-7)
    res = als.optimize(problem, cfg, verbose=False)
    assert res.n_iter < 2000


def test_boundary_chain_matches_single_boundary_dispatch():
    """The on-device boundary chain (boundaries_per_dispatch > 1) must run
    the IDENTICAL protocol as one-boundary-per-dispatch: same per-boundary
    losses/RMSEs, same decay ladder decisions, same stop iteration."""
    import insider_tpu as it
    from insider_tpu.config import FitConfig
    from insider_tpu.train import als

    sim = it.simulate_insider_data(v1_num=8, v2_num=3, gene_num=60,
                                   latent_dim=3, seed=3)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1)
    problem = als.build_problem(split.data, sim.confounder,
                                split.train_indicator, split.test_indicator,
                                masked=True)

    def run(bpd):
        cfg = FitConfig(latent_dim=3, lambda1=2.0, lambda2=2.0, alpha=0.4,
                        masked=True, max_iter=70, global_tol=1e-9,
                        boundaries_per_dispatch=bpd, seed=0)
        return als.optimize(problem, cfg, verbose=False)

    a = run(1)
    b = run(5)
    assert len(a.history) == len(b.history)
    assert a.converged == b.converged and a.n_iter == b.n_iter
    for ra, rb in zip(a.history, b.history):
        assert ra["iter"] == rb["iter"]
        # identical device programs per iteration; the only difference is
        # where the ladder/stop arithmetic runs (host f64 vs device ds
        # pairs), which agrees except exactly ON a rung edge
        np.testing.assert_allclose(ra["loss"], rb["loss"], rtol=1e-9)
        np.testing.assert_allclose(ra["train_rmse"], rb["train_rmse"],
                                   rtol=1e-7)
    np.testing.assert_allclose(a.column_factor, b.column_factor, rtol=1e-5,
                               atol=1e-7)
