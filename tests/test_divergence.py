"""NaN/divergence guards: abort the run / kill the grid point, not the sweep.

The reference only *warns* on non-finite loss (R/utils.R:126-128) and its
relative-delta stop test is False for NaN, so a diverged run silently burns
max_iter iterations.  Our driver aborts within one check boundary
(SURVEY.md §5, failure-detection row); the batched tuner kills only the
offending grid point.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import insider_tpu as it
from insider_tpu.config import FitConfig
from insider_tpu.model.state import InsiderState, init_state
from insider_tpu.train import als
from insider_tpu.tune.batched import _stack_states, run_batched_trials


def _problem():
    sim = it.simulate_insider_data(v1_num=8, v2_num=3, gene_num=40,
                                   latent_dim=3, seed=0,
                                   with_interaction=False)
    obj = it.Insider(sim.data, sim.confounder, split_ratio=0.1,
                     split_seed=123)
    return obj, obj.tuning_problem()


def _poison(state: InsiderState) -> InsiderState:
    """A state whose loss overflows f32 (factors ~1e25 -> SSE inf)."""
    big = [jnp.full_like(f, 1e25) for f in state.cfd_factors]
    return InsiderState(big, state.ctns_factor,
                        jnp.full_like(state.column_factor, 1e25), state.key)


def test_optimize_aborts_on_nonfinite_init():
    _, problem = _problem()
    cfg = FitConfig(latent_dim=3, lambda1=1.0, lambda2=1.0, alpha=0.4,
                    masked=True, max_iter=500, check_every=10)
    state = _poison(init_state(jax.random.PRNGKey(0), problem.n_levels,
                               problem.shape[1], 3))
    res = als.optimize(problem, cfg, state=state, verbose=False)
    assert res.diverged
    # aborted at the init eval, never entered the loop
    assert len(res.history) == 1
    assert not np.isfinite(res.loss)


def test_optimize_aborts_within_one_boundary(monkeypatch):
    """Poison the factors mid-run: the ON-DEVICE boundary chain must detect
    the non-finite loss at its first boundary, stop chaining, and the host
    must abort without launching another dispatch."""
    _, problem = _problem()
    cfg = FitConfig(latent_dim=3, lambda1=1.0, lambda2=1.0, alpha=0.4,
                    masked=True, max_iter=500, check_every=10)

    calls = {"n": 0}
    orig = als._run_boundary_chain

    def sabotage(arrays, statics, step_statics, hypers, state, sub_tol,
                 decay, pre_pair, chain):
        calls["n"] += 1
        if calls["n"] == 1:   # first chained dispatch: blow up the factors
            state = _poison(state)
        return orig(arrays, statics, step_statics, hypers, state, sub_tol,
                    decay, pre_pair, chain)

    monkeypatch.setattr(als, "_run_boundary_chain", sabotage)
    res = als.optimize(problem, cfg, verbose=False)
    assert res.diverged
    # the chain ran AT MOST one boundary past the poison, not the full
    # boundaries_per_dispatch budget, and no second dispatch launched
    assert res.n_iter <= 2 * cfg.check_every
    assert calls["n"] == 1
    assert not np.isfinite(res.history[-1]["loss"])


def test_optimize_aborts_within_one_boundary_unchained(monkeypatch):
    """Same abort contract on the single-boundary path
    (boundaries_per_dispatch=1, the round-4 behavior)."""
    _, problem = _problem()
    cfg = FitConfig(latent_dim=3, lambda1=1.0, lambda2=1.0, alpha=0.4,
                    masked=True, max_iter=500, check_every=10,
                    boundaries_per_dispatch=1)

    calls = {"n": 0}
    orig = als._run_steps_eval

    def sabotage(arrays, statics, step_statics, hypers, state, sub_tol, n):
        state, metrics = orig(arrays, statics, step_statics, hypers, state,
                              sub_tol, n)
        calls["n"] += 1
        if calls["n"] == 3:  # second post-init chunk: blow up the factors
            state = _poison(state)
            ev, reg = als._evaluate(arrays, statics, state)
            from insider_tpu.ops import losses

            metrics = losses.pack_metrics(ev, reg)
        return state, metrics

    monkeypatch.setattr(als, "_run_steps_eval", sabotage)
    res = als.optimize(problem, cfg, verbose=False)
    assert res.diverged
    assert res.n_iter <= 2 * cfg.check_every
    assert calls["n"] == 3  # no chunk launched after the NaN boundary


def test_batched_tune_kills_only_diverged_trial():
    _, problem = _problem()
    grid = [(0.5, 0.3), (1.0, 0.3)]
    seeds = [11, 12]
    states = _stack_states([
        init_state(jax.random.PRNGKey(s), problem.n_levels,
                   problem.shape[1], 3)
        for s in seeds
    ])
    # poison trial 0 only
    poisoned = jax.tree.map(
        lambda x: x.at[0].set(jnp.full_like(x[0], 1e25))
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        states,
    )
    out = run_batched_trials(problem, 3, grid, tuning_iter=20,
                             global_tol=1e-10, sub_tol=1e-5, seeds=seeds,
                             states=poisoned)
    assert out[0]["diverged"]
    assert out[0]["n_iter"] == 0
    assert not out[1]["diverged"]
    assert np.isfinite(out[1]["loss"])
    assert np.isfinite(out[1]["test_rmse"])
