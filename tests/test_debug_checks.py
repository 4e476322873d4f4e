"""Sanitizer mode (FitConfig.debug_checks): checkify finiteness checks
inside the jitted iteration pin a NaN to the block update that produced it
(SURVEY.md §5 race-detection/sanitizers row — the reference only warns at
the R level after the fact, R/utils.R:126-128)."""

import numpy as np
import pytest

import insider_tpu as it
from insider_tpu.config import FitConfig
from insider_tpu.train import als


def _problem(poison=False):
    sim = it.simulate_insider_data(v1_num=6, v2_num=2, gene_num=30,
                                   latent_dim=2, seed=9,
                                   with_interaction=False)
    data = sim.data.copy()
    if poison:
        # a NaN in an observed cell propagates into the first row solve
        data[1, 3] = np.nan
    split = it.ratio_splitter(data, ratio=0.1, rm_na_col=False)
    # bypass the splitter's NaN handling: force the poisoned cell into the
    # train mask with its raw NaN value
    d = np.asarray(split.data)
    if poison:
        d[1, 3] = np.nan
        ti = np.asarray(split.train_indicator)
        ti[1, 3] = 1
        return als.build_problem(d, sim.confounder, ti,
                                 split.test_indicator, masked=True)
    return als.build_problem(d, sim.confounder, split.train_indicator,
                             split.test_indicator, masked=True)


def test_debug_checks_clean_run_passes():
    problem = _problem(poison=False)
    cfg = FitConfig(latent_dim=2, lambda1=1.0, lambda2=1.0, alpha=0.3,
                    masked=True, max_iter=10, global_tol=0.0,
                    debug_checks=True, use_pallas=False)
    res = als.optimize(problem, cfg, verbose=False)
    assert np.isfinite(res.loss)

    # identical trajectory with checks off (instrumentation is read-only)
    cfg_off = FitConfig(latent_dim=2, lambda1=1.0, lambda2=1.0, alpha=0.3,
                        masked=True, max_iter=10, global_tol=0.0,
                        debug_checks=False, use_pallas=False)
    res_off = als.optimize(problem, cfg_off, verbose=False)
    assert res.loss == pytest.approx(res_off.loss, rel=1e-6)


def test_debug_checks_pin_nan_to_producing_block():
    # A NaN in a train-masked cell poisons the first row solve.  The
    # driver's init eval would abort first (divergence guard), so drive
    # the checked step chunk directly — the sanitizer must name the
    # PRODUCING block, not just report "something went NaN".
    import jax
    import jax.numpy as jnp
    from jax.experimental.checkify import JaxRuntimeError

    from insider_tpu.model.state import init_state

    problem = _problem(poison=True)
    cfg = FitConfig(latent_dim=2, lambda1=1.0, lambda2=1.0, alpha=0.3,
                    masked=True, max_iter=10, global_tol=0.0,
                    debug_checks=True, use_pallas=False)
    state = init_state(jax.random.PRNGKey(0), problem.n_levels,
                       problem.shape[1], 2)
    ss = als.StepStatics.from_config(cfg)
    hy = als.Hypers(jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.3))
    err, _ = als._run_steps_eval_checked(
        problem.arrays, problem.statics, ss, hy, state, jnp.float32(1e-5),
        jnp.int32(1))
    with pytest.raises(JaxRuntimeError) as ei:
        err.throw()
    assert "non-finite values produced by" in str(ei.value)
    assert "row update V[0]" in str(ei.value)


def test_without_debug_checks_nan_aborts_at_boundary():
    # the production path still catches it — one boundary later, as a
    # diverged-loss abort (train/als.py divergence guard)
    problem = _problem(poison=True)
    cfg = FitConfig(latent_dim=2, lambda1=1.0, lambda2=1.0, alpha=0.3,
                    masked=True, max_iter=10, global_tol=0.0,
                    debug_checks=False, use_pallas=False)
    res = als.optimize(problem, cfg, verbose=False)
    assert res.diverged
