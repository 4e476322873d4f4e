"""Device-batched hyperparameter trials.

The reference runs each (lambda, alpha) grid point as a separate serial
optimize call (R/insider.R:147-173).  On TPU the whole stage-2 grid for one
rank is a single vmapped program: trial states stack on a leading axis,
(lambda1, lambda2, alpha) become per-trial vectors, and every XLA op
processes all trials at once — G-fold batching that turns the
dispatch-latency-bound small ops of one trial into full-width work
(SURVEY.md §2d, hyperparameter-grid row).

Semantics per trial match the serial path: fresh N(0, 0.001^2) init with the
trial's own seed, the reference convergence protocol with a per-trial
sub_tol decay ladder, test-RMSE reported from the final state.  One
deviation: trials that satisfy the stopping rule before `tuning_iter` keep
iterating (their factors stay at the fixed point) instead of freezing — the
batch stops when all trials converge or the budget is reached.

Uses the jnp CD path (not the Pallas kernel) — under vmap its (K, M) sweep
ops become (G, K, M), exactly the batching that makes it efficient.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from insider_tpu.config import FitConfig, decay_from_delta_loss
from insider_tpu.model.state import init_state
from insider_tpu.ops import losses
from insider_tpu.train import als


def _stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@partial(jax.jit, static_argnums=(1, 2, 5))
def _batched_steps(arrays, statics, step_statics, hypers, states, n_steps,
                   sub_tols):
    """n_steps ALS iterations for all trials at once."""

    def one(state, hy, tol):
        def body(_, st):
            return als._als_iteration(arrays, statics, step_statics, hy, st,
                                      tol)
        return lax.fori_loop(0, n_steps, body, state)

    return jax.vmap(one)(states, hypers, sub_tols)


@partial(jax.jit, static_argnums=(1,))
def _batched_eval(arrays, statics, states):
    def one(state):
        R = als._row_factor(arrays, state)
        residual = arrays.data - losses.predict(R, state.column_factor)
        ev = losses.evaluate_masked(residual, arrays.train_mask,
                                    arrays.test_mask)
        reg = losses.regularization_sums(state.cfd_factors, state.ctns_factor,
                                         state.column_factor)
        return ev, reg

    return jax.vmap(one)(states)


def run_batched_trials(
    problem: als.Problem,
    rank: int,
    grid: Sequence[Tuple[float, float]],   # [(lambda, alpha), ...]
    tuning_iter: int,
    global_tol: float,
    sub_tol: float,
    seeds: Sequence[int],
) -> List[dict]:
    """Run all grid points of one rank simultaneously.

    Returns one dict per grid point: {lambda, alpha, train_rmse, test_rmse,
    loss, n_iter}.
    """
    G = len(grid)
    M = problem.shape[1]
    arrays, statics = problem.arrays, problem.statics
    n_ctns = 0 if problem.ctns is None else problem.ctns.shape[1]

    states = _stack_states([
        init_state(jax.random.PRNGKey(s), problem.n_levels, M, rank,
                   n_ctns=n_ctns)
        for s in seeds
    ])
    lam = jnp.asarray([g[0] for g in grid], jnp.float32)
    alpha = jnp.asarray([g[1] for g in grid], jnp.float32)
    hypers = als.Hypers(lam1=lam, lam2=lam, alpha=alpha)
    # alpha==0 trials inside a CD batch would need the ridge dispatch; batch
    # them separately (caller splits the grid).
    assert all(g[1] > 0 for g in grid) or all(g[1] == 0 for g in grid)
    cfg = FitConfig(latent_dim=rank, alpha=float(alpha[0]), masked=True,
                    use_pallas=False)
    step_statics = als.StepStatics.from_config(cfg)

    def eval_all(states):
        evs, regs = _batched_eval(arrays, statics, states)
        out = []
        for g in range(G):
            ev = jax.tree.map(lambda x: x[g], evs)
            reg = jax.tree.map(lambda x: x[g], regs)
            out.append(losses.finalize_loss(
                ev, reg, float(lam[g]), float(lam[g]), float(alpha[g]),
                masked=True,
            ))
        return out

    metrics = eval_all(states)
    loss = np.array([m["loss"] for m in metrics])
    decay = np.ones(G)
    stopped = np.zeros(G, bool)
    stop_iter = np.full(G, tuning_iter)

    it = 0
    while it <= tuning_iter:
        boundary = it if it % 10 == 0 else (it // 10 + 1) * 10
        boundary = min(boundary, tuning_iter)
        n = boundary - it + 1
        sub_tols = jnp.asarray(sub_tol * decay, jnp.float32)
        states = _batched_steps(arrays, statics, step_statics, hypers, states,
                                n, sub_tols)
        it = boundary + 1

        pre = loss.copy()
        metrics = eval_all(states)
        loss = np.array([m["loss"] for m in metrics])
        delta = pre - loss
        decay = np.array([decay_from_delta_loss(d) for d in delta])
        newly = (~stopped) & ((pre - loss) / pre < global_tol)
        stop_iter[newly] = boundary
        stopped |= newly
        if stopped.all() or boundary >= tuning_iter:
            break

    return [
        {
            "lambda": float(lam[g]),
            "alpha": float(alpha[g]),
            "train_rmse": metrics[g]["train_rmse"],
            "test_rmse": metrics[g]["test_rmse"],
            "loss": metrics[g]["loss"],
            "n_iter": int(stop_iter[g]),
        }
        for g in range(G)
    ]
