"""Fused masked-evaluation kernel vs the jnp reference path.

The kernel (kernels/eval_pallas.py) must reproduce ops/losses.evaluate_masked
— same compensated accuracy class, exact counts — including ragged shapes
(no jnp.pad of the big operands happens inside; the kernel guards edges with
iota masks).  Reference semantics: src/utils.cpp:56-77."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from insider_tpu.kernels.eval_pallas import masked_eval_pallas
from insider_tpu.ops import losses


def _mk(N, M, K, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((N, M)).astype(np.float32)
    train = (rng.random((N, M)) < 0.85).astype(np.float32)
    test = ((rng.random((N, M)) < 0.5) * (1.0 - train)).astype(np.float32)
    R = rng.standard_normal((N, K)).astype(np.float32) * 0.3
    F = rng.standard_normal((K, M)).astype(np.float32) * 0.3
    return data, train, test, R, F


@pytest.mark.parametrize("shape", [(64, 256, 8), (377, 1111, 24),
                                   (520, 640, 12)])
def test_matches_jnp_eval(shape):
    N, M, K = shape
    data, train, test, R, F = _mk(N, M, K)
    tr, te, nt, ne = masked_eval_pallas(
        jnp.asarray(data), jnp.asarray(train), jnp.asarray(test),
        jnp.asarray(R), jnp.asarray(F), interpret=True)

    residual = jnp.asarray(data) - jnp.asarray(R) @ jnp.asarray(F)
    ev = losses.evaluate_masked(residual, jnp.asarray(train),
                                jnp.asarray(test))

    ref_tr = float(ev.train_sse[0]) + float(ev.train_sse[1])
    ref_te = float(ev.test_sse[0]) + float(ev.test_sse[1])
    got_tr = float(tr[0]) + float(tr[1])
    got_te = float(te[0]) + float(te[1])
    # both are compensated; difference is the f32 matmul's own rounding
    assert abs(got_tr - ref_tr) <= 1e-5 * abs(ref_tr)
    assert abs(got_te - ref_te) <= 1e-5 * max(abs(ref_te), 1.0)
    assert float(nt) == float(ev.n_train)
    assert float(ne) == float(ev.n_test)


def test_uint8_masks():
    N, M, K = 96, 384, 8
    data, train, test, R, F = _mk(N, M, K, seed=3)
    tr8, te8, nt8, ne8 = masked_eval_pallas(
        jnp.asarray(data), jnp.asarray(train, jnp.uint8).astype(jnp.uint8),
        jnp.asarray(test).astype(jnp.uint8),
        jnp.asarray(R), jnp.asarray(F), interpret=True)
    tr, te, nt, ne = masked_eval_pallas(
        jnp.asarray(data), jnp.asarray(train), jnp.asarray(test),
        jnp.asarray(R), jnp.asarray(F), interpret=True)
    assert float(tr8[0]) == float(tr[0])
    assert float(te8[0]) == float(te[0])
    assert float(nt8) == float(nt)
    assert float(ne8) == float(ne)


def test_driver_uses_kernel_same_metrics():
    """_evaluate with a use_pallas StepStatics (kernel route, interpret on
    CPU via use_pallas flag is not set on CPU — call the impl directly)."""
    from insider_tpu.config import FitConfig
    from insider_tpu.model.state import init_state
    from insider_tpu.train import als
    import insider_tpu as it

    N, M, K = 60, 200, 6
    sim = it.simulate_scale(N, M, K, level_counts=(3, 5), noise_std=0.5,
                            seed=1)
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    problem = als.build_problem(split.data, sim.confounder,
                                split.train_indicator, split.test_indicator,
                                masked=True)
    state = init_state(jax.random.PRNGKey(0), problem.n_levels, M, K)
    ev_j, reg_j = als._evaluate_impl(problem.arrays, problem.statics, state)

    # kernel path in interpret mode (monkeypatch the pallas entry)
    from insider_tpu.kernels import eval_pallas

    tr, te, nt, ne = eval_pallas.masked_eval_pallas(
        problem.arrays.data, problem.arrays.train_mask,
        problem.arrays.test_mask, als._row_factor(problem.arrays, state),
        state.column_factor, interpret=True)
    ref_tr = float(ev_j.train_sse[0]) + float(ev_j.train_sse[1])
    got_tr = float(tr[0]) + float(tr[1])
    assert abs(got_tr - ref_tr) <= 1e-5 * abs(ref_tr)
    assert float(nt) == float(ev_j.n_train)
    assert float(ne) == float(ev_j.n_test)
