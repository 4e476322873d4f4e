"""Continuous-covariate updates vs the numpy oracle (src/optimize.cpp:77-137)."""

import jax.numpy as jnp
import numpy as np

import oracles
from insider_tpu.ops import continuous


def _problem(seed=0, n=40, m=30, k=5):
    rng = np.random.default_rng(seed)
    resid_plus = rng.standard_normal((n, m))
    mask = (rng.random((n, m)) < 0.8).astype(np.float64)
    F = rng.standard_normal((k, m))
    c = rng.standard_normal(n)
    w0 = rng.standard_normal(k) * 0.01
    return resid_plus, mask, F, c, w0


def test_masked_matches_oracle():
    resid_plus, mask, F, c, w0 = _problem()
    lam = 0.9
    want = oracles.ctns_update_masked(resid_plus, mask, F, c, w0, lam)
    got = continuous.update_ctns_row_masked(
        jnp.asarray(resid_plus, jnp.float32), jnp.asarray(mask, jnp.float32),
        jnp.asarray(F, jnp.float32), jnp.asarray(c, jnp.float32),
        jnp.asarray(w0, jnp.float32), lam,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)


def test_dense_closed_form():
    resid_plus, _, F, c, w0 = _problem(seed=2)
    lam = 1.1
    K = F.shape[0]
    want = np.linalg.solve((c @ c) * (F @ F.T) + lam * np.eye(K),
                           F @ (resid_plus.T @ c))
    got = continuous.update_ctns_row_dense(
        jnp.asarray(resid_plus, jnp.float32), jnp.asarray(F, jnp.float32),
        jnp.asarray(F @ F.T, jnp.float32), jnp.asarray(c, jnp.float32), lam,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
