"""Row-side batched ridge vs the numpy oracle (src/optimize.cpp:139-198)."""

import jax.numpy as jnp
import numpy as np

import oracles
from insider_tpu.ops import row_update


def _problem(seed=0, n=40, m=33, k=4, n_levels=6):
    rng = np.random.default_rng(seed)
    residual = rng.standard_normal((n, m))
    mask = (rng.random((n, m)) < 0.8).astype(np.float64)
    F = rng.standard_normal((k, m))
    codes = rng.integers(0, n_levels, n)
    # ensure every level occupied
    codes[:n_levels] = np.arange(n_levels)
    return residual, mask, F, codes, n_levels


def test_masked_matches_oracle():
    residual, mask, F, codes, L = _problem()
    lam = 0.7
    want = oracles.ridge_row_update_masked(residual, mask, F, codes, L, lam)
    got = row_update.update_row_factor_masked(
        jnp.asarray(residual, jnp.float32), jnp.asarray(mask, jnp.float32),
        jnp.asarray(F, jnp.float32), jnp.asarray(codes, jnp.int32), L, lam,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_dense_matches_oracle():
    residual, _, F, codes, L = _problem(seed=3)
    lam = 1.3
    want = oracles.ridge_row_update_dense(residual, F, codes, L, lam)
    gram = jnp.asarray(F @ F.T, jnp.float32)
    got = row_update.update_row_factor_dense(
        jnp.asarray(residual, jnp.float32), jnp.asarray(F, jnp.float32),
        gram, jnp.asarray(codes, jnp.int32), L, lam,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_masked_equals_dense_when_mask_full():
    residual, _, F, codes, L = _problem(seed=5)
    lam = 0.5
    full = np.ones_like(residual)
    a = row_update.update_row_factor_masked(
        jnp.asarray(residual, jnp.float32), jnp.asarray(full, jnp.float32),
        jnp.asarray(F, jnp.float32), jnp.asarray(codes, jnp.int32), L, lam,
    )
    gram = jnp.asarray((F @ F.T), jnp.float32)
    b = row_update.update_row_factor_dense(
        jnp.asarray(residual, jnp.float32), jnp.asarray(F, jnp.float32),
        gram, jnp.asarray(codes, jnp.int32), L, lam,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_fit_interaction_unregularized():
    residual, mask, F, codes, L = _problem(seed=7)
    want = oracles.ridge_row_update_masked(residual, mask, F, codes, L, 0.0)
    got = row_update.fit_interaction(
        jnp.asarray(residual, jnp.float32), jnp.asarray(mask, jnp.float32),
        codes, jnp.asarray(F, jnp.float32), masked=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)


def test_batched_level_grams_match_per_confounder():
    # The driver batches all confounders' level grams into one matmul per
    # iteration against a shared outer-product table (train/als.py); the
    # concatenated-and-sliced result must equal the per-confounder form.
    import numpy as np
    from insider_tpu.ops.row_update import factor_outer_table, level_gram_masked

    rng = np.random.default_rng(0)
    K, M = 6, 40
    F = jnp.asarray(rng.standard_normal((K, M)), jnp.float32)
    mws = [jnp.asarray(rng.integers(0, 9, (L, M)), jnp.float32)
           for L in (2, 5, 11)]
    PF = factor_outer_table(F)
    cat = level_gram_masked(jnp.concatenate(mws, axis=0), F, PF)
    off = 0
    for mw in mws:
        L = mw.shape[0]
        np.testing.assert_array_equal(np.asarray(cat[off:off + L]),
                                      np.asarray(level_gram_masked(mw, F)))
        off += L
