"""glm_interaction vs a float64 numpy OLS oracle (R/glm_interaction.R:2-30)."""

import numpy as np

from insider_tpu.analysis.glm import glm_interaction


def _oracle(residual, codes, F):
    """Stack the per-level design exactly as the reference builds it."""
    from scipy import stats  # available in the image? fallback below

    K, M = F.shape
    levels = np.unique(codes)
    coeffs = np.zeros((levels.size, K))
    pvals = np.zeros((levels.size, K))
    for li, lv in enumerate(levels):
        ids = np.flatnonzero(codes == lv)
        X = np.tile(F.T, (ids.size, 1))           # (n*M, K)
        y = residual[ids].reshape(-1)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        dof = y.size - K
        sigma2 = resid @ resid / dof
        se = np.sqrt(sigma2 * np.diag(np.linalg.inv(X.T @ X)))
        t = beta / se
        pvals[li] = 2 * stats.t.sf(np.abs(t), dof)
        coeffs[li] = beta
    return coeffs, pvals


def test_glm_matches_ols_oracle():
    try:
        import scipy  # noqa: F401
    except ImportError:
        import pytest

        pytest.skip("scipy not available")
    rng = np.random.default_rng(0)
    N, M, K, L = 24, 40, 3, 4
    F = rng.standard_normal((K, M))
    codes = rng.integers(1, L + 1, N)
    codes[:L] = np.arange(1, L + 1)
    residual = rng.standard_normal((N, M))

    coef, pval = glm_interaction(residual, None, codes, F)
    coef_o, pval_o = _oracle(residual, codes, F)
    np.testing.assert_allclose(coef, coef_o, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(pval, pval_o, rtol=5e-3, atol=2e-4)


def test_glm_shapes_and_determinism():
    rng = np.random.default_rng(1)
    F = rng.standard_normal((2, 15))
    codes = np.array([1, 1, 2, 2, 3, 3])
    residual = rng.standard_normal((6, 15))
    a = glm_interaction(residual, None, codes, F)
    b = glm_interaction(residual, None, codes, F)
    assert a[0].shape == (3, 2) and a[1].shape == (3, 2)
    np.testing.assert_array_equal(a[0], b[0])
    assert np.all((a[1] >= 0) & (a[1] <= 1))
