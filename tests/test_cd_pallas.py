"""Pallas CD kernel vs the jnp reference path (interpret mode on CPU).

The kernel sweeps coordinates in fixed order (randomization happens by
permuting the problem outside), so feeding the jnp path an identity
permutation for every sweep makes the two compute the *same iteration* —
betas must agree to f32 roundoff even before full convergence.  Interpret
mode is slow, so budgets are kept small.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insider_tpu.kernels.cd_pallas import elastic_net_cd_pallas
from insider_tpu.ops import col_update
from insider_tpu.ops.col_update import CDState, _kkt_violations, _sweep


def _problem(seed, n=40, k=4, m=21):
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((n, k)).astype(np.float32)
    data = rng.standard_normal((n, m)).astype(np.float32)
    mask = (rng.random((n, m)) < 0.85).astype(np.float32)
    F0 = (rng.standard_normal((k, m)) * 0.01).astype(np.float32)
    return R, data, mask, F0


def _jnp_reference(XtX, Xty, F0, lam, alpha, tol, max_sweeps):
    """The jnp path unrolled eagerly with identity sweep order."""
    K, m = F0.shape
    ident = jnp.arange(K, dtype=jnp.int32)
    thr = alpha * (2 * lam - jnp.max(jnp.abs(Xty), axis=0))
    active = jnp.abs(Xty) >= thr
    beta = jnp.where(active, F0, 0.0)
    s = jnp.einsum("mkl,lm->km", XtX, beta)
    st = CDState(beta, s, active, jnp.zeros(m, bool), jnp.int32(0))
    diag = jnp.diagonal(XtX, axis1=1, axis2=2).T
    for i in range(max_sweeps):
        if bool(jnp.all(st.converged)):
            break
        beta, s, dec = _sweep(XtX, diag, Xty, lam, alpha, ident, st)
        cand = (~st.converged) & (jnp.abs(dec) <= tol)
        viol = _kkt_violations(s, Xty, st.active, lam, alpha)
        has_viol = jnp.any(viol, axis=0)
        active = st.active | (viol & cand[None, :])
        converged = st.converged | (cand & (~has_viol))
        st = CDState(beta, s, active, converged, st.sweeps + 1)
    return st.beta


@pytest.mark.parametrize("lam,alpha", [(2.0, 0.6), (0.5, 1.0)])
def test_kernel_matches_jnp_path(lam, alpha):
    R, data, mask, F0 = _problem(0)
    S = 12
    tol = jnp.float32(1e-9)

    XtX = col_update.col_gram_masked(jnp.asarray(R), jnp.asarray(mask))
    XtXt = col_update.col_gram_masked_t(jnp.asarray(R), jnp.asarray(mask))
    Xty = jnp.matmul(R.T, mask * data)

    got = elastic_net_cd_pallas(XtXt, Xty, jnp.asarray(F0), lam, alpha, tol,
                                max_sweeps=S, block=128, interpret=True)
    want = _jnp_reference(XtX, Xty, jnp.asarray(F0), lam, alpha, tol, S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_kernel_padding_tail_block():
    """M not a multiple of the block: padded columns must not corrupt
    output, and block size must not change results."""
    R, data, mask, F0 = _problem(1, m=21)
    lam, alpha = 1.5, 0.7
    S = 10
    tol = jnp.float32(1e-8)
    XtXt = col_update.col_gram_masked_t(jnp.asarray(R), jnp.asarray(mask))
    Xty = jnp.matmul(R.T, mask * data)
    a = elastic_net_cd_pallas(XtXt, Xty, jnp.asarray(F0), lam, alpha, tol,
                              max_sweeps=S, block=128, interpret=True)
    b = elastic_net_cd_pallas(XtXt, Xty, jnp.asarray(F0), lam, alpha, tol,
                              max_sweeps=S, block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_kernel_converges_to_kkt():
    """With enough sweeps the kernel reaches the elastic-net optimum."""
    R, data, mask, F0 = _problem(2, n=30, k=3, m=9)
    lam, alpha = 1.0, 0.5
    S = 40
    tol = jnp.float32(1e-10)
    XtXt = col_update.col_gram_masked_t(jnp.asarray(R), jnp.asarray(mask))
    Xty = jnp.matmul(R.T, mask * data)
    F = np.asarray(
        elastic_net_cd_pallas(XtXt, Xty, jnp.asarray(F0), lam, alpha, tol,
                              max_sweeps=S, block=128, interpret=True),
        np.float64,
    )
    for j in range(F.shape[1]):
        w = mask[:, j].astype(np.float64)
        XtX = (R * w[:, None]).T @ R
        b = R.T @ (w * data[:, j].astype(np.float64))
        grad = XtX @ F[:, j] - b + lam * (1 - alpha) * F[:, j]
        viol = np.where(
            F[:, j] != 0,
            np.abs(grad + lam * alpha * np.sign(F[:, j])),
            np.maximum(np.abs(grad) - lam * alpha, 0.0),
        )
        assert viol.max() < 5e-2, j


def test_update_columns_pallas_dispatch_matches_jnp_optimum():
    """use_pallas=True (with its per-update permutation) reaches the same
    optimum as the jnp path on a well-conditioned problem."""
    R, data, mask, F0 = _problem(3, n=60, k=5, m=33)
    lam, alpha = 1.0, 0.4
    # the driver's cd dispatch uses the sublane-packed kernels
    import insider_tpu.kernels.cd_packed as cdpk
    orig = cdpk.elastic_net_cd_packed_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    orig_fused = cdpk.elastic_net_cd_fused_packed_pallas

    def interp_fused(*args, **kw):
        kw["interpret"] = True
        return orig_fused(*args, **kw)

    try:
        cdpk.elastic_net_cd_packed_pallas = interp
        cdpk.elastic_net_cd_fused_packed_pallas = interp_fused
        # cd_warm_start=False: this test exercises the packed CD kernel
        # dispatch specifically (the warm default routes through FSS)
        Fp, _, tag = col_update.update_columns_masked(
            jnp.asarray(data), jnp.asarray(mask), jnp.asarray(R),
            jnp.asarray(F0), lam, alpha, jnp.float32(1e-9),
            jax.random.PRNGKey(7), max_sweeps=60, use_pallas=True,
            cd_warm_start=False,
        )
    finally:
        cdpk.elastic_net_cd_packed_pallas = orig
        cdpk.elastic_net_cd_fused_packed_pallas = orig_fused
    assert int(tag) == -4  # the gram-fused CD path ran
    Fj, _, _ = col_update.update_columns_masked(
        jnp.asarray(data), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(F0), lam, alpha, jnp.float32(1e-9),
        jax.random.PRNGKey(7), max_sweeps=60, use_pallas=False,
    )
    np.testing.assert_allclose(np.asarray(Fp), np.asarray(Fj), rtol=5e-3,
                               atol=1e-4)


def test_cd_fused_gram_variant_matches_streamed():
    from insider_tpu.kernels.cd_pallas import (elastic_net_cd_fused_pallas,
                                               elastic_net_cd_pallas)
    from insider_tpu.ops.col_update import col_gram_masked_t

    rng = np.random.default_rng(9)
    N, K, M = 50, 6, 640
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    mask = jnp.asarray(rng.random((N, M)) > 0.1, jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    wx = mask * data
    Xty = jnp.matmul(R.T, wx, precision=jax.lax.Precision.HIGHEST)
    beta0 = jnp.asarray(rng.standard_normal((K, M)) * 0.01, jnp.float32)
    XtXt = col_gram_masked_t(R, mask)
    a = elastic_net_cd_pallas(XtXt, Xty, beta0, 2.0, 0.5, jnp.float32(1e-9),
                              max_sweeps=60, interpret=True, block=512)
    b = elastic_net_cd_fused_pallas(mask, wx, R, beta0, 2.0, 0.5,
                                    jnp.float32(1e-9), max_sweeps=60,
                                    interpret=True, block=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=1e-5)


def test_fused_feasibility_gate():
    """The gram-fused kernels must refuse shapes whose VMEM residency
    cannot fit even a 128-lane block (ADVICE r3: BASELINE-target row counts
    previously died at compile time instead of falling back)."""
    from insider_tpu.kernels.fss_pallas import fused_feasible

    assert fused_feasible(24, 377)                      # flagship
    assert fused_feasible(24, 377, gj_scratch=False)
    assert not fused_feasible(24, 50_000)               # BASELINE config 4
    assert not fused_feasible(32, 500_000)              # BASELINE config 5
    assert not fused_feasible(24, 50_000, gj_scratch=False)


def test_cd_shared_gram_matches_streamed():
    """Dense path: the shared-(K,K)-gram kernel computes the same iteration
    as the streamed kernel fed the broadcast (K,K,M) tensor."""
    import jax
    from insider_tpu.kernels.cd_pallas import elastic_net_cd_shared_pallas

    rng = np.random.default_rng(11)
    N, K, M = 60, 6, 700
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    XtX = jnp.matmul(R.T, R, precision=jax.lax.Precision.HIGHEST)
    Xty = jnp.matmul(R.T, data, precision=jax.lax.Precision.HIGHEST)
    beta0 = jnp.asarray(rng.standard_normal((K, M)) * 0.01, jnp.float32)
    XtXt = jnp.broadcast_to(XtX[:, :, None], (K, K, M))
    a = elastic_net_cd_pallas(XtXt, Xty, beta0, 2.0, 0.5, jnp.float32(1e-8),
                              max_sweeps=80, interpret=True, block=512)
    b = elastic_net_cd_shared_pallas(XtX, Xty, beta0, 2.0, 0.5,
                                     jnp.float32(1e-8), max_sweeps=80,
                                     interpret=True, block=512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=1e-5)
