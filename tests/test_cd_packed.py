"""Interpret-mode correctness of the sublane-packed CD kernels
(kernels/cd_packed.py) against the unpacked kernels and the jnp path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insider_tpu.kernels.cd_packed import (
    elastic_net_cd_fused_packed_pallas,
    elastic_net_cd_packed_pallas,
)
from insider_tpu.kernels.cd_pallas import (
    elastic_net_cd_fused_pallas,
    elastic_net_cd_pallas,
)
from insider_tpu.ops.col_update import col_gram_masked_t

HI = jax.lax.Precision.HIGHEST


def _problem(N, K, M, seed=0):
    rng = np.random.default_rng(seed)
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    mask = jnp.asarray(rng.random((N, M)) > 0.1, jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    wx = mask * data
    XtXt = col_gram_masked_t(R, mask)
    Xty = jnp.matmul(R.T, wx, precision=HI)
    beta0 = jnp.asarray(rng.standard_normal((K, M)) * 0.01, jnp.float32)
    return R, mask, wx, XtXt, Xty, beta0


@pytest.mark.parametrize("N,K,M", [(40, 4, 700), (60, 6, 2100)])
def test_packed_matches_unpacked_streamed(N, K, M):
    R, mask, wx, XtXt, Xty, beta0 = _problem(N, K, M)
    a = elastic_net_cd_pallas(XtXt, Xty, beta0, 2.0, 0.5, jnp.float32(1e-8),
                              max_sweeps=80, interpret=True, block=1024)
    b = elastic_net_cd_packed_pallas(XtXt, Xty, beta0, 2.0, 0.5,
                                     jnp.float32(1e-8), max_sweeps=80,
                                     interpret=True, block=1024)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=1e-5)


def test_packed_fused_matches_unpacked_fused():
    N, K, M = 60, 6, 2100
    R, mask, wx, XtXt, Xty, beta0 = _problem(N, K, M, seed=1)
    a = elastic_net_cd_fused_pallas(mask, wx, R, beta0, 2.0, 0.5,
                                    jnp.float32(1e-8), max_sweeps=80,
                                    interpret=True, block=1024)
    b = elastic_net_cd_fused_packed_pallas(mask, wx, R, beta0, 2.0, 0.5,
                                           jnp.float32(1e-8), max_sweeps=80,
                                           interpret=True, block=1024)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=1e-5)


def test_packed_no_strong_rule_polish_semantics():
    # use_strong_rule=False is the plain-CD variant (fss polish analog)
    N, K, M = 40, 4, 1100
    R, mask, wx, XtXt, Xty, beta0 = _problem(N, K, M, seed=2)
    a = elastic_net_cd_pallas(XtXt, Xty, beta0, 2.0, 0.5, jnp.float32(1e-8),
                              max_sweeps=60, use_strong_rule=False,
                              interpret=True, block=1024)
    b = elastic_net_cd_packed_pallas(XtXt, Xty, beta0, 2.0, 0.5,
                                     jnp.float32(1e-8), max_sweeps=60,
                                     use_strong_rule=False, interpret=True,
                                     block=1024)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=1e-5)


def test_packed_padding_tail():
    # M far from a multiple of 8*BL: padded columns must stay zero
    N, K, M = 30, 3, 777
    R, mask, wx, XtXt, Xty, beta0 = _problem(N, K, M, seed=3)
    a = elastic_net_cd_pallas(XtXt, Xty, beta0, 1.5, 0.4, jnp.float32(1e-8),
                              max_sweeps=60, interpret=True, block=1024)
    b = elastic_net_cd_packed_pallas(XtXt, Xty, beta0, 1.5, 0.4,
                                     jnp.float32(1e-8), max_sweeps=60,
                                     interpret=True, block=1024)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=1e-5)


def test_fused_kernels_accept_uint8_masks():
    """Memory-lean uint8 mask storage: kernels convert per block in VMEM
    and must compute exactly what the f32-mask path computes."""
    from insider_tpu.kernels.row_pallas import row_xty_pallas

    N, K, M = 40, 4, 1100
    R, mask, wx, XtXt, Xty, beta0 = _problem(N, K, M, seed=7)
    mask_u8 = mask.astype(jnp.uint8)

    a = elastic_net_cd_fused_packed_pallas(mask, wx, R, beta0, 2.0, 0.5,
                                           jnp.float32(1e-8), max_sweeps=60,
                                           interpret=True, block=1024)
    b = elastic_net_cd_fused_packed_pallas(mask_u8, wx, R, beta0, 2.0, 0.5,
                                           jnp.float32(1e-8), max_sweeps=60,
                                           interpret=True, block=1024)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.default_rng(1)
    L = 5
    codes = rng.integers(0, L, N)
    E = jnp.asarray(np.eye(L, dtype=np.float32)[codes])
    D = jnp.matmul(E.T, wx, precision=HI)
    F = jnp.asarray(rng.standard_normal((K, M)), jnp.float32)
    r1 = row_xty_pallas(E, R, mask, D, F, block=512, interpret=True)
    r2 = row_xty_pallas(E, R, mask_u8, D, F, block=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
