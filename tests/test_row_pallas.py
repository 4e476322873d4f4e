"""Interpret-mode correctness of the fused row-side kernels
(kernels/row_pallas.py) against their jnp forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insider_tpu.kernels.row_pallas import level_gram_pallas, row_xty_pallas
from insider_tpu.ops.row_update import factor_outer_table, level_gram_masked

HI = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize("N,L,K,M", [(37, 7, 6, 300), (64, 13, 8, 1024),
                                     (377, 107, 24, 2500)])
def test_row_xty_matches_jnp(N, L, K, M):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, L, N)
    E = jnp.asarray(np.eye(L, dtype=np.float32)[codes])
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    mask = jnp.asarray(rng.random((N, M)) > 0.1, jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((K, M)), jnp.float32)
    D = jnp.matmul(E.T, mask * data, precision=HI)

    got = row_xty_pallas(E, R, mask, D, F, block=512, interpret=True)
    P = jnp.matmul(R, F, precision=HI)
    T = jnp.matmul(E.T, mask * P, precision=HI)
    want = jnp.matmul(D - T, F.T, precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-3)


@pytest.mark.parametrize("L,K,M", [(9, 6, 300), (133, 24, 2500)])
def test_level_gram_matches_jnp(L, K, M):
    rng = np.random.default_rng(1)
    Mw = jnp.asarray(rng.integers(0, 200, (L, M)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((K, M)), jnp.float32)

    got = level_gram_pallas(Mw, F, block=512, interpret=True)
    want = level_gram_masked(Mw, F, factor_outer_table(F))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-2)


def test_row_xty_padding_tail_block():
    # M not a multiple of the block: padded columns are zero mask/D/F and
    # must contribute nothing.
    rng = np.random.default_rng(2)
    N, L, K, M = 40, 5, 4, 700
    codes = rng.integers(0, L, N)
    E = jnp.asarray(np.eye(L, dtype=np.float32)[codes])
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    mask = jnp.asarray(rng.random((N, M)) > 0.2, jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((K, M)), jnp.float32)
    D = jnp.matmul(E.T, mask * data, precision=HI)
    got = row_xty_pallas(E, R, mask, D, F, block=512, interpret=True)
    P = jnp.matmul(R, F, precision=HI)
    want = jnp.matmul(D - jnp.matmul(E.T, mask * P, precision=HI), F.T,
                      precision=HI)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-3)


def test_feasibility_gate():
    from insider_tpu.kernels.row_pallas import row_kernels_feasible

    # flagship shape: feasible
    assert row_kernels_feasible(377, [2, 16, 8, 107], 24)
    # BASELINE-target row counts: feasible via the row-chunked xty kernel
    # (round 5 — the r4 single-shot kernel capped N at VMEM)
    assert row_kernels_feasible(50_000, [2, 16, 8, 107], 24)
    assert row_kernels_feasible(500_000, [100], 32)
    # a level count whose (L, K^2) gram output cannot fit VMEM must still
    # report infeasible, not crash at compile time (ADVICE r3)
    assert not row_kernels_feasible(377, [5000], 24)


@pytest.mark.parametrize("shape", [(60, 300, 5, 6), (377, 1111, 16, 24),
                                   (700, 257, 33, 12)])
def test_chunked_matches_single_shot(shape):
    """row_xty_chunked_pallas (the large-N variant) == row_xty_pallas,
    including ragged row chunks, column tails, and uint8 masks."""
    from insider_tpu.kernels.row_pallas import (row_xty_chunked_pallas,
                                                row_xty_pallas)

    N, M, L, K = shape
    rng = np.random.default_rng(N)
    codes = rng.integers(0, L, N)
    E = jnp.asarray(np.eye(L, dtype=np.float32)[codes])
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32) * 0.3
    mask = jnp.asarray(rng.random((N, M)) < 0.9, jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((K, M)), jnp.float32) * 0.3
    D = jnp.matmul(E.T, mask * data)
    a = row_xty_pallas(E, R, mask, D, F, interpret=True)
    b = row_xty_chunked_pallas(E, R, mask.astype(jnp.uint8), D, F,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4 * float(jnp.max(jnp.abs(a)) + 1))
