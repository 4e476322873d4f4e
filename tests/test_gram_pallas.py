"""Streamed gram+Xty builder kernel vs the jnp forms (interpret mode).

kernels/gram_pallas.col_gram_xty_pallas must reproduce
ops/col_update.col_gram_masked_t and the HIGHEST-precision Xty matmul —
including ragged shapes (row chunks and column blocks that do not divide
N/M) and uint8 mask storage.  Reference semantics: src/optimize.cpp:207-219.
"""

import numpy as np
import pytest

import jax.numpy as jnp
from jax import lax

from insider_tpu.kernels.gram_pallas import col_gram_xty_pallas
from insider_tpu.ops.col_update import col_gram_masked_t


@pytest.mark.parametrize("shape", [(60, 300, 6), (377, 1111, 24),
                                   (520, 257, 12), (1100, 640, 8)])
def test_matches_jnp_gram_and_xty(shape):
    N, M, K = shape
    rng = np.random.default_rng(N + M)
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32) * 0.4
    mask = jnp.asarray(rng.random((N, M)) < 0.9, jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)

    g, xty = col_gram_xty_pallas(mask, data, R, interpret=True)
    g_ref = col_gram_masked_t(R, mask)
    xty_ref = jnp.matmul(R.T, mask * data,
                         precision=lax.Precision.HIGHEST)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(xty), np.asarray(xty_ref),
                               atol=3e-5 * float(jnp.max(jnp.abs(xty_ref))))


def test_uint8_mask_matches_f32_mask():
    N, M, K = 96, 384, 8
    rng = np.random.default_rng(5)
    R = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    mask = (rng.random((N, M)) < 0.85)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    g8, x8 = col_gram_xty_pallas(jnp.asarray(mask, jnp.uint8), data, R,
                                 interpret=True)
    gf, xf = col_gram_xty_pallas(jnp.asarray(mask, jnp.float32), data, R,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(g8), np.asarray(gf))
    np.testing.assert_array_equal(np.asarray(x8), np.asarray(xf))
