"""Compensated summation vs numpy float64."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insider_tpu.ops import precise


@pytest.mark.parametrize("shape", [(7,), (64,), (377, 5000), (123, 457)])
def test_sum_squares_matches_f64(shape):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    hi, lo = jax.jit(precise.sum_squares_ds)(jnp.asarray(x))
    got = precise.finalize(hi, lo)
    want = float(np.sum(x.astype(np.float64) ** 2))
    assert abs(got - want) <= 1e-12 * abs(want)


def test_sum_abs_and_sum():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1000, 321)).astype(np.float32) * 100
    got = precise.finalize(*jax.jit(precise.sum_abs_ds)(jnp.asarray(x)))
    want = float(np.abs(x.astype(np.float64)).sum())
    assert abs(got - want) <= 1e-12 * abs(want)
    got = precise.finalize(*jax.jit(precise.sum_ds)(jnp.asarray(x)))
    want = float(x.astype(np.float64).sum())
    assert abs(got - want) <= 1e-10 * np.abs(x).sum()


def test_catastrophic_cancellation_case():
    # Alternating large +/- values: naive f32 sum is garbage.
    n = 1 << 20
    x = np.empty(n, np.float32)
    x[0::2] = 1e7
    x[1::2] = -1e7
    x[-1] = 3.5
    got = precise.finalize(*jax.jit(precise.sum_ds)(jnp.asarray(x)))
    want = float(x.astype(np.float64).sum())
    assert got == pytest.approx(want, abs=1e-6)


def test_two_prod_exact():
    a = np.float32(1.0000001)
    b = np.float32(3.0000002)
    p, e = precise.two_prod(jnp.float32(a), jnp.float32(b))
    exact = float(a) * float(b)  # f64 product of f32 values is exact here
    assert float(p) + float(e) == pytest.approx(exact, rel=1e-15)
