"""Driver-level equivalence of the fused row-kernel path (train/als.py
use_row_kernels) against the jnp fast path, in interpret mode on the
virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import insider_tpu.kernels.row_pallas as rp
from insider_tpu.config import ShardingConfig
from insider_tpu.ops import row_update
from insider_tpu.sharding.mesh import make_mesh
from insider_tpu.train import als

HI = jax.lax.Precision.HIGHEST


@pytest.fixture()
def interp_kernels(monkeypatch):
    for name in ("row_xty_pallas", "level_gram_pallas"):
        orig = getattr(rp, name)

        def interp(*args, _orig=orig, **kw):
            kw["interpret"] = True
            return _orig(*args, **kw)

        monkeypatch.setattr(rp, name, interp)
    yield


@pytest.fixture()
def problem_bits():
    rng = np.random.default_rng(3)
    N, L, K, M = 48, 6, 4, 512
    codes = rng.integers(0, L, N)
    E = jnp.asarray(np.eye(L, dtype=np.float32)[codes])
    mask = jnp.asarray(rng.random((N, M)) > 0.1, jnp.float32)
    data = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    F = jnp.asarray(rng.standard_normal((K, M)), jnp.float32)
    R_minus = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)
    Mw = jnp.matmul(E.T, mask, precision=HI)
    D = jnp.matmul(E.T, mask * data, precision=HI)
    return E, mask, data, F, R_minus, Mw, D


def _kernel_path(mesh, E, mask, F, R_minus, Mw, D, lam):
    xtx = als._shard_level_gram(mesh, Mw, F)
    xty = als._shard_row_xty(mesh, E, R_minus, mask, D, F)
    return row_update._ridge_solve_batched(xtx, xty, lam)


def test_kernel_path_matches_jnp_fast_path(interp_kernels, problem_bits):
    E, mask, data, F, R_minus, Mw, D = problem_bits
    lam = jnp.float32(2.0)
    want = row_update.update_row_factor_masked_fast(
        E, Mw, D, mask, R_minus, F, lam)
    got = _kernel_path(None, E, mask, F, R_minus, Mw, D, lam)
    # In-kernel D - T subtraction (ADVICE r3): the old two-contraction form
    # needed rtol=5e-4; the cancellation-free kernel matches far tighter.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=1e-5)


def test_kernel_path_sharded_matches_unsharded(interp_kernels, problem_bits):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    E, mask, data, F, R_minus, Mw, D = problem_bits
    lam = jnp.float32(2.0)
    mesh = make_mesh(ShardingConfig(rows=2, cols=4))
    got = _kernel_path(mesh, E, mask, F, R_minus, Mw, D, lam)
    want = _kernel_path(None, E, mask, F, R_minus, Mw, D, lam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-5)
