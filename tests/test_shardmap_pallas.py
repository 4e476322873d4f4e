"""shard_map + Pallas CD (interpret mode) on the virtual mesh: the sharded
kernel path must equal the unsharded kernel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import insider_tpu.kernels.cd_pallas as cdp
from insider_tpu.config import ShardingConfig
from insider_tpu.ops import col_update
from insider_tpu.sharding.mesh import make_mesh


@pytest.fixture()
def interp_kernel(monkeypatch):
    orig = cdp.elastic_net_cd_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(cdp, "elastic_net_cd_pallas", interp)
    yield


def test_shardmap_cd_matches_unsharded(interp_kernel):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    rng = np.random.default_rng(0)
    n, k, m = 40, 4, 256
    R = rng.standard_normal((n, k)).astype(np.float32)
    data = rng.standard_normal((n, m)).astype(np.float32)
    mask = (rng.random((n, m)) < 0.85).astype(np.float32)
    F0 = (rng.standard_normal((k, m)) * 0.01).astype(np.float32)
    mesh = make_mesh(ShardingConfig(rows=2, cols=4))

    kwargs = dict(lam=1.0, alpha=0.5, tol=jnp.float32(1e-9),
                  key=jax.random.PRNGKey(5), max_sweeps=40, use_pallas=True)
    Fa, _, _ = col_update.update_columns_masked(
        jnp.asarray(data), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(F0), **kwargs)
    Fb, _, _ = col_update.update_columns_masked(
        jnp.asarray(data), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(F0), mesh=mesh, **kwargs)
    np.testing.assert_allclose(np.asarray(Fa), np.asarray(Fb), rtol=1e-5,
                               atol=1e-6)
