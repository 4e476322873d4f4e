"""shard_map + Pallas CD (interpret mode) on the virtual mesh: the sharded
kernel path must equal the unsharded kernel path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import insider_tpu.kernels.cd_packed as cdpk
from insider_tpu.config import ShardingConfig
from insider_tpu.ops import col_update
from insider_tpu.sharding.mesh import make_mesh


@pytest.fixture()
def interp_kernel(monkeypatch):
    import insider_tpu.kernels.gram_pallas as gramp

    # the driver's cd dispatch uses the sublane-packed kernels; the
    # streamed path additionally builds its grams with the
    # col_gram_xty_pallas kernel
    for mod, name in ((cdpk, "elastic_net_cd_packed_pallas"),
                      (cdpk, "elastic_net_cd_fused_packed_pallas"),
                      (gramp, "col_gram_xty_pallas")):
        orig = getattr(mod, name)

        def interp(*args, _orig=orig, **kw):
            kw["interpret"] = True
            return _orig(*args, **kw)

        monkeypatch.setattr(mod, name, interp)
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

    # cd_warm_start=False: this test exercises the packed CD kernels
    # under shard_map (the warm default routes through FSS)
    kwargs = dict(lam=1.0, alpha=0.5, tol=jnp.float32(1e-9),
                  key=jax.random.PRNGKey(5), max_sweeps=40, use_pallas=True,
                  cd_warm_start=False)
    Fa, _, _ = col_update.update_columns_masked(
        jnp.asarray(data), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(F0), **kwargs)
    Fb, _, _ = col_update.update_columns_masked(
        jnp.asarray(data), jnp.asarray(mask), jnp.asarray(R),
        jnp.asarray(F0), mesh=mesh, **kwargs)
    np.testing.assert_allclose(np.asarray(Fa), np.asarray(Fb), rtol=1e-5,
                               atol=1e-6)


def test_shardmap_fused_fss_matches_unsharded(monkeypatch):
    # The gram-fused FSS kernel under shard_map on a (1, 8) mesh (rows
    # local) must equal its unsharded run.
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import insider_tpu.kernels.fss_pallas as fsp

    orig = fsp.feature_sign_fused_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(fsp, "feature_sign_fused_pallas", interp)

    rng = np.random.default_rng(4)
    n, k, m = 40, 4, 1024
    R = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    mask = jnp.asarray(rng.random((n, m)) < 0.9, jnp.float32)
    data = jnp.asarray(rng.standard_normal((n, m)), jnp.float32)
    F0 = jnp.asarray(rng.standard_normal((k, m)) * 0.01, jnp.float32)
    kw = dict(lam=1.0, alpha=0.5, tol=jnp.float32(1e-9),
              key=jax.random.PRNGKey(5), max_sweeps=40, use_pallas=True,
              solver="fss")
    mesh = make_mesh(ShardingConfig(rows=1, cols=8))
    Fa, _, tag_a = col_update.update_columns_masked(
        data, mask, R, F0, **kw)
    Fb, _, tag_b = col_update.update_columns_masked(
        data, mask, R, F0, mesh=mesh, **kw)
    assert int(tag_a) == -3 and int(tag_b) == -3
    np.testing.assert_allclose(np.asarray(Fa), np.asarray(Fb), rtol=1e-5,
                               atol=1e-6)
