"""Single-problem solver entry points mirroring the reference's exported
C++ functions (src/RcppExports.cpp:112-119: `coordinate_descent`,
`strong_coordinate_descent`) — thin wrappers over the vectorized CD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from insider_tpu.ops.col_update import elastic_net_cd


def _solve_one(X, y, wstart, lam, alpha, tol, use_strong_rule, seed):
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    w0 = jnp.asarray(wstart, jnp.float32)
    XtX = jnp.matmul(X.T, X)
    Xty = jnp.matmul(X.T, y)
    beta, _, _ = elastic_net_cd(
        XtX[None], Xty[:, None], w0[:, None], float(lam), float(alpha),
        jnp.float32(tol), jax.random.PRNGKey(seed), max_sweeps=1000,
        use_strong_rule=use_strong_rule,
    )
    return np.asarray(beta[:, 0])


def coordinate_descent(X, y, wstart, lam, alpha, XtX=None, Xty=None,
                       tol=1e-5, seed=0):
    """Plain cyclic CD (src/coordinate_descent.cpp:11-54).  The reference
    reads an uninitialized loss on its first convergence check (:28, latent
    UB); here the first sweep always runs and convergence is decided from
    exact per-sweep decrements."""
    del XtX, Xty  # recomputed internally; kept for signature parity
    return _solve_one(X, y, wstart, lam, alpha, tol, False, seed)


def strong_coordinate_descent(X, y, wstart, lam, alpha, XtX=None, Xty=None,
                              tol=1e-5, seed=0):
    """Strong-rule CD with KKT reactivation (src/coordinate_descent.cpp:57-127)."""
    del XtX, Xty
    return _solve_one(X, y, wstart, lam, alpha, tol, True, seed)
