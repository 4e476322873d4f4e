"""Model state pytree and initialization.

The reference keeps its state as an R list of per-confounder factor matrices
plus the shared column factor, aliased into C++ (src/optimize.cpp:281-291).
Here the state is an explicit JAX pytree so it can be jit-carried, donated,
sharded, and checkpointed.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class InsiderState:
    """Factor state for one optimize() run.

    Attributes:
      cfd_factors: list of (L_v, K) factor matrices, one per discrete
        confounder (incl. the interaction pseudo-confounder), the V_v of
        SURVEY.md §0.  Reference: `cfd_matrices` (src/optimize.cpp:281-291).
      ctns_factor: (P, K) coefficient matrix for continuous covariates (the W),
        or None.  Reference: last entry of cfd_matrices when inc_continuous==1.
      column_factor: (K, M) shared gene factor (the F).
      key: jax PRNG key threading CD sweep permutations.
    """

    def __init__(self, cfd_factors, ctns_factor, column_factor, key):
        self.cfd_factors = list(cfd_factors)
        self.ctns_factor = ctns_factor
        self.column_factor = column_factor
        self.key = key

    def tree_flatten(self):
        children = (self.cfd_factors, self.ctns_factor, self.column_factor, self.key)
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def latent_dim(self) -> int:
        return self.column_factor.shape[0]

    def __repr__(self):
        shapes = [tuple(f.shape) for f in self.cfd_factors]
        return (
            f"InsiderState(cfd={shapes}, "
            f"ctns={None if self.ctns_factor is None else tuple(self.ctns_factor.shape)}, "
            f"F={tuple(self.column_factor.shape)})"
        )


def init_state(
    key: jax.Array,
    n_levels: Tuple[int, ...],
    n_cols: int,
    latent_dim: int,
    n_ctns: int = 0,
    init_std: float = 1e-3,
    dtype=jnp.float32,
) -> InsiderState:
    """Fresh N(0, init_std^2) init for every factor (R/utils.R:40-43).

    n_levels: number of levels per discrete confounder (incl. interaction).
    n_ctns: number of continuous covariate columns (P); 0 disables.
    """
    n_factors = len(n_levels) + (1 if n_ctns else 0) + 1
    keys = jax.random.split(key, n_factors + 1)
    cfd = [
        (init_std * jax.random.normal(keys[i], (lv, latent_dim))).astype(dtype)
        for i, lv in enumerate(n_levels)
    ]
    idx = len(n_levels)
    ctns = None
    if n_ctns:
        ctns = (init_std * jax.random.normal(keys[idx], (n_ctns, latent_dim))).astype(dtype)
        idx += 1
    column = (init_std * jax.random.normal(keys[idx], (latent_dim, n_cols))).astype(dtype)
    return InsiderState(cfd, ctns, column, keys[-1])
