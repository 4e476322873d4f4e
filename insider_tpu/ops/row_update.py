"""Row-side (confounder-level) batched ridge updates.

TPU-native equivalent of `optimize_row` (src/optimize.cpp:139-198) and the
standalone `fit_interaction` (src/fit_interaction.cpp:10-90).

The reference loops over confounder levels with OpenMP, assembling per-level
normal equations from gathered member rows.  Here the whole confounder updates
in a handful of large batched ops:

  masked:  XtX_l = sum_{i in level l} F diag(w_i) F^T
              ==> segment-sum the mask over levels, then one (L,M)@(M,K^2)
                  matmul against the elementwise factor outer-product table.
           Xty_l = F @ (segment-sum of masked residual)^T
  dense:   XtX_l = n_l * gram,  Xty_l = F @ (segment-sum of residual)^T
  solve:   batched K x K Cholesky solve over all L levels at once.

This replaces the reference's per-row "Gram complement" trick
(src/optimize.cpp:170) — a CPU cache optimization — with direct masked
accumulation, which maps onto the MXU as dense matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST


def factor_outer_table(F: jax.Array) -> jax.Array:
    """(K,M) -> (K*K, M) table of f_kj * f_lj, shared by masked gram builds."""
    K, M = F.shape
    return (F[:, None, :] * F[None, :, :]).reshape(K * K, M)


def level_gram_masked(mask_by_level: jax.Array, F: jax.Array) -> jax.Array:
    """Per-level masked Grams: (L,M) x (K,M) -> (L,K,K).

    mask_by_level[l, j] = number of member rows of level l with entry (i, j)
    observed (the segment-sum of the 0/1 train mask over the level).
    """
    K = F.shape[0]
    PF = factor_outer_table(F)
    XtX = jnp.matmul(mask_by_level, PF.T, precision=HIGHEST)
    return XtX.reshape(-1, K, K)


def _ridge_solve_batched(XtX: jax.Array, Xty: jax.Array, lam) -> jax.Array:
    """Solve (XtX_l + lam*I) v_l = Xty_l for all l.  XtX: (L,K,K), Xty: (L,K).

    SPD by construction (+ridge); uses the unrolled vectorized Gauss-Jordan
    (ops/linalg.py) — the TPU-friendly analog of the reference's
    solve(likely_sympd) (src/optimize.cpp:175).
    """
    from insider_tpu.ops.linalg import spd_solve

    K = XtX.shape[-1]
    A = XtX + lam * jnp.eye(K, dtype=XtX.dtype)
    return spd_solve(A, Xty)


def update_row_factor_masked(
    residual_plus: jax.Array,  # (N, M) residual with this confounder added back
    mask: jax.Array,           # (N, M) 0/1 train indicator
    F: jax.Array,              # (K, M) column factor
    codes: jax.Array,          # (N,) int32 level codes in [0, L)
    n_levels: int,
    lam: float,
) -> jax.Array:
    """Masked (tuning==1) per-level ridge, src/optimize.cpp:150-176."""
    seg = lambda x: jax.ops.segment_sum(x, codes, num_segments=n_levels)
    Mw = seg(mask)                                   # (L, M)
    S = seg(mask * residual_plus)                    # (L, M)
    XtX = level_gram_masked(Mw, F)                   # (L, K, K)
    Xty = jnp.matmul(S, F.T, precision=HIGHEST)      # (L, K)
    return _ridge_solve_batched(XtX, Xty, lam)


def update_row_factor_dense(
    residual_plus: jax.Array,
    F: jax.Array,
    gram: jax.Array,           # (K, K) = F F^T
    codes: jax.Array,
    n_levels: int,
    lam: float,
) -> jax.Array:
    """Dense (tuning==0) fast path, src/optimize.cpp:178-191."""
    seg = lambda x: jax.ops.segment_sum(x, codes, num_segments=n_levels)
    counts = seg(jnp.ones(codes.shape[0], F.dtype))  # (L,)
    S = seg(residual_plus)                           # (L, M)
    XtX = counts[:, None, None] * gram               # (L, K, K)
    Xty = jnp.matmul(S, F.T, precision=HIGHEST)
    return _ridge_solve_batched(XtX, Xty, lam)


def fit_interaction(
    residual: jax.Array,
    train_indicator: jax.Array,
    interaction_codes: jax.Array,
    column_factor: jax.Array,
    masked: bool = True,
) -> jax.Array:
    """Standalone per-level least-squares op (src/fit_interaction.cpp:10-90).

    The reference compiles this but never calls it (not in the export table,
    src/RcppExports.cpp:112-119); interactions are folded into the confounder
    list in R instead (R/insider.R:34-40).  We expose it for parity.  Note the
    reference solves the *unregularized* normal equations (its `lambda`
    argument is unused, fit_interaction.cpp:54,82); we mirror that but add a
    tiny jitter-free exact solve via the same batched path with lam=0.
    """
    codes = jnp.asarray(interaction_codes, jnp.int32)
    # Host-level API: codes must be concrete so the output shape (L, K) is known.
    n_levels = int(codes.max()) + 1
    F = column_factor
    if masked:
        return update_row_factor_masked(
            residual, train_indicator, F, codes, n_levels, lam=0.0
        )
    gram = jnp.matmul(F, F.T, precision=HIGHEST)
    return update_row_factor_dense(residual, F, gram, codes, n_levels, lam=0.0)
