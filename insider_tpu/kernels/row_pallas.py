"""Pallas TPU kernels for the row-side update's big contractions.

Two fused reductions whose XLA forms are HBM-bound on materialized
(N, M)- or (K^2, M)-scale intermediates (PROFILE_r03):

  row_xty_pallas:   (E^T (mask .* (R_minus @ F))) @ F^T          -> (L, K)
      The XLA path writes P = R_minus @ F (an (N, M) f32, 67 MB at flagship
      scale) to HBM and reads it back per confounder per iteration — 4x
      ~200 MB of traffic per iteration for a (L, K) result.  Here each
      column block's prediction lives only in VMEM: per block, P_blk =
      R_minus @ F_blk on the MXU, masked elementwise, contracted with E and
      F_blk, and accumulated into the tiny output.  HBM traffic: one pass
      over the mask + F.

  level_gram_pallas:  Mw_cat @ outer_table(F)^T  ->  (sum_L, K, K)
      The XLA path materializes the (K^2, M) factor outer-product table
      (102 MB) per iteration.  Here the table is built per block in VMEM.

Both kernels accumulate across a 1-D grid over column blocks into a
revisited output block (TPU keeps it in VMEM across grid steps).  Exact
same math as the jnp forms modulo f32 block-accumulation order; CPU tests
compare against them in interpret mode (tests/test_row_pallas.py).

Sharding: not GSPMD-partitionable — the driver wraps calls in shard_map
with a psum over the mesh (each device contributes its local block's
partial (L, K) / (L, K, K) sums; see train/als.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024
HIGHEST = lax.Precision.HIGHEST


def _xty_kernel(e_ref, r_ref, mask_ref, f_ref, out_ref, *, nblocks: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    P = jnp.dot(r_ref[:], f_ref[:], precision=HIGHEST,
                preferred_element_type=jnp.float32)          # (N, BM)
    masked = mask_ref[:] * P
    T = jnp.dot(e_ref[:].T, masked, precision=HIGHEST,
                preferred_element_type=jnp.float32)          # (L, BM)
    out_ref[:] += jnp.dot(T, f_ref[:].T, precision=HIGHEST,
                          preferred_element_type=jnp.float32)  # (L, K)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def row_xty_pallas(
    E: jax.Array,        # (N, L) one-hot membership
    R_minus: jax.Array,  # (N, K) row factor excluding this confounder
    mask: jax.Array,     # (N, M) 0/1 train indicator (f32)
    F: jax.Array,        # (K, M) column factor
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """(E^T (mask .* (R_minus F))) F^T with no (N, M) HBM intermediate."""
    N, L = E.shape
    K, M = F.shape
    BM = min(block, max(128, 1 << (M - 1).bit_length()))
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        pad = Mp - M
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        F = jnp.pad(F, ((0, 0), (0, pad)))
    nblocks = Mp // BM

    kernel = functools.partial(_xty_kernel, nblocks=nblocks)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((N, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, K), jnp.float32),
        interpret=interpret,
    )(E, R_minus, mask, F)


def _gram_kernel(mw_ref, f_ref, out_ref, *, K: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    f = f_ref[:]                                             # (K, BM)
    PF = (f[:, None, :] * f[None, :, :]).reshape(K * K, -1)  # (K^2, BM)
    out_ref[:] += jnp.dot(mw_ref[:], PF.T, precision=HIGHEST,
                          preferred_element_type=jnp.float32)  # (L, K^2)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def level_gram_pallas(
    Mw: jax.Array,       # (L, M) per-level mask counts (any/all confounders)
    F: jax.Array,        # (K, M)
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Mw @ outer_table(F)^T -> (L, K, K), table built blockwise in VMEM."""
    L, M = Mw.shape
    K = F.shape[0]
    BM = min(block, max(128, 1 << (M - 1).bit_length()))
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        pad = Mp - M
        Mw = jnp.pad(Mw, ((0, 0), (0, pad)))
        F = jnp.pad(F, ((0, 0), (0, pad)))
    nblocks = Mp // BM

    kernel = functools.partial(_gram_kernel, K=K)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((L, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, K * K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, K * K), jnp.float32),
        interpret=interpret,
    )(Mw, F)
    return out.reshape(L, K, K)
