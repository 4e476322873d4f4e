"""Pallas TPU kernels for the row-side update's big contractions.

Two fused reductions whose XLA forms are HBM-bound on materialized
(N, M)- or (K^2, M)-scale intermediates (PROFILE_r03):

  row_xty_pallas:   (D - E^T (mask .* (R_minus @ F))) @ F^T      -> (L, K)
      The XLA path writes P = R_minus @ F (an (N, M) f32, 67 MB at flagship
      scale) to HBM and reads it back per confounder per iteration — 4x
      ~200 MB of traffic per iteration for a (L, K) result.  Here each
      column block's prediction lives only in VMEM: per block, P_blk =
      R_minus @ F_blk on the MXU, masked elementwise, contracted with E,
      subtracted from the constant block D_blk = (E^T (mask .* data))_blk
      BEFORE the final contraction with F_blk, and accumulated into the
      tiny output.  Subtracting inside the kernel (per block, before the
      (L,K) contraction) avoids the catastrophic-cancellation of computing
      D@F^T - T@F^T as a difference of two large (L, K) contractions
      (ADVICE r3): the per-block S = D_blk - T_blk is small where it should
      be small, so the Xty sum carries full relative precision.  HBM
      traffic: one pass over mask + D + F.

  level_gram_pallas:  Mw_cat @ outer_table(F)^T  ->  (sum_L, K, K)
      The XLA path materializes the (K^2, M) factor outer-product table
      (102 MB) per iteration.  Here the table is built per block in VMEM.

Both kernels accumulate across a 1-D grid over column blocks into a
revisited output block (TPU keeps it in VMEM across grid steps).  Exact
same math as the jnp forms modulo f32 block-accumulation order; CPU tests
compare against them in interpret mode (tests/test_row_pallas.py).

Block sizes are VMEM-budgeted from the actual resident tensors (N-aware —
ADVICE r3: a fixed block exhausts VMEM at large row counts), and
row_kernels_feasible() tells the driver when to fall back to the jnp path
instead of failing at compile time.

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

# VMEM budget for auto block sizing: of the ~16 MB scoped VMEM, leave
# headroom for Mosaic's own copies/alignment (the fss_pallas footprint model
# was measured accurate to ~2%, so 13 MB is conservative without starving
# block width).
_VMEM_BUDGET = 13 * 1024 * 1024


def _auto_block_xty(N: int, L: int, K: int, block: int, M: int) -> int:
    """Lane-aligned column block for row_xty_pallas fitting the budget.

    Resident per lane: mask block double-buffered (8N B), P = R_minus@F_blk
    f32 (4N B), the masked product (4N B, conservatively counted — XLA may
    fuse it into the dot operand), F block double-buffered (8K B), T (4L B).
    Fixed: E (N, L) and R (N, K) input buffers (x2), out (L, K) x2.
    Returns 0 when even a 128-lane block does not fit (caller falls back).
    """
    fixed = 2 * 4 * (N * L + N * K + L * K)
    per_lane = 16 * N + 8 * K + 4 * L
    cap = (_VMEM_BUDGET - fixed) // per_lane
    cap = (cap // 128) * 128
    if cap < 128:
        return 0
    want = min(block, max(128, 1 << (M - 1).bit_length()))
    return max(128, min(want, cap))


def _auto_block_gram(L: int, K: int, block: int, M: int) -> int:
    """Lane-aligned column block for level_gram_pallas (N-independent).

    Per lane: Mw x2 (8L B), F x2 (8K B), PF table (4K^2 B).  Fixed: out
    (L, K^2) x2.
    """
    fixed = 2 * 4 * L * K * K
    per_lane = 8 * L + 8 * K + 4 * K * K
    cap = (_VMEM_BUDGET - fixed) // per_lane
    cap = (cap // 128) * 128
    if cap < 128:
        return 0
    want = min(block, max(128, 1 << (M - 1).bit_length()))
    return max(128, min(want, cap))


def row_kernels_feasible(N: int, n_levels, K: int) -> bool:
    """Can the fused row kernels run at this shape (>=128-lane blocks)?

    The driver (train/als.py) checks this before dispatching
    use_row_kernels; infeasible shapes take update_row_factor_masked_fast
    instead of failing at compile time (ADVICE r3).  Large row counts that
    the single-shot xty kernel cannot hold in VMEM dispatch to the
    row-chunked variant (round 5), so feasibility is the union.
    """
    L_max = max(n_levels)
    L_tot = sum(n_levels)
    if _auto_block_gram(L_tot, K, DEFAULT_BLOCK, 128) < 128:
        return False
    if _auto_block_xty(N, L_max, K, DEFAULT_BLOCK, 128) >= 128:
        return True
    return _auto_chunks_xty(N, L_max, K, 128)[0] >= 128


def row_xty_auto(E, R_minus, mask, D, F, interpret: bool = False):
    """Dispatch: single-shot kernel when the whole (N, L)/(N, K) operands
    fit in VMEM (flagship shapes), row-chunked otherwise (capacity
    shapes)."""
    N, L = E.shape
    K, M = F.shape
    if _auto_block_xty(N, L, K, DEFAULT_BLOCK, M) >= 128:
        return row_xty_pallas(E, R_minus, mask, D, F, interpret=interpret)
    return row_xty_chunked_pallas(E, R_minus, mask, D, F,
                                  interpret=interpret)


def _xty_kernel(e_ref, r_ref, mask_ref, d_ref, f_ref, out_ref,
                *, exact01: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    P = jnp.dot(r_ref[:], f_ref[:], precision=HIGHEST,
                preferred_element_type=jnp.float32)          # (N, BM)
    m = mask_ref[:]
    if m.dtype != jnp.float32:
        # uint8 memory-lean mask storage; Mosaic has no unsigned->float
        # cast, so widen via int32 (exact for 0/1).
        m = m.astype(jnp.int32).astype(jnp.float32)
    masked = m * P
    if exact01:
        # E is exact in bf16: split the real-valued operand into three bf16
        # planes (exact) against bf16 E — 3 MXU passes instead of HIGHEST's
        # 6, identical math (the per-operand precision trick of
        # ops/col_update.py, applied in-kernel).  Worth it only when L is
        # big enough for the dot to dominate the split's elementwise cost.
        from insider_tpu.kernels.fss_pallas import _bf16_planes

        e16 = e_ref[:].astype(jnp.bfloat16).T                # (L, N)
        hi, mid, lo = _bf16_planes(masked)
        T = (jnp.dot(e16, hi, preferred_element_type=jnp.float32)
             + jnp.dot(e16, mid, preferred_element_type=jnp.float32)
             + jnp.dot(e16, lo, preferred_element_type=jnp.float32))
    else:
        T = jnp.dot(e_ref[:].T, masked, precision=HIGHEST,
                    preferred_element_type=jnp.float32)      # (L, BM)
    # S = D_blk - T in VMEM BEFORE the (L, K) contraction: the residual-
    # scale values cancel here, where they are individually small, not in
    # the accumulated (L, K) sums (ADVICE r3 cancellation fix).
    S = d_ref[:] - T
    out_ref[:] += jnp.dot(S, f_ref[:].T, precision=HIGHEST,
                          preferred_element_type=jnp.float32)  # (L, K)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def row_xty_pallas(
    E: jax.Array,        # (N, L) one-hot membership
    R_minus: jax.Array,  # (N, K) row factor excluding this confounder
    mask: jax.Array,     # (N, M) 0/1 train indicator (f32)
    D: jax.Array,        # (L, M) = E^T (mask .* data), per-problem constant
    F: jax.Array,        # (K, M) column factor
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """(D - E^T (mask .* (R_minus F))) F^T with no (N, M) HBM intermediate.

    This is the masked row update's Xty (src/optimize.cpp:161-172 in direct
    form): the add-back residual is data - R_minus F, so
    E^T(W .* resid) = D - E^T(W .* (R_minus F)).
    """
    N, L = E.shape
    K, M = F.shape
    BM = _auto_block_xty(N, L, K, block, M)
    if BM == 0:
        raise ValueError(
            f"row_xty_pallas infeasible at N={N}, L={L}, K={K}: check "
            "row_kernels_feasible() before dispatching")
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        pad = Mp - M
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        D = jnp.pad(D, ((0, 0), (0, pad)))
        F = jnp.pad(F, ((0, 0), (0, pad)))
    nblocks = Mp // BM

    kernel = functools.partial(_xty_kernel, exact01=(L >= 8))
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((N, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, K), jnp.float32),
        interpret=interpret,
    )(E, R_minus, mask, D, F)


def _xty_chunked_kernel(e_ref, r_ref, mask_ref, d_ref, f_ref, out_ref,
                        t_acc, *, exact01: bool, N: int, M: int, BN: int,
                        nrb: int):
    """Row-chunked variant: grid (column blocks OUTER, row chunks INNER).

    The (L, BM) masked-prediction sums T accumulate in VMEM across the row
    chunks of each column block; D is subtracted from the COMPLETE T before
    the (L, K) contraction — same per-column-block cancellation property as
    the single-shot kernel (ADVICE r3), now independent of N."""
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i == 0)
    def _():
        t_acc[:] = jnp.zeros_like(t_acc)

    BM = t_acc.shape[-1]
    r = r_ref[:]                                             # (BN, K)
    m = mask_ref[:]
    if m.dtype != jnp.float32:
        m = m.astype(jnp.int32).astype(jnp.float32)
    e = e_ref[:]
    if e.dtype != jnp.float32:
        e = e.astype(jnp.int32).astype(jnp.float32)
    if N % BN != 0:
        # zero ragged tail rows (OOB garbage may be NaN: 0*NaN = NaN, so
        # the masked product below needs finite operands)
        rv = (i * BN + lax.broadcasted_iota(jnp.int32, (BN, 1), 0)) < N
        r = jnp.where(rv, r, 0.0)
        m = jnp.where(rv, m, 0.0)
        e = jnp.where(rv, e, 0.0)
    P = jnp.dot(r, f_ref[:], precision=HIGHEST,
                preferred_element_type=jnp.float32)          # (BN, BM)
    masked = m * P
    if M % BM != 0:
        # the (L, K) output is a reduction over ALL columns, so OOB
        # column-tail garbage in mask/D/F would contaminate it (unlike the
        # solver kernels, whose padded output columns are just sliced off)
        cv = (j * BM + lax.broadcasted_iota(jnp.int32, (1, BM), 1)) < M
        masked = jnp.where(cv, masked, 0.0)
    if exact01:
        from insider_tpu.kernels.fss_pallas import _bf16_planes

        e16 = e.astype(jnp.bfloat16).T                       # (L, BN)
        hi, mid, lo = _bf16_planes(masked)
        t_acc[:] += (jnp.dot(e16, hi, preferred_element_type=jnp.float32)
                     + jnp.dot(e16, mid, preferred_element_type=jnp.float32)
                     + jnp.dot(e16, lo, preferred_element_type=jnp.float32))
    else:
        t_acc[:] += jnp.dot(e.T, masked, precision=HIGHEST,
                            preferred_element_type=jnp.float32)

    @pl.when(i == nrb - 1)
    def _():
        S = d_ref[:] - t_acc[:]
        f = f_ref[:]
        if M % BM != 0:
            cv = (j * BM
                  + lax.broadcasted_iota(jnp.int32, (1, BM), 1)) < M
            S = jnp.where(cv, S, 0.0)
            f = jnp.where(cv, f, 0.0)
        out_ref[:] += jnp.dot(S, f.T, precision=HIGHEST,
                              preferred_element_type=jnp.float32)


def _auto_chunks_xty(N: int, L: int, K: int, M: int):
    """(BN, BM) for the chunked kernel: per lane mask x2 + P + product
    (~13 BN B with uint8 masks, 20 conservatively), D x2 + T_acc (12 L B),
    F x2 (8 K B); fixed E/R chunks."""
    BN = min(1024, max(128, 1 << (N - 1).bit_length()))
    while BN >= 128:
        fixed = 2 * 4 * BN * (L + K)
        per_lane = 20 * BN + 12 * L + 8 * K
        cap = (_VMEM_BUDGET - fixed) // per_lane
        cap = (cap // 128) * 128
        if cap >= 128:
            return BN, min(512, cap, max(128, 1 << (M - 1).bit_length()))
        BN //= 2
    return 0, 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_xty_chunked_pallas(
    E: jax.Array,        # (N, L) one-hot membership
    R_minus: jax.Array,  # (N, K)
    mask: jax.Array,     # (N, M) 0/1, f32 or uint8
    D: jax.Array,        # (L, M)
    F: jax.Array,        # (K, M)
    interpret: bool = False,
) -> jax.Array:
    """row_xty_pallas for row counts the single-shot kernel cannot hold in
    VMEM: 2-D grid over (column blocks x row chunks).  Identical math; the
    f32 accumulation order differs (chunked)."""
    N, L = E.shape
    K, M = F.shape
    BN, BM = _auto_chunks_xty(N, L, K, M)
    if BN == 0:
        raise ValueError(f"row_xty_chunked_pallas infeasible at L={L}")
    nrb = -(-N // BN)
    ncb = -(-M // BM)

    kernel = functools.partial(_xty_chunked_kernel, exact01=(L >= 8),
                               N=N, M=M, BN=BN, nrb=nrb)
    return pl.pallas_call(
        kernel,
        grid=(ncb, nrb),
        in_specs=[
            pl.BlockSpec((BN, L), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BM), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, BM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, K), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L, BM), jnp.float32)],
        interpret=interpret,
    )(E, R_minus, mask, D, F)


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
    BM = _auto_block_gram(L, K, block, M)
    if BM == 0:
        raise ValueError(
            f"level_gram_pallas infeasible at L={L}, K={K}: check "
            "row_kernels_feasible() before dispatching")
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
