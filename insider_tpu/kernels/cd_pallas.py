"""Pallas TPU kernel for the elastic-net coordinate-descent column update.

This is THE hot kernel (SURVEY.md §2, C3/C4).  The jnp path runs each CD
sweep as ~K small XLA ops over (K, M) arrays, re-reading the (M, K, K) Gram
tensor from HBM every sweep; at steady state that is hundreds of
dispatch-latency-bound ops per ALS iteration.  Here the *entire* CD solve —
strong-rule screening, all cyclic sweeps, per-column convergence freezing,
KKT reactivation — runs inside one kernel invocation per block of BM
columns, with the block's Grams, betas and residual-products resident in
VMEM.  HBM traffic is one read of (K*K+3K, BM) per block and one write of
(K, BM): the speed-of-light minimum.  Blocks early-exit independently when
all their columns converge.

Coordinate order, the TPU way: Mosaic lowers dynamic sublane indexing very
slowly, so instead of indexing coordinates at runtime the wrapper PERMUTES
the problem (rows of Xty/beta and both leading dims of XtX) with one random
order per call and the kernel sweeps coordinates in fixed order 0..K-1 —
fully static slices.  Net semantics: the reference draws a fresh randperm
per sweep per column (coordinate_descent.cpp:89); we draw one randperm per
column update shared across sweeps/columns.  Same stationary points (the
subproblem is convex), same expected behavior, hardware-shaped execution.
The jnp path (ops/col_update.elastic_net_cd) reproduces the kernel exactly
when given the same single permutation for every sweep.

Layout: column-major blocks — xtx as (K, K, BM), vectors as (K, BM) — so the
gene axis is the 128-wide lane dimension and all per-coordinate slices hit
static sublane offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024


def _cd_kernel(fscal_ref, xtx_ref, xty_ref, beta0_ref, out_ref,
               diag_s, s_s, active_s, conv_s,
               *, K: int, max_sweeps: int, use_strong_rule: bool):
    _cd_compute(fscal_ref, xtx_ref, xty_ref[:], beta0_ref[:], out_ref,
                diag_s, s_s, active_s, conv_s,
                K=K, max_sweeps=max_sweeps, use_strong_rule=use_strong_rule)


def _cd_shared_kernel(fscal_ref, xtx_ref, xty_ref, beta0_ref, out_ref,
                      diag_s, s_s, active_s, conv_s,
                      *, K: int, max_sweeps: int, use_strong_rule: bool):
    _cd_compute(fscal_ref, xtx_ref, xty_ref[:], beta0_ref[:], out_ref,
                diag_s, s_s, active_s, conv_s,
                K=K, max_sweeps=max_sweeps, use_strong_rule=use_strong_rule,
                shared_gram=True)


def _cd_compute(fscal_ref, xtx_ref, xty, beta0, out_ref,
                diag_s, s_s, active_s, conv_s,
                *, K: int, max_sweeps: int, use_strong_rule: bool,
                shared_gram: bool = False):
    """Kernel core: xtx_ref may be a streamed input block or a VMEM scratch
    the caller filled (the gram-fused variant); xty/beta0 are values.

    shared_gram=True: xtx_ref is ONE (K, K) gram shared by every column
    (the dense/partition=0 path, src/optimize.cpp:232-247), broadcast
    in-kernel — no (K, K, M) tensor ever exists in HBM (VERDICT r3 weak #8)
    and the s-init contraction rides the MXU."""
    lam = fscal_ref[0]
    alpha = fscal_ref[1]
    tol = fscal_ref[2]
    l1 = lam * alpha
    l2 = lam * (1.0 - alpha)

    BM = xty.shape[-1]

    # diag[k] = xtx[k, k, :] (static unroll)
    if shared_gram:
        ones_row = jnp.ones((1, BM), jnp.float32)
        diag_s[:] = jnp.concatenate(
            [xtx_ref[k, k:k + 1] * ones_row for k in range(K)], axis=0
        )
    else:
        diag_s[:] = jnp.concatenate(
            [xtx_ref[k, k, :][None] for k in range(K)], axis=0
        )

    if use_strong_rule:
        # coordinate_descent.cpp:74-79
        mx = jnp.max(jnp.abs(xty), axis=0, keepdims=True)        # (1, BM)
        thr = alpha * (2.0 * lam - mx)
        active = (jnp.abs(xty) >= thr).astype(jnp.float32)        # (K, BM)
        beta = beta0 * active
    else:
        active = jnp.ones((K, BM), jnp.float32)
        beta = beta0
    active_s[:] = active
    out_ref[:] = beta
    # s = XtX @ beta per column
    if shared_gram:
        s_s[:] = jnp.dot(xtx_ref[:], beta, precision=lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)      # MXU
    else:
        # contraction over j on the VPU (per-lane grams)
        s_s[:] = jnp.sum(xtx_ref[:] * beta[None, :, :], axis=1)   # (K, BM)
    conv_s[:] = jnp.zeros((1, BM), jnp.float32)

    # Sweep-loop invariants, hoisted (VERDICT r3 #3: the inner loop ran two
    # VPU divides and recomputed the guarded denominator per coordinate per
    # sweep — at K x sweeps x blocks repetitions that dominated the kernel).
    d_all = diag_s[:]                                             # (K, BM)
    denom_all = d_all + l2
    denom_all = jnp.where(denom_all > 0.0, denom_all, 1.0)        # guard d=0
    inv_denom = 1.0 / denom_all
    half_denom = 0.5 * denom_all
    inv_l1 = 1.0 / jnp.maximum(l1, 1e-30)

    def sweep_body(carry):
        sweep, _ = carry
        conv = conv_s[:]
        dec = jnp.zeros((1, BM), jnp.float32)
        # frozen-column/screened-coordinate mask: invariant within a sweep
        # (active only changes at KKT boundaries, conv per sweep).
        upd_all = active_s[:] * (1.0 - conv)                      # (K, BM)

        # Fixed cyclic order 0..K-1 (order randomized by the wrapper's
        # pre-permutation) — every slice below is static.
        for k in range(K):
            b_k = out_ref[k:k + 1, :]
            u = xty[k:k + 1, :] - s_s[k:k + 1, :] + b_k * d_all[k:k + 1, :]
            w = (jnp.sign(u) * jnp.maximum(jnp.abs(u) - l1, 0.0)
                 * inv_denom[k:k + 1, :])
            w = jnp.where(upd_all[k:k + 1, :] > 0.5, w, b_k)
            delta = w - b_k
            # Exact per-coordinate objective decrease in cancellation-free
            # form (see col_update docstring): at the soft-threshold optimum
            # u - (d+l2) w = l1*xi with xi in the |.| subdifferential, so
            #   f(o) - f(w) = 1/2 (d+l2) delta^2 + l1 (|o| - xi*o) >= 0
            # term by term — computable to full relative precision in f32,
            # unlike the u*delta form whose rounding floor can exceed tol.
            xi = jnp.where(
                w != 0.0, jnp.sign(w),
                jnp.clip(u * inv_l1, -1.0, 1.0),
            )
            dec = dec + (half_denom[k:k + 1, :] * delta * delta
                         + l1 * (jnp.abs(b_k) - xi * b_k))
            # XtX row k == column k (symmetric): rank-1 s maintenance
            if shared_gram:
                s_s[:] = s_s[:] + xtx_ref[:, k:k + 1] * delta  # (K,1)x(1,BM)
            else:
                s_s[:] = s_s[:] + xtx_ref[k] * delta
            out_ref[k:k + 1, :] = w

        cand = (1.0 - conv) * (jnp.abs(dec) <= tol).astype(jnp.float32)
        if use_strong_rule:
            # KKT reactivation (coordinate_descent.cpp:118-124)
            grad = s_s[:] - xty
            viol = ((1.0 - active_s[:])
                    * (jnp.abs(grad) > l1).astype(jnp.float32))
            has_viol = jnp.max(viol, axis=0, keepdims=True)       # (1, BM)
            active_s[:] = jnp.maximum(active_s[:], viol * cand)
            conv_s[:] = jnp.maximum(conv, cand * (1.0 - has_viol))
        else:
            conv_s[:] = jnp.maximum(conv, cand)
        done = jnp.min(conv_s[:]) >= 0.5
        return sweep + 1, done

    def cond(carry):
        sweep, done = carry
        return jnp.logical_not(done) & (sweep < max_sweeps)

    lax.while_loop(cond, sweep_body, (jnp.int32(0), jnp.bool_(False)))


def _cd_fused_kernel(fscal_ref, mask_ref, wx_ref, r_ref, beta0_ref, out_ref,
                     tabhi_s, tabmid_s, tablo_s, rt_s,
                     gram_s, diag_s, s_s, active_s, conv_s,
                     *, K: int, N: int, max_sweeps: int,
                     use_strong_rule: bool):
    """CD with the per-column gram and Xty built IN KERNEL (see
    fss_pallas._fss_fused_kernel — same construction; the 0/1 mask operand
    keeps the exact-bf16 per-operand precision; the (K^2, N) table is built
    once at grid step 0 and reused from scratch)."""
    from insider_tpu.kernels.fss_pallas import (
        _build_gram_table,
        _planes_dot,
    )

    _build_gram_table(r_ref, tabhi_s, tabmid_s, tablo_s, rt_s, K)
    m = mask_ref[:]
    if m.dtype != jnp.float32:
        m = m.astype(jnp.int32).astype(jnp.float32)
    g = _planes_dot(tabhi_s[:], tabmid_s[:], tablo_s[:], m)  # (K^2, BM)
    gram_s[:] = g.reshape(K, K, g.shape[-1])
    # wx_ref may hold raw data: masking in VMEM is idempotent for true wx
    # (0/1 mask), so the driver no longer keeps a persistent wx copy.
    xty = jnp.dot(rt_s[:], m * wx_ref[:],
                  precision=lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)       # (K, BM)
    _cd_compute(fscal_ref, gram_s, xty, beta0_ref[:], out_ref,
                diag_s, s_s, active_s, conv_s,
                K=K, max_sweeps=max_sweeps,
                use_strong_rule=use_strong_rule)


@functools.partial(
    jax.jit,
    static_argnames=("max_sweeps", "use_strong_rule", "block", "interpret"),
)
def elastic_net_cd_fused_pallas(
    mask: jax.Array,     # (N, M) 0/1 train indicator (f32)
    wx: jax.Array,       # (N, M) mask .* data
    R: jax.Array,        # (N, K) row factor (coordinate-permuted by caller)
    beta0: jax.Array,    # (K, M) warm start (same permutation)
    lam,
    alpha,
    tol,
    max_sweeps: int = 200,
    use_strong_rule: bool = True,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """elastic_net_cd_pallas with in-kernel gram/Xty builds.  Valid when the
    full row axis is device-local; the caller falls back otherwise."""
    from insider_tpu.kernels.fss_pallas import _auto_block_fused

    N, K = R.shape
    M = mask.shape[1]
    BM = _auto_block_fused(K, N, block, M, gj_scratch=False)
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        pad = Mp - M
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        wx = jnp.pad(wx, ((0, 0), (0, pad)))
        beta0 = jnp.pad(beta0, ((0, 0), (0, pad)))

    fscal = jnp.stack([
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(tol, jnp.float32),
    ])
    kernel = functools.partial(
        _cd_fused_kernel, K=K, N=N, max_sweeps=max_sweeps,
        use_strong_rule=use_strong_rule,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM,),
        in_specs=[
            pl.BlockSpec((N, BM), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, BM), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, K), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K * K, N), jnp.bfloat16),  # gram table hi plane
            pltpu.VMEM((K * K, N), jnp.bfloat16),  # gram table mid plane
            pltpu.VMEM((K * K, N), jnp.bfloat16),  # gram table lo plane
            pltpu.VMEM((K, N), jnp.float32),       # R^T
            pltpu.VMEM((K, K, BM), jnp.float32),   # gram
            pltpu.VMEM((K, BM), jnp.float32),      # diag
            pltpu.VMEM((K, BM), jnp.float32),      # s
            pltpu.VMEM((K, BM), jnp.float32),      # active
            pltpu.VMEM((1, BM), jnp.float32),      # converged
        ],
    )
    beta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Mp), jnp.float32),
        interpret=interpret,
    )(fscal, mask, wx, R, beta0)
    return beta[:, :M]


@functools.partial(
    jax.jit,
    static_argnames=("max_sweeps", "use_strong_rule", "block", "interpret"),
)
def elastic_net_cd_shared_pallas(
    xtx: jax.Array,      # (K, K) gram shared by ALL columns
    xty: jax.Array,      # (K, M)
    beta0: jax.Array,    # (K, M) warm start
    lam,
    alpha,
    tol,
    max_sweeps: int = 200,
    use_strong_rule: bool = True,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Dense-path CD: one (K, K) gram broadcast in-kernel to every column
    block (src/optimize.cpp:232-247).  Replaces the old dispatch that
    broadcast the gram to a (K, K, M) HBM tensor (~102 MB at flagship
    scale) just to stream it back in (VERDICT r3 weak #8)."""
    K, M = xty.shape

    from insider_tpu.kernels.fss_pallas import _auto_block
    BM = _auto_block(K, block, M, big_tensors=1)
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        pad = Mp - M
        xty = jnp.pad(xty, ((0, 0), (0, pad)))
        beta0 = jnp.pad(beta0, ((0, 0), (0, pad)))

    fscal = jnp.stack([
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(tol, jnp.float32),
    ])

    kernel = functools.partial(
        _cd_shared_kernel, K=K, max_sweeps=max_sweeps,
        use_strong_rule=use_strong_rule,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM,),
        in_specs=[
            pl.BlockSpec((K, K), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, BM), jnp.float32),   # diag
            pltpu.VMEM((K, BM), jnp.float32),   # s
            pltpu.VMEM((K, BM), jnp.float32),   # active
            pltpu.VMEM((1, BM), jnp.float32),   # converged
        ],
    )
    beta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Mp), jnp.float32),
        interpret=interpret,
    )(fscal, xtx, xty, beta0)
    return beta[:, :M]


@functools.partial(
    jax.jit,
    static_argnames=("max_sweeps", "use_strong_rule", "block", "interpret"),
)
def elastic_net_cd_pallas(
    xtx: jax.Array,      # (K, K, M) per-column Grams
    xty: jax.Array,      # (K, M)
    beta0: jax.Array,    # (K, M) warm start
    lam,
    alpha,
    tol,
    max_sweeps: int = 200,
    use_strong_rule: bool = True,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """All-columns CD via the Pallas kernel.  Returns beta (K, M).

    Sweeps coordinates in order 0..K-1; the caller randomizes order by
    permuting the K axis of the inputs (cheapest: permute R's columns before
    forming the Grams) and un-permuting the returned beta.
    """
    K, M = xty.shape

    from insider_tpu.kernels.fss_pallas import _auto_block
    BM = _auto_block(K, block, M, big_tensors=2)  # xtx double-buffered
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        # Padded columns: xtx/xty/beta0 zero => u=0 => beta stays 0 and the
        # column converges KKT-clean after the first sweep.
        pad = Mp - M
        xtx = jnp.pad(xtx, ((0, 0), (0, 0), (0, pad)))
        xty = jnp.pad(xty, ((0, 0), (0, pad)))
        beta0 = jnp.pad(beta0, ((0, 0), (0, pad)))

    fscal = jnp.stack([
        jnp.asarray(lam, jnp.float32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(tol, jnp.float32),
    ])

    kernel = functools.partial(
        _cd_kernel, K=K, max_sweeps=max_sweeps,
        use_strong_rule=use_strong_rule,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mp // BM,),
        in_specs=[
            pl.BlockSpec((K, K, BM), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, BM), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, BM), jnp.float32),   # diag
            pltpu.VMEM((K, BM), jnp.float32),   # s
            pltpu.VMEM((K, BM), jnp.float32),   # active
            pltpu.VMEM((1, BM), jnp.float32),   # converged
        ],
    )
    beta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Mp), jnp.float32),
        interpret=interpret,
    )(fscal, xtx, xty, beta0)
    return beta[:, :M]
