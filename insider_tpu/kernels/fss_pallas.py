"""Pallas TPU kernel for batched feature-sign search (exact column solves).

Replaces coordinate-descent *sweeps* (kernels/cd_pallas.py) with active-set
*solves* for the per-column elastic net: per outer step one masked K x K
Gauss-Jordan solve per column — all columns of a 1024-wide block
simultaneously, everything resident in VMEM.  From an ALS warm start the
sign pattern is nearly correct, so a handful of outer steps replaces the
~50-150 CD sweeps the ill-conditioned Grams need (measured: CD was 78% of
the ALS iteration).  Algorithm and invariants: ops/fss.py (the jnp
reference, which this kernel must match); the reference package's own R
prototype is feature_sign_with_screening (R/optimization_functions.R:136).

Everything is static-shaped: active sets are (K, BM) 0/1 floats, the GJ
elimination is unrolled over K (inactive rows/cols are identity — exact
decoupling), the single-violator KKT activation picks its coordinate with a
max + first-match mask (no argmax gather).  Blocks early-exit when all
their columns converge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024

# Relative KKT slack — must match ops/fss.py's default so the kernel and the
# jnp reference compute the same iteration.
KKT_RTOL = 1e-4


def _auto_block(K: int, block: int, M: int, big_tensors: int) -> int:
    """Largest lane-aligned column block whose VMEM footprint fits.

    The (K, K, BM) tensors dominate: the Gram input block is double-buffered
    by the pipeline and (for FSS) mirrored by the Gauss-Jordan scratch —
    `big_tensors` * K*K*BM*4 bytes of the ~16 MB VMEM budget.  A fixed block
    compiles fine at the flagship K=24 but blows VMEM around K>~40; scale it
    down instead of failing at compile time."""
    cap = (12 * 1024 * 1024) // (big_tensors * K * K * 4)
    cap = max(128, (cap // 128) * 128)
    want = min(block, max(128, 1 << (M - 1).bit_length()))
    return max(128, min(want, cap))


def _fss_kernel(fscal_ref, xtx_ref, xty_ref, beta0_ref, out_ref,
                u_s, rhs_s, theta_s, act_s, conv_s,
                *, K: int, max_outer: int, polish_sweeps: int = 0):
    _fss_compute(fscal_ref, xtx_ref, xty_ref[:], beta0_ref[:], out_ref,
                 u_s, rhs_s, theta_s, act_s, conv_s,
                 K=K, max_outer=max_outer, polish_sweeps=polish_sweeps)


def _fss_compute(fscal_ref, xtx_ref, xty, beta0, out_ref,
                 u_s, rhs_s, theta_s, act_s, conv_s,
                 *, K: int, max_outer: int, polish_sweeps: int = 0):
    """Kernel core: xtx_ref may be a streamed input block or a VMEM scratch
    the caller filled (the gram-fused variant); xty/beta0 are values."""
    lam = fscal_ref[0]
    alpha = fscal_ref[1]
    l1 = lam * alpha
    l2 = lam * (1.0 - alpha)

    BM = xty.shape[-1]

    beta = beta0
    out_ref[:] = beta
    act_s[:] = (beta != 0.0).astype(jnp.float32)
    theta_s[:] = jnp.sign(beta)
    conv_s[:] = jnp.zeros((1, BM), jnp.float32)

    def outer_body(carry):
        outer, _ = carry
        act = act_s[:]                                 # (K, BM)
        theta = theta_s[:]
        conv = conv_s[:]                               # (1, BM)
        beta = out_ref[:]

        # --- masked system build: U = A restricted to the active set,
        # identity elsewhere; A = XtX + l2 I ---
        # row mask act_i: (K, 1, BM); col mask act_j: (1, K, BM)
        u_s[:] = xtx_ref[:] * act[:, None, :] * act[None, :, :]
        rhs_s[:] = (xty - l1 * theta) * act
        # diagonal: active += l2, inactive = 1 (static unroll over K)
        for k in range(K):
            a_k = act[k:k + 1, :]
            u_s[k, k:k + 1, :] = (u_s[k, k:k + 1, :] + l2 * a_k
                                  + (1.0 - a_k))

        # --- unrolled Gauss-Jordan: after K steps rhs_s holds beta* ---
        # No pivoting needed: active principal blocks are SPD (ridge l2 on
        # the diagonal; Schur complements of SPD stay SPD), inactive pivots
        # are exactly 1.
        for k in range(K):
            piv = u_s[k, k:k + 1, :]                   # (1, BM)
            inv = 1.0 / piv
            rowk = u_s[k] * inv                        # (K, BM)
            rhsk = rhs_s[k:k + 1, :] * inv             # (1, BM)
            colk = u_s[:, k, :]                        # (K, BM) snapshot
            u_s[:] = u_s[:] - colk[:, None, :] * rowk[None, :, :]
            rhs_s[:] = rhs_s[:] - colk * rhsk
            u_s[k] = rowk
            rhs_s[k:k + 1, :] = rhsk
        beta_star = rhs_s[:]                           # (K, BM)

        # --- line search to the first sign crossing ---
        # beta != 0 exempts just-activated coordinates from the flip set on
        # their first solve (livelock guard — must match ops/fss.py).
        flip = (act * (jnp.sign(beta_star) != theta).astype(jnp.float32)
                * (beta != 0.0).astype(jnp.float32))
        denom = beta - beta_star
        safe = jnp.where((flip > 0.5) & (denom != 0.0), denom, 1.0)
        t_k = jnp.where(flip > 0.5, beta / safe, 1.0)
        t_k = jnp.clip(t_k, 0.0, 1.0)
        t = jnp.min(t_k, axis=0, keepdims=True)        # (1, BM)

        live = (1.0 - conv)
        move = act * live
        beta = jnp.where(move > 0.5, beta + t * (beta_star - beta), beta)
        crossed = (flip > 0.5) & (t_k <= t) & (t < 1.0) & (live > 0.5)
        beta = jnp.where(crossed, 0.0, beta)
        # Active iff beta nonzero — consistent for frozen columns too, whose
        # beta did not move.
        act = (beta != 0.0).astype(jnp.float32)
        theta = jnp.sign(beta)

        # --- KKT: single-violator activation on solved columns ---
        solved = (t >= 1.0).astype(jnp.float32) * live  # (1, BM)
        grad = (jnp.sum(xtx_ref[:] * beta[None, :, :], axis=1)
                + l2 * beta - xty)                     # (K, BM)
        # f32 KKT slack scaled by |b| (see ops/fss.py): prevents boundary
        # coordinates from oscillating activate/deactivate forever.
        scale = jnp.max(jnp.abs(xty), axis=0, keepdims=True)
        thresh = l1 + KKT_RTOL * (l1 + scale)
        viol = ((1.0 - act) * (jnp.abs(grad) > thresh).astype(jnp.float32)
                * solved)
        score = jnp.where(viol > 0.5, jnp.abs(grad), -1.0)
        best = jnp.max(score, axis=0, keepdims=True)   # (1, BM)
        has_viol = (best > 0.0).astype(jnp.float32)
        first = ((score >= best) & (viol > 0.5)).astype(jnp.float32)
        # keep only the first tied coordinate (unrolled prefix-OR over K;
        # Mosaic has no cumsum)
        seen = jnp.zeros((1, BM), jnp.float32)
        rows = []
        for k in range(K):
            f_k = first[k:k + 1, :]
            rows.append(f_k * (1.0 - seen))
            seen = jnp.maximum(seen, f_k)
        pick = jnp.concatenate(rows, axis=0)
        act = jnp.maximum(act, pick)
        theta = jnp.where(pick > 0.5, -jnp.sign(grad), theta)
        conv = jnp.maximum(conv, solved * (1.0 - has_viol))

        out_ref[:] = beta
        act_s[:] = act
        theta_s[:] = theta
        conv_s[:] = conv
        done = jnp.min(conv) >= 0.5
        return outer + 1, done

    def cond(carry):
        outer, done = carry
        return jnp.logical_not(done) & (outer < max_outer)

    lax.while_loop(cond, outer_body, (jnp.int32(0), jnp.bool_(False)))

    if polish_sweeps > 0:
        # Fused plain-CD polish (see FitConfig.fss_polish): soft-threshold
        # sweeps from the FSS solution while the Gram block is still in
        # VMEM — removes the f32 KKT-slack objective excess at no extra HBM
        # traffic.  Same arithmetic as kernels/cd_pallas.py with all
        # coordinates active; per-column do-while stop on sweep decrease
        # <= tol (coordinate_descent.cpp:112-114).
        tol = fscal_ref[2]
        beta = out_ref[:]
        # reuse scratch: act_s <- diag, rhs_s <- s = XtX @ beta
        act_s[:] = jnp.concatenate(
            [xtx_ref[k, k, :][None] for k in range(K)], axis=0
        )
        rhs_s[:] = jnp.sum(xtx_ref[:] * beta[None, :, :], axis=1)
        conv_s[:] = jnp.zeros((1, BM), jnp.float32)

        def polish_body(carry):
            sweep, _ = carry
            conv = conv_s[:]
            dec = jnp.zeros((1, BM), jnp.float32)
            for k in range(K):
                d = act_s[k:k + 1, :]
                b_k = out_ref[k:k + 1, :]
                u = xty[k:k + 1, :] - rhs_s[k:k + 1, :] + b_k * d
                denom = d + l2
                denom = jnp.where(denom > 0.0, denom, 1.0)
                w = (jnp.sign(u) * jnp.maximum(jnp.abs(u) - l1, 0.0)
                     / denom)
                w = jnp.where(conv > 0.5, b_k, w)
                delta = w - b_k
                # cancellation-free decrease (see cd_pallas.py)
                xi = jnp.where(
                    w != 0.0, jnp.sign(w),
                    jnp.clip(u / jnp.maximum(l1, 1e-30), -1.0, 1.0),
                )
                dec = dec + (0.5 * denom * delta * delta
                             + l1 * (jnp.abs(b_k) - xi * b_k))
                rhs_s[:] = rhs_s[:] + xtx_ref[k] * delta
                out_ref[k:k + 1, :] = w
            conv_s[:] = jnp.maximum(
                conv, (jnp.abs(dec) <= tol).astype(jnp.float32))
            return sweep + 1, jnp.min(conv_s[:]) >= 0.5

        def polish_cond(carry):
            sweep, done = carry
            return jnp.logical_not(done) & (sweep < polish_sweeps)

        lax.while_loop(polish_cond, polish_body,
                       (jnp.int32(0), jnp.bool_(False)))


def _masked_gram_dot(pr_t, mask_blk):
    """(A, N) @ (N, BM) against a 0/1 mask block: Mosaic cannot lower
    per-operand dot precision, so split the real-valued lhs into three bf16
    planes (8+8+8 mantissa bits cover f32's 24 exactly) against the
    exact-bf16 mask — 3 MXU passes, f32-lhs-exact result."""
    m16 = mask_blk.astype(jnp.bfloat16)
    hi = pr_t.astype(jnp.bfloat16)
    r1 = pr_t - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(hi, m16, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(mid, m16, preferred_element_type=jnp.float32)
    return acc + jnp.dot(lo, m16, preferred_element_type=jnp.float32)


def _fss_fused_kernel(fscal_ref, mask_ref, wx_ref, r_ref, beta0_ref, out_ref,
                      gram_s, u_s, rhs_s, theta_s, act_s, conv_s,
                      *, K: int, N: int, max_outer: int,
                      polish_sweeps: int = 0):
    """FSS with the per-column gram and Xty built IN KERNEL from the mask
    and masked data blocks: the (K, K, M) gram never exists in HBM (the
    streamed variant costs a ~100 MB write + read per iteration at flagship
    scale).  The mask operand is exact in bf16, so the gram matmul uses the
    same per-operand precision as ops/col_update.py."""
    r = r_ref[:]                                            # (N, K)
    # (K^2, N) outer-product table by sublane concatenation (Mosaic cannot
    # shape-cast a lane-dim collapse like (N, K, K) -> (N, K^2)).
    rt = r.T                                                # (K, N)
    pr_t = jnp.concatenate([rt * rt[k:k + 1, :] for k in range(K)], axis=0)
    g = _masked_gram_dot(pr_t, mask_ref[:])                 # (K^2, BM)
    gram_s[:] = g.reshape(K, K, g.shape[-1])
    xty = jnp.dot(rt, wx_ref[:], precision=lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)       # (K, BM)
    _fss_compute(fscal_ref, gram_s, xty, beta0_ref[:], out_ref,
                 u_s, rhs_s, theta_s, act_s, conv_s,
                 K=K, max_outer=max_outer, polish_sweeps=polish_sweeps)


def _auto_block_fused(K: int, N: int, block: int, M: int) -> int:
    """VMEM-fitting column block for the gram-fused kernel: gram scratch +
    GJ workspace (2*K^2 lanes), ~7 (K, BM) vectors, and double-buffered
    (N, BM) mask + wx blocks, plus the fixed (N, K^2) outer-product table."""
    # Budget 9 MB of the 16 MB scoped limit: the measured flagship footprint
    # at BM=1024 was 16.74 MB (compiler-reported), i.e. ~4 KB/lane beyond
    # the accounted tensors (bf16 gram-split planes, pipeline copies).
    fixed = N * K * K * 4 + 2 * N * K * 4
    per_lane = (2 * K * K + 7 * K + 2) * 4 + 4 * N * 4
    cap = max(128, ((9 * 1024 * 1024 - fixed) // per_lane // 128) * 128)
    want = min(block, max(128, 1 << (M - 1).bit_length()))
    return max(128, min(want, cap))


@functools.partial(
    jax.jit,
    static_argnames=("max_outer", "block", "interpret", "polish_sweeps"),
)
def feature_sign_fused_pallas(
    mask: jax.Array,     # (N, M) 0/1 train indicator (f32)
    wx: jax.Array,       # (N, M) mask .* data
    R: jax.Array,        # (N, K) row factor
    beta0: jax.Array,    # (K, M) warm start
    lam,
    alpha,
    max_outer: int = 48,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    polish_sweeps: int = 0,
    tol=0.0,
):
    """feature_sign_pallas with in-kernel gram/Xty builds (see
    _fss_fused_kernel).  Valid when the full row axis is device-local (mesh
    rows == 1); the caller falls back to the streamed variant otherwise."""
    N, K = R.shape
    M = mask.shape[1]
    BM = _auto_block_fused(K, N, block, M)
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        pad = Mp - M
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        wx = jnp.pad(wx, ((0, 0), (0, pad)))
        beta0 = jnp.pad(beta0, ((0, 0), (0, pad)))

    fscal = jnp.stack([jnp.asarray(lam, jnp.float32),
                       jnp.asarray(alpha, jnp.float32),
                       jnp.asarray(tol, jnp.float32)])

    kernel = functools.partial(_fss_fused_kernel, K=K, N=N,
                               max_outer=max_outer,
                               polish_sweeps=polish_sweeps)
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
            pltpu.VMEM((K, K, BM), jnp.float32),   # gram
            pltpu.VMEM((K, K, BM), jnp.float32),   # U (GJ workspace)
            pltpu.VMEM((K, BM), jnp.float32),      # rhs / beta*
            pltpu.VMEM((K, BM), jnp.float32),      # theta
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
    static_argnames=("max_outer", "block", "interpret", "polish_sweeps"),
)
def feature_sign_pallas(
    xtx: jax.Array,      # (K, K, M) per-column Grams (gene axis last)
    xty: jax.Array,      # (K, M)
    beta0: jax.Array,    # (K, M) warm start
    lam,
    alpha,
    max_outer: int = 48,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    polish_sweeps: int = 0,
    tol=0.0,
):
    """Exact batched elastic-net solves via the FSS kernel.  Returns beta.

    Requires alpha > 0; the caller dispatches alpha == 0 to the batched
    ridge solve.  Padded tail columns have zero Grams/rhs: beta stays 0,
    grad = 0, no violations -> converged after one step.

    polish_sweeps > 0 appends fused plain-CD sweeps at tolerance `tol`
    (see FitConfig.fss_polish).
    """
    K, M = xty.shape
    BM = _auto_block(K, block, M, big_tensors=3)  # xtx x2 (pipeline) + GJ scratch
    Mp = ((M + BM - 1) // BM) * BM
    if Mp != M:
        pad = Mp - M
        xtx = jnp.pad(xtx, ((0, 0), (0, 0), (0, pad)))
        xty = jnp.pad(xty, ((0, 0), (0, pad)))
        beta0 = jnp.pad(beta0, ((0, 0), (0, pad)))

    fscal = jnp.stack([jnp.asarray(lam, jnp.float32),
                       jnp.asarray(alpha, jnp.float32),
                       jnp.asarray(tol, jnp.float32)])

    kernel = functools.partial(_fss_kernel, K=K, max_outer=max_outer,
                               polish_sweeps=polish_sweeps)
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
            pltpu.VMEM((K, K, BM), jnp.float32),   # U (GJ workspace)
            pltpu.VMEM((K, BM), jnp.float32),      # rhs / beta*
            pltpu.VMEM((K, BM), jnp.float32),      # theta
            pltpu.VMEM((K, BM), jnp.float32),      # active
            pltpu.VMEM((1, BM), jnp.float32),      # converged
        ],
    )
    beta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, Mp), jnp.float32),
        interpret=interpret,
    )(fscal, xtx, xty, beta0)
    return beta[:, :M]
