"""Sublane-packed Pallas CD kernel: full-vreg coordinate bookkeeping.

Why: the original CD kernel (kernels/cd_pallas.py) keeps per-column state as
(K, BM) tiles and runs each coordinate's soft-threshold bookkeeping on
(1, BM) rows — one sublane of an 8-sublane f32 vreg, so ~17 small VPU ops
per coordinate run at 1/8 utilization.  With sweep counts of 50-200 per
column update (measured on the flagship masked problem: p50 = 53 sweeps,
p90 = 151, every 1024-column block hitting the cap), that bookkeeping IS
the CD iteration's cost (PROFILE_r04: cd 23.9 ms/iter vs fss 6.2).

The fix is a LAYOUT change, not an algorithm change: each block's BM
columns are arranged as an (8, BL) tile (8 sublanes x BL = BM/8 lanes), so
every per-coordinate row op covers full vregs — an ~8x utilization jump on
exactly the ops that dominate.  Per-column math is IDENTICAL to
cd_pallas.py / ops/col_update.elastic_net_cd under the same coordinate
permutation: same update formula, same rank-1 s maintenance in the same
order, same cancellation-free decrease accounting — only the memory layout
changes.

Layouts (all reshapes below are free bitcasts — they only split/merge
contiguous dims):
  xty/beta/out:  (K, M)    -> (K, nb, 8, BL), block (K, 1, 8, BL)
  grams streamed:(K, K, M) -> (K*K, nb, 8, BL), block (K*K, 1, 8, BL);
                 row-major (j*K + i) with symmetric G means rows
                 jK..(j+1)K of a block are exactly the gram COLUMN j for
                 every lane — contiguous static slices in the sweep.
  fused:         mask/wx (N, M) -> (N, nb, 8, BL); the gram dot runs per
                 sublane group s on the strided slice mask[:, 0, s, :].

Reference semantics: src/coordinate_descent.cpp:57-127 via the
vectorization described in ops/col_update.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024
PACK = 8          # f32 sublanes per tile


def _cd_core(fscal_ref, col_of, diag_init, xty, beta0, out_ref,
             diag_s, s_s, active_s, conv_s,
             *, K: int, max_sweeps: int, use_strong_rule: bool,
             s_init=None):
    """Packed CD core.  col_of(k) -> (K, 8, BL) gram column k (broadcast
    for the shared-gram case); diag_init() -> (K, 8, BL).  xty/beta0 are
    (K, 8, BL) values; out_ref is the (K, 1, 8, BL) output ref.
    s_init(beta) optionally overrides the default unrolled s = XtX @ beta
    accumulation (used to match the unpacked kernel's reduce order)."""
    lam = fscal_ref[0]
    alpha = fscal_ref[1]
    tol = fscal_ref[2]
    l1 = lam * alpha
    l2 = lam * (1.0 - alpha)

    S8, BL = xty.shape[-2], xty.shape[-1]

    diag_s[:] = diag_init()

    if use_strong_rule:
        # coordinate_descent.cpp:74-79
        mx = jnp.max(jnp.abs(xty), axis=0, keepdims=True)     # (1, 8, BL)
        thr = alpha * (2.0 * lam - mx)
        active = (jnp.abs(xty) >= thr).astype(jnp.float32)    # (K, 8, BL)
        beta = beta0 * active
    else:
        active = jnp.ones((K, S8, BL), jnp.float32)
        beta = beta0
    active_s[:] = active
    out_ref[:, 0] = beta
    if s_init is not None:
        s_s[:] = s_init(beta)
    else:
        # s = XtX @ beta: unrolled K-term accumulation of gram columns
        s = col_of(0) * beta[0:1]
        for j in range(1, K):
            s = s + col_of(j) * beta[j:j + 1]
        s_s[:] = s
    conv_s[:] = jnp.zeros((S8, BL), jnp.float32)

    # hoisted sweep invariants (no per-coordinate divides)
    d_all = diag_s[:]
    denom_all = d_all + l2
    denom_all = jnp.where(denom_all > 0.0, denom_all, 1.0)
    inv_denom = 1.0 / denom_all
    half_denom = 0.5 * denom_all
    inv_l1 = 1.0 / jnp.maximum(l1, 1e-30)

    def sweep_body(carry):
        sweep, _ = carry
        conv = conv_s[:]                                      # (8, BL)
        dec = jnp.zeros((S8, BL), jnp.float32)
        upd_all = active_s[:] * (1.0 - conv[None])            # (K, 8, BL)

        for k in range(K):
            b_k = out_ref[k, 0]                               # (8, BL)
            u = xty[k] - s_s[k] + b_k * d_all[k]
            w = (jnp.sign(u) * jnp.maximum(jnp.abs(u) - l1, 0.0)
                 * inv_denom[k])
            w = jnp.where(upd_all[k] > 0.5, w, b_k)
            delta = w - b_k
            # Cancellation-free objective decrease, arithmetic IDENTICAL to
            # cd_pallas.py/_cd_compute so the packed kernel computes the
            # same iteration bit for bit (selfcheck identity contract).
            xi = jnp.where(
                w != 0.0, jnp.sign(w),
                jnp.clip(u * inv_l1, -1.0, 1.0),
            )
            dec = dec + (half_denom[k] * delta * delta
                         + l1 * (jnp.abs(b_k) - xi * b_k))
            s_s[:] = s_s[:] + col_of(k) * delta[None]
            out_ref[k, 0] = w

        cand = (1.0 - conv) * (jnp.abs(dec) <= tol).astype(jnp.float32)
        if use_strong_rule:
            grad = s_s[:] - xty                               # (K, 8, BL)
            viol = ((1.0 - active_s[:])
                    * (jnp.abs(grad) > l1).astype(jnp.float32))
            has_viol = jnp.max(viol, axis=0)                  # (8, BL)
            active_s[:] = jnp.maximum(active_s[:], viol * cand[None])
            conv_s[:] = jnp.maximum(conv, cand * (1.0 - has_viol))
        else:
            conv_s[:] = jnp.maximum(conv, cand)
        done = jnp.min(conv_s[:]) >= 0.5
        return sweep + 1, done

    def cond(carry):
        sweep, done = carry
        return jnp.logical_not(done) & (sweep < max_sweeps)

    lax.while_loop(cond, sweep_body, (jnp.int32(0), jnp.bool_(False)))


def _cd_packed_kernel(fscal_ref, xtx_ref, xty_ref, beta0_ref, out_ref,
                      diag_s, s_s, active_s, conv_s,
                      *, K: int, max_sweeps: int, use_strong_rule: bool):
    """Streamed per-lane grams: xtx_ref is (K*K, 1, 8, BL), row-major
    (j*K + i); symmetry makes rows jK..(j+1)K the gram column j."""

    def col_of(k):
        return xtx_ref[k * K:(k + 1) * K, 0]                  # (K, 8, BL)

    def diag_init():
        return jnp.concatenate(
            [xtx_ref[k * K + k, 0][None] for k in range(K)], axis=0)

    def s_init(beta):
        # same axis-1 reduce as the unpacked kernel (bit-identical init)
        g4 = xtx_ref[:, 0].reshape(K, K, PACK, beta.shape[-1])
        return jnp.sum(g4 * beta[None], axis=1)

    _cd_core(fscal_ref, col_of, diag_init, xty_ref[:, 0], beta0_ref[:, 0],
             out_ref, diag_s, s_s, active_s, conv_s,
             K=K, max_sweeps=max_sweeps, use_strong_rule=use_strong_rule,
             s_init=s_init)


def _cd_packed_fused_kernel(fscal_ref, mask_ref, wx_ref, r_ref, beta0_ref,
                            out_ref,
                            tabhi_s, tabmid_s, tablo_s, rt_s,
                            gram_s, diag_s, s_s, active_s, conv_s,
                            *, K: int, N: int, max_sweeps: int,
                            use_strong_rule: bool):
    """Gram + Xty built in kernel (no (K,K,M) HBM tensor), packed layout.
    The gram dot runs once per sublane group against the shared (K^2, N)
    bf16 table planes (built at grid step 0, kernels/fss_pallas.py)."""
    from insider_tpu.kernels.fss_pallas import (
        _build_gram_table,
        _planes_dot,
    )

    _build_gram_table(r_ref, tabhi_s, tabmid_s, tablo_s, rt_s, K)
    HI = lax.Precision.HIGHEST
    xty_rows = []
    for s in range(PACK):
        m_s = mask_ref[:, 0, s, :]                            # (N, BL)
        if m_s.dtype != jnp.float32:
            m_s = m_s.astype(jnp.int32).astype(jnp.float32)
        gram_s[:, s, :] = _planes_dot(tabhi_s[:], tabmid_s[:], tablo_s[:],
                                      m_s)                    # (K^2, BL)
        # wx_ref may hold raw data: masking in VMEM is idempotent for true
        # wx, so the driver no longer keeps a persistent wx copy.
        w_s = m_s * wx_ref[:, 0, s, :]                        # (N, BL)
        xty_rows.append(jnp.dot(rt_s[:], w_s, precision=HI,
                                preferred_element_type=jnp.float32)[:, None])
    xty = jnp.concatenate(xty_rows, axis=1)                   # (K, 8, BL)

    def col_of(k):
        return gram_s[k * K:(k + 1) * K]                      # (K, 8, BL)

    def diag_init():
        return jnp.concatenate(
            [gram_s[k * K + k][None] for k in range(K)], axis=0)

    _cd_core(fscal_ref, col_of, diag_init, xty, beta0_ref[:, 0],
             out_ref, diag_s, s_s, active_s, conv_s,
             K=K, max_sweeps=max_sweeps, use_strong_rule=use_strong_rule)


def _pack_cols(x, nb, BL):
    """(..., Mp) -> (..., nb, PACK, BL) — a free bitcast (minor-dim split)."""
    return x.reshape(*x.shape[:-1], nb, PACK, BL)


def _block_lanes(block: int) -> int:
    return max(128, (block // PACK // 128) * 128)


# --- dispatch gates (ADVICE r4 medium) ---
# The packed layout's minimum block is PACK*128 = 1024 columns; when the
# VMEM budget (_auto_block / _auto_block_fused) allows less, _block_lanes
# would silently floor BL at 128 lanes and the kernel would exceed the
# budget — exactly the compile-time VMEM failure the fallback logic exists
# to prevent.  Callers (ops/col_update.py) must check these and fall back
# to the unpacked cd_pallas kernels (which honor sub-1024 blocks).

# Go/no-go budget for the fixed 1024-column packed block.  Deliberately
# higher than the block-sizing budgets (which are conservative so AUTO
# blocks leave slack): the flagship packed kernel's compiler-reported VMEM
# residency is 16.7 MB and compiles/runs on v5e, so the hard limit sits
# above that; 15.5 MB of modeled residency keeps the flagship packed while
# rejecting the K>=~40 / large-N shapes that genuinely exhaust VMEM.
_PACKED_GATE_BUDGET = int(15.5 * 1024 * 1024)


def packed_streamed_feasible(K: int, M: int,
                             block: int = DEFAULT_BLOCK) -> bool:
    from insider_tpu.kernels.fss_pallas import _auto_block
    # M is passed as huge so the check tests the VMEM cap alone — a small
    # problem (M < 1024) still runs the packed kernel fine, it just pads.
    return (_auto_block(K, block, 1 << 30, big_tensors=2,
                        budget=_PACKED_GATE_BUDGET) >= PACK * 128)


def packed_fused_feasible(K: int, N: int, M: int,
                          block: int = DEFAULT_BLOCK) -> bool:
    from insider_tpu.kernels.fss_pallas import (_auto_block_fused,
                                                fused_feasible)
    if not fused_feasible(K, N, gj_scratch=False):
        return False
    return (_auto_block_fused(K, N, block, 1 << 30, gj_scratch=False,
                              budget=_PACKED_GATE_BUDGET) >= PACK * 128)


@functools.partial(
    jax.jit,
    static_argnames=("max_sweeps", "use_strong_rule", "block", "interpret"),
)
def elastic_net_cd_packed_pallas(
    xtx: jax.Array,      # (K, K, M) per-column Grams
    xty: jax.Array,      # (K, M)
    beta0: jax.Array,    # (K, M)
    lam,
    alpha,
    tol,
    max_sweeps: int = 200,
    use_strong_rule: bool = True,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Packed-layout replacement for elastic_net_cd_pallas (same iteration,
    ~full-vreg sweep bookkeeping).  Returns beta (K, M)."""
    K, M = xty.shape
    from insider_tpu.kernels.fss_pallas import _auto_block
    BL = _block_lanes(_auto_block(K, block, M, big_tensors=2))
    BM = PACK * BL
    Mp = ((M + BM - 1) // BM) * BM
    nb = Mp // BM
    if Mp != M:
        pad = Mp - M
        xtx = jnp.pad(xtx, ((0, 0), (0, 0), (0, pad)))
        xty = jnp.pad(xty, ((0, 0), (0, pad)))
        beta0 = jnp.pad(beta0, ((0, 0), (0, pad)))

    xtx_p = _pack_cols(xtx.reshape(K * K, Mp), nb, BL)
    xty_p = _pack_cols(xty, nb, BL)
    beta0_p = _pack_cols(beta0, nb, BL)

    fscal = jnp.stack([jnp.asarray(lam, jnp.float32),
                       jnp.asarray(alpha, jnp.float32),
                       jnp.asarray(tol, jnp.float32)])
    kernel = functools.partial(_cd_packed_kernel, K=K,
                               max_sweeps=max_sweeps,
                               use_strong_rule=use_strong_rule)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((K * K, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, PACK, BL), jnp.float32),   # diag
            pltpu.VMEM((K, PACK, BL), jnp.float32),   # s
            pltpu.VMEM((K, PACK, BL), jnp.float32),   # active
            pltpu.VMEM((PACK, BL), jnp.float32),      # converged
        ],
    )
    beta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, nb, PACK, BL), jnp.float32),
        interpret=interpret,
    )(fscal, xtx_p, xty_p, beta0_p)
    return beta.reshape(K, Mp)[:, :M]


@functools.partial(
    jax.jit,
    static_argnames=("max_sweeps", "use_strong_rule", "block", "interpret"),
)
def elastic_net_cd_fused_packed_pallas(
    mask: jax.Array,     # (N, M) 0/1 train indicator (f32)
    wx: jax.Array,       # (N, M) mask .* data
    R: jax.Array,        # (N, K) row factor (coordinate-permuted by caller)
    beta0: jax.Array,    # (K, M)
    lam,
    alpha,
    tol,
    max_sweeps: int = 200,
    use_strong_rule: bool = True,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Packed-layout replacement for elastic_net_cd_fused_pallas."""
    from insider_tpu.kernels.fss_pallas import _auto_block_fused

    N, K = R.shape
    M = mask.shape[1]
    BL = _block_lanes(_auto_block_fused(K, N, block, M, gj_scratch=False))
    BM = PACK * BL
    Mp = ((M + BM - 1) // BM) * BM
    nb = Mp // BM
    if Mp != M:
        pad = Mp - M
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        wx = jnp.pad(wx, ((0, 0), (0, pad)))
        beta0 = jnp.pad(beta0, ((0, 0), (0, pad)))

    mask_p = _pack_cols(mask, nb, BL)
    wx_p = _pack_cols(wx, nb, BL)
    beta0_p = _pack_cols(beta0, nb, BL)

    fscal = jnp.stack([jnp.asarray(lam, jnp.float32),
                       jnp.asarray(alpha, jnp.float32),
                       jnp.asarray(tol, jnp.float32)])
    kernel = functools.partial(_cd_packed_fused_kernel, K=K, N=N,
                               max_sweeps=max_sweeps,
                               use_strong_rule=use_strong_rule)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((N, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, K), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 1, PACK, BL), lambda i, *_: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K * K, N), jnp.bfloat16),     # gram table hi
            pltpu.VMEM((K * K, N), jnp.bfloat16),     # gram table mid
            pltpu.VMEM((K * K, N), jnp.bfloat16),     # gram table lo
            pltpu.VMEM((K, N), jnp.float32),          # R^T
            pltpu.VMEM((K * K, PACK, BL), jnp.float32),  # gram
            pltpu.VMEM((K, PACK, BL), jnp.float32),   # diag
            pltpu.VMEM((K, PACK, BL), jnp.float32),   # s
            pltpu.VMEM((K, PACK, BL), jnp.float32),   # active
            pltpu.VMEM((PACK, BL), jnp.float32),      # converged
        ],
    )
    beta = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, nb, PACK, BL), jnp.float32),
        interpret=interpret,
    )(fscal, mask_p, wx_p, R, beta0_p)
    return beta.reshape(K, Mp)[:, :M]
