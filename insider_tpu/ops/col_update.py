"""Column-side elastic-net updates: the hot path.

TPU-native equivalent of `optimize_col` (src/optimize.cpp:200-253) +
`strong_coordinate_descent` / `coordinate_descent`
(src/coordinate_descent.cpp:11-127).

Redesign (SURVEY.md §7): the reference runs scalar cyclic CD inside each gene
column, parallelizing columns over OpenMP threads.  Here one CD sweep updates
coordinate k of *all M columns simultaneously* — the state lives entirely in
(K, M) space (beta, Xty, s = XtX@beta), so the N-dimensional residual never
enters the inner loop.  Per-column semantics (cyclic order, soft-threshold
update, strong-rule screening, per-column convergence freezing, KKT
reactivation) are preserved exactly.

Convergence accounting: the reference stops a column when the loss decrease of
a full sweep falls below `tol` (coordinate_descent.cpp:112-114), with tol
decayed down to ~1e-11 (src/optimize.cpp:376,389-403).  Computing that as a
difference of two O(1e3) losses is impossible in f32; even the direct
per-coordinate decrement

    -delta_f_k = -(1/2 (d+l2)(w^2 - o^2) - u (w - o) + l1 (|w| - |o|))

has a u*(w-o) cancellation whose f32 rounding floor (~eps*|u|*|w|) can sit
ABOVE tol, leaving straggler columns sweeping forever.  We instead use the
optimality identity: the soft-threshold update satisfies u - (d+l2) w =
l1*xi, xi in the subdifferential of |w|, which turns the decrement into a sum
of two NONNEGATIVE terms

    -delta_f_k = 1/2 (d+l2) (w - o)^2 + l1 (|o| - xi*o),
    xi = sign(w) if w != 0 else u/l1 (in [-1, 1])

identical in exact arithmetic and computable to full relative precision in
f32 (the quadratic term's noise floor is ~eps^2).  Summed over a sweep it
equals the sweep's loss decrease exactly.  This is the one deliberate
deviation from the reference's arithmetic — same math, robust numerics.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST
# Per-operand precision for gram matmuls against the 0/1 train mask: the mask
# is exactly representable in bf16, so splitting only the real-valued
# outer-product table (HIGHEST = 3-way bf16 split, exact for f32) while the
# mask side runs single-pass bf16 (DEFAULT) is bit-identical to
# HIGHEST/HIGHEST at half the MXU passes (measured 1.4x faster on v5e;
# bit-exactness checked on hardware by tools/tpu_selfcheck.py).
EXACT01_RHS = (lax.Precision.HIGHEST, lax.Precision.DEFAULT)
EXACT01_LHS = (lax.Precision.DEFAULT, lax.Precision.HIGHEST)


def col_gram_masked(R: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-column masked Grams XtX_j = R^T diag(mask_j) R  ->  (M, K, K).

    One (M,N)@(N,K^2) matmul against the row-factor outer-product table —
    the MXU replacement for the reference's per-row rank-1 slice cube
    (src/optimize.cpp:207-219).
    """
    N, K = R.shape
    PR = (R[:, :, None] * R[:, None, :]).reshape(N, K * K)
    XtX = jnp.matmul(mask.T, PR, precision=EXACT01_LHS)
    return XtX.reshape(-1, K, K)


def col_gram_masked_t(R: jax.Array, mask: jax.Array) -> jax.Array:
    """Same Grams in (K, K, M) layout (gene axis last = TPU lane dim),
    produced directly as one (K^2,N)@(N,M) matmul — the layout the Pallas CD
    kernel consumes, with no transpose of the 100MB tensor."""
    N, K = R.shape
    PR = (R[:, :, None] * R[:, None, :]).reshape(N, K * K)
    XtX = jnp.matmul(PR.T, mask, precision=EXACT01_RHS)  # (K^2, M)
    return XtX.reshape(K, K, -1)


def make_sweep_perms(key: jax.Array, K: int, max_sweeps: int) -> jax.Array:
    """Pre-generate per-sweep coordinate orders, shared across columns (the
    distributional analog of the per-column randperm at
    coordinate_descent.cpp:89; a single permutation per sweep keeps the
    update vectorized and deterministic under the key).  Shared by the jnp
    and Pallas paths so they compute the identical iteration."""
    keys = jax.random.split(key, max_sweeps)
    return jax.vmap(lambda k: jax.random.permutation(k, K))(keys).astype(jnp.int32)


class CDState(NamedTuple):
    beta: jax.Array        # (K, M) coefficients
    s: jax.Array           # (K, M) XtX @ beta, maintained incrementally
    active: jax.Array      # (K, M) bool strong-rule / KKT active set
    converged: jax.Array   # (M,) bool per-column freeze flags
    sweeps: jax.Array      # scalar int32, total sweeps executed


def _sweep(XtX, diag, Xty, lam, alpha, perm, state: CDState):
    """One full cyclic CD sweep over all K coordinates, all M columns.

    XtX: (M, K, K) per-column Grams, or (1, K, K) broadcast (dense path).
    Returns (new_state_fields, sweep_decrease (M,)).
    """
    K, M = state.beta.shape
    l1 = lam * alpha
    l2 = lam * (1.0 - alpha)

    def coord_body(i, carry):
        beta, s, decrease = carry
        k = perm[i]
        d_k = diag[k]                                   # (M,)
        u = Xty[k] - s[k] + beta[k] * d_k               # (M,)
        denom = jnp.where(d_k + l2 > 0.0, d_k + l2, 1.0)
        w = jnp.sign(u) * jnp.maximum(jnp.abs(u) - l1, 0.0) / denom
        # Frozen columns and screened-out coordinates don't move
        # (coordinate_descent.cpp:74-75; per-column do-while exit).
        upd = state.active[k] & (~state.converged)
        w = jnp.where(upd, w, beta[k])
        delta = w - beta[k]
        # Exact per-coordinate objective decrease, cancellation-free form
        # (see module docstring): both terms nonnegative, full relative
        # precision in f32.
        xi = jnp.where(
            w != 0.0, jnp.sign(w),
            jnp.clip(u / jnp.maximum(l1, 1e-30), -1.0, 1.0),
        )
        dec_k = 0.5 * denom * delta * delta + l1 * (
            jnp.abs(beta[k]) - xi * beta[k]
        )
        # s += XtX[:, :, k] * delta  (rank-1 maintenance,
        # coordinate_descent.cpp:107, vectorized across columns).
        col_k = jnp.take(XtX, k, axis=2)                # (M or 1, K)
        s = s + col_k.T * delta[None, :]
        beta = beta.at[k].set(w)
        return beta, s, decrease + dec_k

    beta, s, decrease = lax.fori_loop(
        0, K, coord_body, (state.beta, state.s, jnp.zeros(M, state.beta.dtype))
    )
    return beta, s, decrease


def _kkt_violations(s, Xty, active, lam, alpha):
    """|XtX[ex,inc] beta[inc] - Xty[ex]| > alpha*lam on inactive coords.

    With beta zero on inactive coords, s = XtX@beta restricted to them is
    exactly the reference's `grad` (coordinate_descent.cpp:118).
    """
    grad = s - Xty
    return (~active) & (jnp.abs(grad) > alpha * lam)


@partial(jax.jit, static_argnames=("max_sweeps", "use_strong_rule"))
def elastic_net_cd(
    XtX: jax.Array,          # (M, K, K) or (1, K, K)
    Xty: jax.Array,          # (K, M)
    beta0: jax.Array,        # (K, M) warm start (previous column factor)
    lam: float,
    alpha: float,
    tol: jax.Array,          # scalar (sub_tol * decay), traced
    key: jax.Array,
    max_sweeps: int = 200,
    use_strong_rule: bool = True,
):
    """Vectorized strong-rule CD with KKT reactivation over all columns.

    Returns (beta, key, sweeps_used).
    """
    K, M = beta0.shape
    key, sub = jax.random.split(key)
    perms = make_sweep_perms(sub, K, max_sweeps)
    diag = jnp.diagonal(XtX, axis1=1, axis2=2).T        # (K, M or 1) -> broadcast
    if diag.shape[1] == 1 and M != 1:
        diag = jnp.broadcast_to(diag, (K, M))

    if use_strong_rule:
        # Strong screening (coordinate_descent.cpp:74-75): drop coords with
        # |Xty| < alpha*(2*lam - max_k |Xty|); zero their warm start.
        thr = alpha * (2.0 * lam - jnp.max(jnp.abs(Xty), axis=0))  # (M,)
        active = jnp.abs(Xty) >= thr[None, :]
        beta = jnp.where(active, beta0, 0.0)
    else:
        active = jnp.ones((K, M), bool)
        beta = beta0

    s = jnp.einsum("mkl,lm->km", XtX, beta, precision=HIGHEST)
    state = CDState(
        beta=beta,
        s=s,
        active=active,
        converged=jnp.zeros(M, bool),
        sweeps=jnp.int32(0),
    )

    def cond(st: CDState):
        return (~jnp.all(st.converged)) & (st.sweeps < max_sweeps)

    def body(st: CDState):
        beta, s, decrease = _sweep(XtX, diag, Xty, lam, alpha,
                                   perms[st.sweeps], st)
        # do-while semantics: a column may stop only after this sweep ran on it.
        candidate = (~st.converged) & (jnp.abs(decrease) <= tol)
        if use_strong_rule:
            viol = _kkt_violations(s, Xty, st.active, lam, alpha)  # (K, M)
            has_viol = jnp.any(viol, axis=0)                        # (M,)
            # Columns whose inner loop just converged: reactivate violators and
            # keep sweeping them; converge only if KKT-clean
            # (coordinate_descent.cpp:118-124).
            activate = viol & candidate[None, :]
            active = st.active | activate
            converged = st.converged | (candidate & (~has_viol))
        else:
            active = st.active
            converged = st.converged | candidate
        return CDState(beta, s, active, converged, st.sweeps + 1)

    out = lax.while_loop(cond, body, state)
    return out.beta, key, out.sweeps


def _shard_cols(mesh, fn, XtXt, Xty, beta0):
    """Run a per-column-block kernel on the local gene shard of each device.

    Pallas kernels are not GSPMD-partitionable, so shard_map makes the
    zero-communication column parallelism explicit (SURVEY.md §2d).
    """
    if mesh is None:
        return fn(XtXt, Xty, beta0)
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    wrapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, None, "cols"), P(None, "cols"), P(None, "cols")),
        out_specs=P(None, "cols"),
        check_vma=False,
    )
    return wrapped(XtXt, Xty, beta0)


def _shard_gram_xty(mesh, mask, data, R):
    """Streamed gram+Xty builder kernel over the mesh: per-device blocks of
    the (K, K, M) grams and (K, M) Xty with partial row sums psum'd over
    'rows' — no (N, M) transients (kernels/gram_pallas.py)."""
    from insider_tpu.kernels.gram_pallas import col_gram_xty_pallas

    if mesh is None:
        return col_gram_xty_pallas(mask, data, R)
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    wrapped = shard_map(
        lambda m, d, r: jax.lax.psum(col_gram_xty_pallas(m, d, r), "rows"),
        mesh=mesh,
        in_specs=(P("rows", "cols"), P("rows", "cols"), P("rows", None)),
        out_specs=(P(None, None, "cols"), P(None, "cols")),
        check_vma=False,
    )
    return wrapped(mask, data, R)


def _shard_cols_fused(mesh, fn, mask, wx, R, beta0):
    """Column-sharded run of the gram-fused kernel (mesh rows must be 1 so
    the row axis is fully device-local; the caller guarantees this)."""
    if mesh is None:
        return fn(mask, wx, R, beta0)
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    wrapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("rows", "cols"), P("rows", "cols"), P("rows", None),
                  P(None, "cols")),
        out_specs=P(None, "cols"),
        check_vma=False,
    )
    return wrapped(mask, wx, R, beta0)


def update_columns_masked(
    data: jax.Array,        # (N, M) — NOTE: the driver passes data, not the
                            # residual (src/optimize.cpp:376); the column solve
                            # regresses data onto the full row factor.
    mask: jax.Array,        # (N, M) 0/1 train indicator
    R: jax.Array,           # (N, K) row factor
    F_prev: jax.Array,      # (K, M) warm start
    lam: float,
    alpha: float,
    tol: jax.Array,
    key: jax.Array,
    max_sweeps: int = 200,
    alpha_is_zero: bool = None,
    use_pallas: bool = False,
    masked_data: jax.Array = None,   # precomputed mask*data, optional
    mesh=None,                       # shard the CD kernel over mesh axis 'cols'
    solver: str = "cd",              # "cd" | "fss" (alpha > 0 only)
    max_fss_outer: int = 48,
    fss_polish: bool = True,
    max_fss_polish_sweeps: int = 32,
    cd_warm_start: bool = True,
):
    """Masked (tuning==1) column update, src/optimize.cpp:203-230.

    mask may be stored uint8 (memory-lean): the Pallas kernels read it raw
    (per-block VMEM conversion, 4x less HBM traffic), while the jnp matmul
    paths use the f32 view below.
    """
    if alpha_is_zero is None:
        alpha_is_zero = alpha == 0.0
    mask_f = mask if mask.dtype == R.dtype else mask.astype(R.dtype)

    # The gram-fused Pallas kernels multiply data by the mask in VMEM, so
    # they take RAW data — no (N, M) wx copy exists in HBM, persistent or
    # transient (round-5 capacity work).  Only the jnp/streamed paths below
    # need the materialized product; compute it lazily.
    fused_wx = data if masked_data is None else masked_data

    def _masked_data():
        return mask_f * data if masked_data is None else masked_data

    # NOTE: Xty is only needed by the non-fused paths; the gram-fused Pallas
    # kernels build it in VMEM.  Compute it lazily so an eager caller on a
    # fused path never pays the (K,N)@(N,M) matmul (ADVICE r3).
    if alpha_is_zero:
        from insider_tpu.ops.row_update import _ridge_solve_batched
        Xty = jnp.matmul(R.T, _masked_data(), precision=HIGHEST)  # (K, M)
        XtX = col_gram_masked(R, mask_f)                # (M, K, K)
        F = _ridge_solve_batched(XtX, Xty.T, lam).T
        return F, key, jnp.int32(0)
    if solver == "fss":
        if use_pallas:
            from insider_tpu.kernels.fss_pallas import (
                feature_sign_fused_pallas,
                feature_sign_pallas,
                fused_feasible,
            )

            # Plain-CD polish fused into the kernel (removes FSS's f32
            # KKT-slack objective excess and makes the result satisfy the
            # reference CD's stopping criterion; see FitConfig.fss_polish).
            polish = max_fss_polish_sweeps if fss_polish else 0
            # Gram-fused needs (a) the full row axis device-local and
            # (b) the kernel's VMEM residency to fit (ADVICE r3: large N
            # must fall back to the streamed kernel, not die at compile).
            rows_local = mesh is None or dict(mesh.shape).get("rows", 1) == 1
            if rows_local and fused_feasible(R.shape[1], R.shape[0]):
                # Gram-fused variant: the (K, K, M) gram is built in VMEM
                # from the mask/wx blocks and never exists in HBM.  Needs
                # the full row axis device-local.
                # block=512: a block runs outer steps until its SLOWEST
                # column converges, so narrower blocks early-exit at finer
                # granularity — measured 2.07 -> 1.93 ms/solve vs the
                # VMEM-maximal block at the flagship shape with identical
                # semantics (tools/fss_block_probe.py).
                F = _shard_cols_fused(
                    mesh,
                    lambda mk, w, r, b0: feature_sign_fused_pallas(
                        mk, w, r, b0, lam, alpha, max_fss_outer,
                        block=512, polish_sweeps=polish, tol=tol),
                    mask, fused_wx, R, F_prev,
                )
                return F, key, jnp.int32(-3)
            # streamed grams built by kernel — no (N, M) transients
            # (the XLA form materialized the widened mask AND mask.*data)
            XtXt, Xty = _shard_gram_xty(mesh, mask,
                                        data if masked_data is None
                                        else masked_data, R)
            F = _shard_cols(
                mesh,
                lambda xt, xy, b0: feature_sign_pallas(
                    xt, xy, b0, lam, alpha, max_fss_outer,
                    polish_sweeps=polish, tol=tol),
                XtXt, Xty, F_prev,
            )
            return F, key, jnp.int32(-2)
        from insider_tpu.ops.fss import feature_sign_batched

        Xty = jnp.matmul(R.T, _masked_data(), precision=HIGHEST)
        XtX = col_gram_masked(R, mask_f)
        F, outers = feature_sign_batched(XtX, Xty, F_prev, lam, alpha,
                                         max_fss_outer)
        if fss_polish:
            F, key, _ = elastic_net_cd(XtX, Xty, F, lam, alpha, tol, key,
                                       max_sweeps=max_fss_polish_sweeps,
                                       use_strong_rule=False)
        return F, key, outers
    if solver == "cd" and cd_warm_start and not alpha_is_zero:
        # FSS-warm-started CD (FitConfig.cd_warm_start): solve the sign
        # pattern exactly with FSS, then plain-CD sweeps (the fused polish,
        # all coordinates active, no screening needed — the exact solve
        # already satisfies the strong rule's purpose) until the
        # reference's per-column stopping criterion fires at `tol`
        # (coordinate_descent.cpp:112-114).  Same unique optimum and the
        # same stopping contract as cold CD; the MEDIAN flagship column
        # needs >200 cold sweeps (linear rate) vs a handful from here.
        return update_columns_masked(
            data, mask, R, F_prev, lam, alpha, tol, key,
            max_sweeps=max_sweeps, alpha_is_zero=alpha_is_zero,
            use_pallas=use_pallas, masked_data=masked_data, mesh=mesh,
            solver="fss", max_fss_outer=max_fss_outer, fss_polish=True,
            max_fss_polish_sweeps=max_sweeps)
    if use_pallas:
        # Sublane-packed CD kernels (kernels/cd_packed.py): identical
        # iteration to cd_pallas.py with the column axis laid out as
        # (8, BM/8) tiles — measured ~1.5x on hardware (the sweep
        # bookkeeping runs on full vregs).  The packed layout needs a
        # >=1024-column block; when the VMEM budget allows less (large K
        # or N), fall back to the unpacked kernels, which honor sub-1024
        # blocks (ADVICE r4 medium).
        from insider_tpu.kernels.cd_packed import (
            elastic_net_cd_fused_packed_pallas,
            elastic_net_cd_packed_pallas,
            packed_fused_feasible,
            packed_streamed_feasible,
        )
        from insider_tpu.kernels.cd_pallas import (
            elastic_net_cd_fused_pallas,
            elastic_net_cd_pallas,
        )
        from insider_tpu.kernels.fss_pallas import fused_feasible
        # Randomize coordinate order by permuting R's columns (one order per
        # update, shared across sweeps — see cd_pallas docstring), then
        # un-permute the solution.
        key, sub = jax.random.split(key)
        K = R.shape[1]
        N = R.shape[0]
        M = mask.shape[1]
        perm = jax.random.permutation(sub, K)
        inv = jnp.argsort(perm)
        Rp = R[:, perm]
        beta0 = F_prev[perm]
        rows_local = mesh is None or dict(mesh.shape).get("rows", 1) == 1
        if rows_local and fused_feasible(K, N, gj_scratch=False):
            # Gram-fused variant (see the fss branch above).
            if packed_fused_feasible(K, N, M):
                fused_fn = elastic_net_cd_fused_packed_pallas
                tag = -4
            else:
                fused_fn = elastic_net_cd_fused_pallas
                tag = -5
            F = _shard_cols_fused(
                mesh,
                lambda mk, w, r, b0: fused_fn(
                    mk, w, r, b0, lam, alpha, tol, max_sweeps),
                mask, fused_wx, Rp, beta0,
            )
            return F[inv], key, jnp.int32(tag)
        XtXt, Xty_p = _shard_gram_xty(mesh, mask,
                                      data if masked_data is None
                                      else masked_data, Rp)
        if packed_streamed_feasible(K, M):
            streamed_fn = elastic_net_cd_packed_pallas
            tag = -1
        else:
            streamed_fn = elastic_net_cd_pallas
            tag = -6
        F = _shard_cols(
            mesh,
            lambda xt, xy, b0: streamed_fn(
                xt, xy, b0, lam, alpha, tol, max_sweeps),
            XtXt, Xty_p, beta0,
        )
        return F[inv], key, jnp.int32(tag)
    Xty = jnp.matmul(R.T, _masked_data(), precision=HIGHEST)
    XtX = col_gram_masked(R, mask_f)
    return elastic_net_cd(XtX, Xty, F_prev, lam, alpha, tol, key, max_sweeps)


def update_columns_dense(
    data: jax.Array,
    R: jax.Array,
    F_prev: jax.Array,
    lam: float,
    alpha: float,
    tol: jax.Array,
    key: jax.Array,
    max_sweeps: int = 200,
    alpha_is_zero: bool = None,
    use_pallas: bool = False,
    solver: str = "cd",
    max_fss_outer: int = 48,
    fss_polish: bool = True,
    max_fss_polish_sweeps: int = 32,
    cd_warm_start: bool = True,
):
    """Dense (tuning==0) column update, src/optimize.cpp:232-247."""
    if alpha_is_zero is None:
        alpha_is_zero = alpha == 0.0
    if solver == "cd" and cd_warm_start and not alpha_is_zero:
        # FSS-warm-started CD — see update_columns_masked.
        return update_columns_dense(
            data, R, F_prev, lam, alpha, tol, key, max_sweeps=max_sweeps,
            alpha_is_zero=alpha_is_zero, use_pallas=use_pallas,
            solver="fss", max_fss_outer=max_fss_outer, fss_polish=True,
            max_fss_polish_sweeps=max_sweeps)
    K = R.shape[1]
    XtX = jnp.matmul(R.T, R, precision=HIGHEST)         # (K, K) shared
    Xty = jnp.matmul(R.T, data, precision=HIGHEST)      # (K, M)
    if alpha_is_zero:
        from insider_tpu.ops.linalg import gauss_jordan_solve
        A = XtX + lam * jnp.eye(K, dtype=R.dtype)
        F = gauss_jordan_solve(A, Xty)
        return F, key, jnp.int32(0)
    if solver == "fss":
        M = data.shape[1]
        if use_pallas:
            from insider_tpu.kernels.fss_pallas import (
                feature_sign_shared_pallas,
            )

            # Shared-gram kernel: the one (K, K) gram is broadcast in VMEM
            # (no (K, K, M) HBM broadcast — VERDICT r3 weak #8).
            F = feature_sign_shared_pallas(
                XtX, Xty, F_prev, lam, alpha, max_fss_outer,
                polish_sweeps=max_fss_polish_sweeps if fss_polish else 0,
                tol=tol)
            return F, key, jnp.int32(-2)
        from insider_tpu.ops.fss import feature_sign_batched

        F, outers = feature_sign_batched(XtX[None], Xty, F_prev, lam, alpha,
                                         max_fss_outer)
        if fss_polish:
            F, key, _ = elastic_net_cd(XtX[None], Xty, F, lam, alpha, tol,
                                       key,
                                       max_sweeps=max_fss_polish_sweeps,
                                       use_strong_rule=False)
        return F, key, outers
    if use_pallas:
        from insider_tpu.kernels.cd_pallas import elastic_net_cd_shared_pallas
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, K)
        inv = jnp.argsort(perm)
        XtXp = XtX[perm][:, perm]
        F = elastic_net_cd_shared_pallas(XtXp, Xty[perm], F_prev[perm], lam,
                                         alpha, tol, max_sweeps)
        return F[inv], key, jnp.int32(-1)
    return elastic_net_cd(XtX[None], Xty, F_prev, lam, alpha, tol, key, max_sweeps)
