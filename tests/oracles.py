"""Float64 numpy transliterations of the reference algorithms.

These are executable specs of the C++ kernels (the same role
R/optimization_functions.R played for the reference authors, SURVEY.md §4)
used as test oracles.  They follow the reference control flow step by step —
including per-column randperm sweeps — but run in numpy float64.
"""

from __future__ import annotations

import numpy as np


def cd_loss(residual, beta, lam, alpha):
    """compute_loss (src/utils.cpp:46-49)."""
    return (
        0.5 * np.sum(residual**2)
        + 0.5 * (1 - alpha) * lam * np.sum(beta**2)
        + alpha * lam * np.sum(np.abs(beta))
    )


def coordinate_descent(X, y, wstart, lam, alpha, XtX, Xty, tol=1e-5, rng=None,
                       max_sweeps=10_000):
    """Plain CD (src/coordinate_descent.cpp:11-54), UB on first pre_loss
    replaced by an always-run-first-sweep rule."""
    rng = rng or np.random.default_rng(0)
    beta = wstart.astype(np.float64).copy()
    residual = y - X @ beta
    iter_loss = np.inf
    for _ in range(max_sweeps):
        pre_loss = iter_loss
        for k in rng.permutation(beta.size):
            u = residual @ X[:, k] + beta[k] * XtX[k, k]
            if abs(u) > lam * alpha:
                w = np.sign(u) * max(abs(u) - lam * alpha, 0.0) / (
                    XtX[k, k] + lam * (1 - alpha)
                )
            else:
                w = 0.0
            if w != beta[k]:
                residual -= (w - beta[k]) * X[:, k]
                beta[k] = w
        iter_loss = cd_loss(residual, beta, lam, alpha)
        if abs(pre_loss - iter_loss) <= tol:
            break
    return beta


def strong_coordinate_descent(X, y, wstart, lam, alpha, XtX, Xty, tol=1e-5,
                              rng=None, max_sweeps=10_000):
    """Strong-rule CD with KKT reactivation (src/coordinate_descent.cpp:57-127)."""
    rng = rng or np.random.default_rng(0)
    beta = wstart.astype(np.float64).copy()
    active = np.ones(beta.size, bool)
    ex = np.abs(Xty) < alpha * (2 * lam - np.max(np.abs(Xty)))
    active[ex] = False
    beta[ex] = 0.0
    residual = y - X @ beta
    iter_loss = cd_loss(residual, beta, lam, alpha)

    while True:
        inc = np.flatnonzero(active)
        exc = np.flatnonzero(~active)
        for _ in range(max_sweeps):
            pre_loss = iter_loss
            for i in rng.permutation(inc.size):
                k = inc[i]
                u = residual @ X[:, k] + beta[k] * XtX[k, k]
                if abs(u) > lam * alpha:
                    w = np.sign(u) * max(abs(u) - lam * alpha, 0.0) / (
                        XtX[k, k] + lam * (1 - alpha)
                    )
                else:
                    w = 0.0
                if w != beta[k]:
                    residual -= (w - beta[k]) * X[:, k]
                    beta[k] = w
            iter_loss = cd_loss(residual, beta, lam, alpha)
            if abs(pre_loss - iter_loss) <= tol:
                break
        grad = XtX[np.ix_(exc, inc)] @ beta[inc] - Xty[exc]
        violated = np.abs(grad) > alpha * lam
        if not violated.any():
            break
        active[exc[violated]] = True
    return beta


def ridge_row_update_masked(residual, mask, F, codes, n_levels, lam):
    """optimize_row masked path (src/optimize.cpp:150-176), direct form."""
    K = F.shape[0]
    V = np.zeros((n_levels, K))
    for l in range(n_levels):
        ids = np.flatnonzero(codes == l)
        XtX = np.zeros((K, K))
        Xty = np.zeros(K)
        for i in ids:
            w = mask[i].astype(np.float64)
            XtX += (F * w) @ F.T
            Xty += F @ (w * residual[i])
        V[l] = np.linalg.solve(XtX + lam * np.eye(K), Xty)
    return V


def ridge_row_update_dense(residual, F, codes, n_levels, lam):
    """optimize_row dense path (src/optimize.cpp:178-191)."""
    K = F.shape[0]
    gram = F @ F.T
    V = np.zeros((n_levels, K))
    for l in range(n_levels):
        ids = np.flatnonzero(codes == l)
        XtX = len(ids) * gram + lam * np.eye(K)
        Xty = F @ residual[ids].sum(axis=0)
        V[l] = np.linalg.solve(XtX, Xty)
    return V


def ctns_update_masked(resid_plus, mask, F, c, w0, lam, tol=1e-1,
                       max_sweeps=1000):
    """optimize_continuous_v2 masked path (src/optimize.cpp:80-126)."""
    K = F.shape[0]
    w = w0.astype(np.float64).copy()
    resid = resid_plus - np.outer(c, w @ F)
    for _ in range(max_sweeps):
        pre = w.copy()
        for k in range(K):
            resid += np.outer(c, w[k] * F[k])
            XtX = np.sum((c**2)[:, None] * mask * (F[k] ** 2)[None, :])
            Xty = c @ ((mask * resid) @ F[k])
            w[k] = Xty / (XtX + lam)
            resid -= np.outer(c, w[k] * F[k])
        if np.sum(np.abs(pre - w)) < tol:
            break
    return w


def global_loss(data, mask, cfd_factors, codes_list, F, lam1, lam2, alpha,
                ctns=None, W=None):
    """compute_loss over all factors (src/utils.cpp:79-102), masked residual."""
    R = np.zeros((data.shape[0], F.shape[0]))
    for V, codes in zip(cfd_factors, codes_list):
        R += V[codes]
    if ctns is not None:
        R += ctns @ W
    resid = (data - R @ F) * mask
    row_reg = lam1 * sum(np.sum(V**2) for V in cfd_factors)
    if W is not None:
        row_reg += lam1 * np.sum(W**2)
    col_reg = lam2 * (1 - alpha) * np.sum(F**2)
    l1_reg = lam2 * alpha * np.sum(np.abs(F))
    return 0.5 * np.sum(resid**2) + 0.5 * row_reg + 0.5 * col_reg + l1_reg
