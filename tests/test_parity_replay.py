"""Reduced-scale replay of the parity gate (tools/parity_run.py).

The committed PARITY_r*.md artifact runs the flagship ageing configuration
(/root/reference/tests/ageing.R:13-46) on the real device; this test replays
the same two gate protocols at a scale CI can afford on the CPU backend:

A. fixed-budget trajectory agreement — both solvers (cd = the reference's
   strong-rule coordinate descent, fss = the default active-set solver) run
   the same budget from the identical problem and init and must agree on
   loss/RMSE (the reference's own flagship run is budget-capped,
   tests/ageing.R:40, so this is the honest flagship gate);
B. the relative-loss stop (src/optimize.cpp:405) actually fires
   (OptimizeResult.converged) at an f32-resolvable tolerance, and the
   converged fits agree.

Shapes are checked against the reference's structural contract
(README.md:113-118) with the interaction factor in position 2
(R/insider.R:40).
"""

import numpy as np
import pytest

import insider_tpu as it
from insider_tpu.api import build_interaction_codes
from insider_tpu.config import FitConfig
from insider_tpu.train import als

N_ROWS, N_COLS, K = 90, 500, 8
LEVELS = (2, 5, 11)          # analog of (pid, sid, did); interaction(pid, sid)
LAMBDA, ALPHA = 6.0, 0.4
FIRES_TOL = 1e-6             # reduced-scale analog of the artifact's 2e-7
REF_BUDGET = 1000
REL_TOL = 1e-5               # agreement bound (measured gaps ~1e-6 here)


@pytest.fixture(scope="module")
def problem():
    sim = it.simulate_scale(N_ROWS, N_COLS, K, level_counts=LEVELS,
                            noise_std=1.0, seed=3)
    conf = sim.confounder
    inter = build_interaction_codes(conf, [0, 1])
    conf_full = np.column_stack([conf[:, 0], inter, conf[:, 1:]])
    split = it.ratio_splitter(sim.data.astype(np.float64), ratio=0.1,
                              rm_na_col=False)
    return als.build_problem(
        split.data, conf_full, split.train_indicator, split.test_indicator,
        masked=True,
    )


@pytest.fixture(scope="module")
def fits(problem):
    out = {}
    for solver in ("cd", "fss"):
        cfg = FitConfig(latent_dim=K, lambda1=LAMBDA, lambda2=LAMBDA,
                        alpha=ALPHA, masked=True, global_tol=FIRES_TOL,
                        sub_tol=1e-5, max_iter=6500, col_solver=solver,
                        cd_warm_start=False,
                        seed=0)
        out[solver] = als.optimize(problem, cfg, verbose=False)
    return out


def _rel(a, b):
    return abs(a - b) / max(abs(a), abs(b), 1e-30)


def test_protocol_b_stop_fires(fits):
    # The relative-loss stop must actually fire for both solvers — the real
    # converged flag, not n_iter inference (ADVICE r2).
    for solver, res in fits.items():
        assert not res.diverged, solver
        assert res.converged, (solver, res.n_iter)
        assert res.n_iter < 6500


def test_protocol_b_converged_agreement(fits):
    cd, fss = fits["cd"], fits["fss"]
    assert _rel(cd.loss, fss.loss) <= REL_TOL
    assert _rel(cd.train_rmse, fss.train_rmse) <= REL_TOL
    assert _rel(cd.test_rmse, fss.test_rmse) <= REL_TOL


def test_protocol_a_fixed_budget_agreement(fits):
    # Trajectory agreement at a fixed reference-style budget, from the
    # per-boundary histories of the same runs.
    h = {s: {rec["iter"]: rec for rec in fits[s].history}
         for s in ("cd", "fss")}
    assert REF_BUDGET in h["cd"] and REF_BUDGET in h["fss"]
    a, b = h["cd"][REF_BUDGET], h["fss"][REF_BUDGET]
    assert _rel(a["loss"], b["loss"]) <= 1e-5
    assert _rel(a["train_rmse"], b["train_rmse"]) <= 1e-5
    # mid-crawl test-RMSE agreement fluctuates boundary to boundary (the
    # converged-point bound in test_protocol_b_converged_agreement is the
    # tight one); measured ~1.4e-5 on the virtual-device backend.
    assert _rel(a["test_rmse"], b["test_rmse"]) <= 5e-5


def test_shapes_match_reference_contract(fits, problem):
    # One (L_v, K) factor per confounder with the interaction inserted as
    # column 2 (R/insider.R:40) + the (K, M) column factor (README.md:113-118).
    n_levels = problem.n_levels
    for res in fits.values():
        assert [f.shape[0] for f in res.row_matrices] == list(n_levels)
        assert all(f.shape[1] == K for f in res.row_matrices)
        assert res.column_factor.shape == (K, N_COLS)
    # interaction level count: #unique realized (pid, sid) pairs, position 2
    assert n_levels[0] == 2 and n_levels[2] == 5
    assert n_levels[1] <= 2 * 5


def test_sparsity_induced(fits):
    # alpha=0.4 elastic net must produce exact zeros in F for both solvers.
    for res in fits.values():
        assert (res.column_factor == 0).mean() > 0.01
