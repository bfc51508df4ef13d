"""Regression guard on the committed quality-parity artifacts
(runs/parity, runs/parity_adaptive — produced by
scripts/quality_parity.py against the ACTUAL reference implementations
on matched worlds; BASELINE.md's map-RMSE/uncertainty parity promise).

Tolerances are deliberately loose: the planners are stochastic and the
artifact records only 3 repetitions.  The assertions pin the ORDERING
that makes the artifact evidence — our planners within (or better than)
the reference's solution quality — so a regression that silently
degrades a planner fails CI the next time the artifact is regenerated.
"""

import json
import os

import pytest

HERE = os.path.dirname(__file__)


def _load(name):
    path = os.path.join(HERE, "..", "runs", name, "parity.json")
    if not os.path.exists(path):
        pytest.skip(f"no committed parity artifact ({name})")
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def parity():
    return _load("parity")


@pytest.fixture(scope="module")
def parity_adaptive():
    return _load("parity_adaptive")


@pytest.mark.parametrize("planner", ["greedy", "mcts", "cmaes"])
def test_rmse_parity_non_adaptive(parity, planner):
    e = parity["planners"][planner]
    ours, ref = e["ours"]["rmse_final"][0], e["reference"]["rmse_final"][0]
    assert ours <= ref * 1.25 + 0.01, f"{planner}: rmse {ours:.3f} vs ref {ref:.3f}"


@pytest.mark.parametrize("planner", ["greedy", "mcts", "cmaes"])
def test_uncertainty_parity_non_adaptive(parity, planner):
    e = parity["planners"][planner]
    ours = e["ours"]["uncertainty_final"][0]
    ref = e["reference"]["uncertainty_final"][0]
    assert ours <= ref * 1.35 + 1.0, f"{planner}: tr(P) {ours:.2f} vs ref {ref:.2f}"


def test_greedy_cov_path_exact(parity):
    """Greedy is deterministic given the world: the covariance path must
    match the reference to float precision (same actions)."""
    e = parity["planners"]["greedy"]
    ours = e["ours"]["uncertainty_final"][0]
    ref = e["reference"]["uncertainty_final"][0]
    assert abs(ours - ref) < 1e-3, f"greedy tr(P) {ours} != ref {ref}"


@pytest.mark.parametrize("planner", ["greedy", "mcts", "cmaes"])
def test_parity_adaptive_regime(parity_adaptive, planner):
    e = parity_adaptive["planners"][planner]
    ours, ref = e["ours"]["rmse_final"][0], e["reference"]["rmse_final"][0]
    assert ours <= ref * 1.25 + 0.01, f"{planner}: rmse {ours:.3f} vs ref {ref:.3f}"
    ours_u = e["ours"]["uncertainty_final"][0]
    ref_u = e["reference"]["uncertainty_final"][0]
    assert ours_u <= ref_u * 1.35 + 1.0, (
        f"{planner}: tr(P) {ours_u:.2f} vs ref {ref_u:.2f}"
    )


def test_zero_quality_adaptive(parity_adaptive):
    """The trained zero checkpoint (canonical 100 sims) is held to the
    reference's own claim — solution quality on par with its sampling
    planners (reference README.md:15-16): masked tr(P) within 2x of the
    reference classic MCTS row of the SAME artifact and RMSE within
    1.25x of it.  A near-random policy (~40 masked tr(P) vs ref MCTS
    ~21 at budget 100) fails these bounds."""
    if "zero" not in parity_adaptive["planners"]:
        pytest.skip("zero not in artifact")
    z = parity_adaptive["planners"]["zero"]["ours"]
    m = parity_adaptive["planners"]["mcts"]["reference"]
    assert z["uncertainty_final"][0] <= m["uncertainty_final"][0] * 2.0, (
        f"zero tr(P) {z['uncertainty_final'][0]:.2f} vs ref MCTS "
        f"{m['uncertainty_final'][0]:.2f}"
    )
    assert z["rmse_final"][0] <= m["rmse_final"][0] * 1.25 + 0.01


@pytest.fixture(scope="module")
def parity_b200():
    return _load("parity_b200")


@pytest.mark.parametrize("planner", ["greedy", "mcts", "cmaes"])
def test_parity_canonical_budget(parity_b200, planner):
    """Budget-200 adaptive (the canonical operating point)."""
    e = parity_b200["planners"][planner]
    ours, ref = e["ours"]["rmse_final"][0], e["reference"]["rmse_final"][0]
    assert ours <= ref * 1.25 + 0.01, f"{planner}: rmse {ours:.3f} vs ref {ref:.3f}"
    ours_u = e["ours"]["uncertainty_final"][0]
    ref_u = e["reference"]["uncertainty_final"][0]
    assert ours_u <= ref_u * 1.35 + 1.0, (
        f"{planner}: tr(P) {ours_u:.2f} vs ref {ref_u:.2f}"
    )


def test_zero_quality_canonical_budget(parity_b200):
    """Trained zero at its training budget (200) AND the reference's
    canonical 100 deploy simulations (config/example.yaml:61), held to
    the reference's on-par claim (README.md:15-16) at the same
    tolerance as the planner parity gates: masked tr(P) within 1.1x+1.0
    of the reference classic MCTS row (r5 artifact: 4.65 vs 3.61 at
    n=10, ratio 1.29x; the r4 gate was 2.0x) and RMSE within 1.25x.  A
    near-random policy (~38 masked tr(P)) fails by ~8x."""
    z = parity_b200["planners"]["zero"]["ours"]
    m = parity_b200["planners"]["mcts"]["reference"]
    assert z["uncertainty_final"][0] <= m["uncertainty_final"][0] * 1.1 + 1.0, (
        f"zero tr(P) {z['uncertainty_final'][0]:.2f} vs ref MCTS "
        f"{m['uncertainty_final'][0]:.2f}"
    )
    assert z["rmse_final"][0] <= m["rmse_final"][0] * 1.25 + 0.01


def test_zero_beats_reference_mcts_at_200_sims():
    """Deploy-compute scaling artifact (runs/parity_b200_sims200): at
    200 simulations the zero planner's final masked tr(P) must stay at
    or below the reference classic MCTS row (r5, n=10 matched worlds:
    2.86±1.83 vs 3.61±2.36 — the reference's 'on-par' claim,
    exceeded).  Tolerance covers both runs' spread."""
    s200 = _load("parity_b200_sims200")
    b200 = _load("parity_b200")
    z = s200["planners"]["zero"]["ours"]
    m = b200["planners"]["mcts"]["reference"]
    assert z["uncertainty_final"][0] <= m["uncertainty_final"][0] * 1.1 + 1.0, (
        f"zero@200sims {z['uncertainty_final'][0]:.2f} vs ref MCTS "
        f"{m['uncertainty_final'][0]:.2f}"
    )


def test_zero_within_2x_reference_cmaes_at_200_sims():
    """The reference's on-par family includes its CMA-ES baseline
    (reference planning/ipp_masha.py:160-219, README.md:15-16) — the
    strongest of its planners on matched worlds.  VERDICT r4 task 5:
    commit an operating point with zero <= 2x reference CMA-ES.  The r5
    artifact holds 2.86±1.83 vs 1.46±0.44 (ratio 1.96x) at 200
    simulations on 10 matched worlds."""
    s200 = _load("parity_b200_sims200")
    z = s200["planners"]["zero"]["ours"]
    c = s200["planners"]["cmaes"]["reference"]
    assert z["uncertainty_final"][0] <= c["uncertainty_final"][0] * 2.0, (
        f"zero@200sims {z['uncertainty_final'][0]:.2f} vs ref CMA-ES "
        f"{c['uncertainty_final'][0]:.2f}"
    )
