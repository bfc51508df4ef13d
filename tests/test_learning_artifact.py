"""Regression guard on the committed reduced-scale training artifact.

`scripts/train_zero.py` trains an MCTS-zero agent by self-play on the
TPU and evaluates it against the greedy / random baselines on held-out
worlds (the reference's core claim: on-par solution quality at a
fraction of the planning runtime, reference README.md:15-16,
mcts_zero_mission.py:417-455).  The run's eval table is committed at
runs/zero_canon/eval.json (20 iterations x 192 envs, 100 simulations,
40-step episodes — the reference's canonical search/episode scale);
these tests assert the orderings that make the artifact evidence of
learning, so a regression that silently breaks training (targets,
replay, schedules, deploy path) fails CI the next time the artifact is
regenerated.

Committed result (32 held-out worlds, 25 replan steps, budget 200):
trained zero 13.24 final uncertainty vs random 40.23 and
untrained-weights search 43.98; RMSE 0.1486 vs greedy's 0.1419.
"""

import json
import os

import pytest

ARTIFACT = os.path.join(
    os.path.dirname(__file__), "..", "runs", "zero_canon", "eval.json"
)


@pytest.fixture(scope="module")
def eval_table():
    if not os.path.exists(ARTIFACT):
        pytest.skip("no committed training artifact (runs/zero_small/eval.json)")
    with open(ARTIFACT) as f:
        return json.load(f)


def test_trained_zero_beats_random(eval_table):
    """Final map uncertainty: trained searcher < random baseline."""
    zero = eval_table["mcts_zero"]["final_uncertainty"]
    rand = eval_table["random"]["final_uncertainty"]
    assert zero < rand, f"trained zero ({zero:.2f}) not better than random ({rand:.2f})"


def test_trained_zero_rmse_not_worse_than_random(eval_table):
    zero = eval_table["mcts_zero"]["final_rmse"]
    rand = eval_table["random"]["final_rmse"]
    assert zero <= rand * 1.05, f"zero rmse {zero:.4f} vs random {rand:.4f}"


def test_training_improves_over_untrained_search(eval_table):
    """Same search budget, fresh weights vs trained weights."""
    if "mcts_zero_untrained" not in eval_table:
        pytest.skip("artifact lacks the untrained control")
    trained = eval_table["mcts_zero"]["final_uncertainty"]
    untrained = eval_table["mcts_zero_untrained"]["final_uncertainty"]
    assert trained < untrained, (
        f"training made the searcher worse: {trained:.2f} vs {untrained:.2f}"
    )


def test_uncertainty_curve_monotone_decreasing(eval_table):
    """Belief uncertainty must not increase under measurement commits."""
    curve = eval_table["mcts_zero"]["uncertainty_curve"]
    assert all(b <= a + 1e-6 for a, b in zip(curve, curve[1:]))
