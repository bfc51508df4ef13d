"""Experiment harness end-to-end smoke test (6x6 grid, 3 planners)."""

import os

import numpy as np
import pytest

from ipp_rl_tpu.config.schema import config_from_dict
from ipp_rl_tpu.experiments import Experiment


@pytest.fixture(scope="module")
def experiment_cfg():
    return config_from_dict(
        {
            "environment": {"x_dim": 6, "y_dim": 6, "resolution": 4},
            "sensor": {
                "field_of_view": {"angle_x": 60, "angle_y": 60},
                "model": {"type": "altitude_dependent", "coeff_a": 0.05, "coeff_b": 0.2},
                "simulation": {"type": "gaussian_random_field", "cluster_radius": 5},
            },
            "mapping": {"fit_gaussian_process": True},
            "experiment": {
                "title": "smoke",
                "constraints": {
                    "dist_to_boundaries": 3,
                    "min_altitude": 8,
                    "max_altitude": 14,
                    "altitude_spacing": 6,
                    "budget": 40,
                },
                "scenario": {"adaptive": True, "value_threshold": 0.4, "interval_factor": 0},
                "uav": {"max_v": 2, "max_a": 2, "sampling_time": 2},
                "missions": [
                    {"type": "greedy", "color": "blue"},
                    {"type": "random_discrete", "color": "red"},
                    {"type": "lawnmower", "color": "orange", "step_size": 6},
                ],
                "evaluation": {"repetitions": 3},
            },
        }
    )


def test_experiment_run_eval_save(experiment_cfg, tmp_path):
    exp = Experiment(experiment_cfg, results_dir=str(tmp_path), seed=1)
    results = exp.run(max_steps=6)
    assert set(results) == {
        "greedy_standard",
        "random_discrete_standard",
        "lawnmower_standard",
    }
    # identical starting worlds: step-0 metrics equal across planners
    m0 = {n: r.metrics["rmse"][:, 0] for n, r in results.items()}
    vals = list(m0.values())
    np.testing.assert_allclose(vals[0], vals[1])
    np.testing.assert_allclose(vals[0], vals[2])

    kpis = exp.evaluate(make_plots=True)
    assert "greedy_standard" in kpis
    assert "rmse@50" in kpis["greedy_standard"]
    # greedy should beat random at matched consumed budget
    assert (
        kpis["greedy_standard"]["final_uncertainty"]
        <= kpis["random_discrete_standard"]["final_uncertainty"]
    )
    out = exp.save()
    assert os.path.exists(os.path.join(out, "experiment.pkl"))
    assert os.path.exists(os.path.join(out, "kpis.json"))
    assert os.path.exists(os.path.join(out, "plots", "rmse.png"))
    assert os.path.exists(os.path.join(out, "plots", "paths_3d.png"))


def test_interpolated_curves(experiment_cfg, tmp_path):
    exp = Experiment(experiment_cfg, results_dir=str(tmp_path), seed=2)
    exp.run(max_steps=5)
    curves = exp.interpolated_curves("uncertainty")
    for name, c in curves.items():
        assert c["axis"].shape == (100,)
        assert np.all(np.diff(c["axis"]) >= 0)
        # uncertainty decreases along flight time for every planner
        assert c["mean"][-1] < c["mean"][0]


def test_effective_mission_time_shrinks_budget(experiment_cfg, tmp_path, monkeypatch):
    """With evaluation.use_effective_mission_time, the measured per-replan
    latency is charged against the budget each step (reference
    planning/greedy_mission.py:105-106) — missions take fewer steps."""
    import dataclasses

    import ipp_rl_tpu.experiments.experiment as expmod

    cfg = dataclasses.replace(
        experiment_cfg,
        missions=(experiment_cfg.missions[0],),  # greedy only
        evaluation=dataclasses.replace(
            experiment_cfg.evaluation, use_effective_mission_time=True
        ),
    )
    # pretend planning costs 3 budget-seconds per replan
    monkeypatch.setattr(expmod, "measure_replan_latency", lambda *a, **k: 3.0)
    exp = Experiment(cfg, results_dir=str(tmp_path), seed=3)
    res = exp.run(max_steps=8)["greedy_standard"]

    cfg_off = dataclasses.replace(
        cfg,
        evaluation=dataclasses.replace(cfg.evaluation, use_effective_mission_time=False),
    )
    exp_off = Experiment(cfg_off, results_dir=str(tmp_path), seed=3)
    res_off = exp_off.run(max_steps=8)["greedy_standard"]

    # same seeds → same worlds; the charged think time consumes budget
    assert res.num_steps.sum() < res_off.num_steps.sum() or (
        res.budgets[:, -1].mean() < res_off.budgets[:, -1].mean()
    )
    # the extra consumption equals ~3 s per executed step
    spent = res.budgets[:, 0] - res.budgets[:, -1]
    spent_off = res_off.budgets[:, 0] - res_off.budgets[:, -1]
    flight = res.flight_times.sum(axis=1)
    np.testing.assert_allclose(spent, flight + 3.0 * res.num_steps, rtol=1e-5)
