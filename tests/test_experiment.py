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
