"""End-to-end planner tests on the 6x6 grid: full batched mission loops.

The statistical ordering assertion (greedy beats random on uncertainty
reduction) is the de-facto integration test the reference relies on
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.planners import (
    GreedyPlanner,
    LawnmowerPlanner,
    RandomContinuousPlanner,
    RandomDiscretePlanner,
    SpiralPlanner,
)
from ipp_rl_tpu.config.schema import MissionConfig


@pytest.fixture(scope="module")
def world(small_cfg):
    return IPPWorld(small_cfg, dtype=jnp.float64)


def test_greedy_mission(world):
    p = GreedyPlanner(world, MissionConfig(type="greedy"))
    res = p.run(jax.random.key(0), batch_size=3, max_steps=8)
    unc = res.metrics["uncertainty"]
    assert unc.shape == (3, 9)
    # uncertainty must be non-increasing while active
    assert np.all(np.diff(unc, axis=1) <= 1e-9)
    assert np.all(res.num_steps >= 1)
    rmse = res.metrics["rmse"]
    assert rmse[:, -1].mean() < rmse[:, 0].mean()
    # budget decreases monotonically
    assert np.all(np.diff(res.budgets, axis=1) <= 1e-9)


def test_greedy_runs_until_budget(world):
    p = GreedyPlanner(world, MissionConfig(type="greedy"))
    res = p.run(jax.random.key(1), batch_size=2)
    # ends with remaining budget below the cheapest feasible hop or >= 0
    final_budget = res.budgets[np.arange(2), res.num_steps]
    assert np.all(final_budget >= -1e-6)
    # all missions eventually stop
    assert np.all(res.num_steps < res.budgets.shape[1] - 1)


def test_random_discrete(world):
    p = RandomDiscretePlanner(world, MissionConfig(type="random_discrete"))
    res = p.run(jax.random.key(2), batch_size=2, max_steps=10)
    assert np.all(res.num_steps >= 1)
    # chosen hops respect the 11.5 m distance cap
    wps = res.waypoints
    prev = np.asarray([[2.0, 2.0, 14.0]] * 2)
    for t in range(wps.shape[1]):
        cur = wps[:, t]
        ok = ~np.isnan(cur[:, 0])
        d = np.linalg.norm(cur[ok] - prev[ok], axis=1)
        assert np.all(d < 11.5)
        prev[ok] = cur[ok]


def test_lawnmower(world):
    p = LawnmowerPlanner(world, MissionConfig(type="lawnmower", step_size=5))
    res = p.run(jax.random.key(3), batch_size=2)
    assert np.all(res.num_steps >= 3)
    unc = res.metrics["uncertainty"]
    assert unc[0, -1] < unc[0, 0]
    # identical waypoints across missions (static path)
    w0, w1 = res.waypoints[0], res.waypoints[1]
    steps = min(res.num_steps[0], res.num_steps[1])
    np.testing.assert_allclose(w0[:steps], w1[:steps])


def test_spiral(world):
    p = SpiralPlanner(world, MissionConfig(type="spiral", num_waypoints=20))
    res = p.run(jax.random.key(4), batch_size=1)
    assert res.num_steps[0] >= 3
    # altitude descends along the spiral
    zs = res.waypoints[0, : res.num_steps[0], 2]
    assert zs[0] > zs[-1]


def test_random_continuous(world):
    p = RandomContinuousPlanner(world, MissionConfig(type="random_continuous"))
    res = p.run(jax.random.key(5), batch_size=2)
    assert np.all(res.num_steps >= 1)
    con = world.cfg.constraints
    env = world.cfg.environment
    wps = res.waypoints
    valid = ~np.isnan(wps[..., 0])
    assert np.all(wps[..., 2][valid] >= con.min_altitude)
    assert np.all(wps[..., 2][valid] <= con.max_altitude)
    assert np.all(wps[..., 0][valid] >= con.dist_to_boundaries)
    assert np.all(wps[..., 0][valid] <= env.extent_x - con.dist_to_boundaries)


def test_greedy_beats_random(world):
    """Solution-quality ordering at matched budget: greedy ≥ random."""
    g = GreedyPlanner(world, MissionConfig(type="greedy"))
    r = RandomDiscretePlanner(world, MissionConfig(type="random_discrete"))
    gres = g.run(jax.random.key(10), batch_size=4, max_steps=12)
    rres = r.run(jax.random.key(10), batch_size=4, max_steps=12)
    g_unc = gres.metrics["uncertainty"][:, -1].mean()
    r_unc = rres.metrics["uncertainty"][:, -1].mean()
    assert g_unc < r_unc


def test_effective_mission_time(world):
    """Budget additionally consumed by think time → fewer steps
    (reference greedy_mission.py:105-106)."""
    import dataclasses

    from ipp_rl_tpu.config.schema import EvaluationConfig

    cfg_eff = dataclasses.replace(
        world.cfg, evaluation=EvaluationConfig(use_effective_mission_time=True)
    )
    from ipp_rl_tpu.env.world import IPPWorld

    w2 = IPPWorld(cfg_eff, dtype=world.dtype)
    p_plain = GreedyPlanner(world, MissionConfig(type="greedy"))
    p_eff = GreedyPlanner(w2, MissionConfig(type="greedy"))
    res_plain = p_plain.run(jax.random.key(42), 2, max_steps=15)
    res_eff = p_eff.run(jax.random.key(42), 2, max_steps=15, think_time_per_step=3.0)
    assert np.all(res_eff.num_steps < res_plain.num_steps)


def test_determinism(world):
    """Identical keys → bit-identical mission outcomes (reproducibility,
    SURVEY.md §4 seeding discipline)."""
    p = GreedyPlanner(world, MissionConfig(type="greedy"))
    r1 = p.run(jax.random.key(5), 2, max_steps=6)
    r2 = p.run(jax.random.key(5), 2, max_steps=6)
    np.testing.assert_array_equal(r1.metrics["rmse"], r2.metrics["rmse"])
    np.testing.assert_array_equal(r1.waypoints, r2.waypoints)
    r3 = p.run(jax.random.key(6), 2, max_steps=6)
    assert not np.array_equal(r1.metrics["rmse"], r3.metrics["rmse"])
