"""Classic MCTS and CMA-ES planner tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ipp_rl_tpu.config.schema import MissionConfig
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.planners import ClassicMCTSPlanner, CMAESPlanner, RandomDiscretePlanner


@pytest.fixture(scope="module")
def world(small_cfg):
    return IPPWorld(small_cfg, dtype=jnp.float32)


def test_cma_es_minimizes_quadratic():
    from ipp_rl_tpu.planners.cmaes import cma_es_minimize

    target = jnp.asarray([1.0, -2.0, 3.0])

    def obj(pop):
        return jnp.sum(jnp.square(pop - target[None, :]), axis=-1)

    best_x, best_f = cma_es_minimize(
        obj,
        x0=jnp.zeros(3),
        sigma_scales=jnp.ones(3),
        lower=jnp.full(3, -10.0),
        upper=jnp.full(3, 10.0),
        popsize=16,
        maxiter=60,
        key=jax.random.key(0),
    )
    assert float(best_f) < 1e-2
    np.testing.assert_allclose(np.asarray(best_x), np.asarray(target), atol=0.2)


@pytest.mark.slow
def test_classic_mcts_mission(world):
    mc = MissionConfig(
        type="mcts", num_simulations=16, episode_horizon=3, horizontal_spacing=12.0
    )
    p = ClassicMCTSPlanner(world, mc)
    res = p.run(jax.random.key(0), batch_size=2, max_steps=5)
    assert np.all(res.num_steps >= 1)
    unc = res.metrics["uncertainty"]
    assert unc[:, -1].mean() < unc[:, 0].mean()


@pytest.mark.slow
def test_classic_mcts_beats_random(world):
    mc = MissionConfig(
        type="mcts", num_simulations=24, episode_horizon=3, horizontal_spacing=14.0
    )
    p = ClassicMCTSPlanner(world, mc)
    r = RandomDiscretePlanner(world, MissionConfig(type="random_discrete"))
    pres = p.run(jax.random.key(1), batch_size=3, max_steps=8)
    rres = r.run(jax.random.key(1), batch_size=3, max_steps=8)
    assert (
        pres.metrics["uncertainty"][:, -1].mean()
        < rres.metrics["uncertainty"][:, -1].mean()
    )


@pytest.mark.slow
def test_cmaes_mission(world):
    mc = MissionConfig(
        type="cmaes", episode_horizon=2, cma_popsize=6, cma_maxiter=4, cma_sigma=2.0
    )
    p = CMAESPlanner(world, mc)
    res = p.run(jax.random.key(2), batch_size=2, max_steps=4)
    assert np.all(res.num_steps >= 1)
    unc = res.metrics["uncertainty"]
    assert unc[:, -1].mean() < unc[:, 0].mean()
    # waypoints stay in bounds
    wps = res.waypoints
    ok = ~np.isnan(wps[..., 0])
    con, env = world.cfg.constraints, world.cfg.environment
    assert np.all(wps[..., 2][ok] >= con.min_altitude - 1e-5)
    assert np.all(wps[..., 2][ok] <= con.max_altitude + 1e-5)
    assert np.all(wps[..., 0][ok] >= -1e-5)
    assert np.all(wps[..., 0][ok] <= env.extent_x + 1e-5)


@pytest.mark.slow
def test_classic_mcts_root_parallel(world):
    """num_mcts_workers=W runs W vmapped trees with num_simulations/W
    sims each and merges root stats by summed per-action visit/value
    (reference mcts_mission.py:312-389).  The merged planner must be a
    working planner (reduces uncertainty) and split the sim budget."""
    mc = MissionConfig(
        type="mcts", num_simulations=16, episode_horizon=3,
        horizontal_spacing=12.0, num_mcts_workers=4,
    )
    p = ClassicMCTSPlanner(world, mc)
    assert p.num_workers == 4
    assert p.num_simulations == 4  # 16 // 4 per worker
    res = p.run(jax.random.key(3), batch_size=2, max_steps=5)
    assert np.all(res.num_steps >= 1)
    unc = res.metrics["uncertainty"]
    assert unc[:, -1].mean() < unc[:, 0].mean()


def test_classic_mcts_config_knobs(world):
    """gamma / epsilon_expand / epsilon_rollout come from config
    (reference mcts_mission.py:89,94-95) — no hardcoded constants."""
    mc = MissionConfig(
        type="mcts", num_simulations=8, episode_horizon=3,
        gamma=0.5, epsilon_expand=0.1, epsilon_rollout=0.9,
    )
    p = ClassicMCTSPlanner(world, mc)
    assert (p.gamma, p.eps_expand, p.eps_rollout) == (0.5, 0.1, 0.9)


def test_mission_config_reference_aliases():
    """The reference YAML key spellings (constants.py:119-137) load into
    the schema fields."""
    from ipp_rl_tpu.config.schema import config_from_dict

    cfg = config_from_dict(
        {
            "environment": {"x_dim": 4, "y_dim": 4, "resolution": 4},
            "experiment": {
                "missions": [
                    {
                        "type": "mcts",
                        "c": 2.0,
                        "max_greedy_radius": 9.0,
                        "epsilon": 0.3,
                        "gamma": 0.8,
                        "epsilon_rollout": 0.6,
                    },
                    {
                        "type": "cmaes",
                        "cmaes_max_iter": 11,
                        "cmaes_population_size": 7,
                        "cmaes_sigma0": 2.5,
                    },
                ]
            },
        }
    )
    m, c = cfg.missions
    assert (m.uct_c, m.horizontal_spacing, m.epsilon_expand) == (2.0, 9.0, 0.3)
    assert (m.gamma, m.epsilon_rollout) == (0.8, 0.6)
    assert (c.cma_maxiter, c.cma_popsize, c.cma_sigma) == (11, 7, 2.5)


@pytest.mark.slow
def test_cmaes_chunk_padding_does_not_overstep(world):
    """max_steps % scan_chunk != 0: the padded chunk steps must be
    no-ops — final_state has to agree with the last trimmed per-step
    output instead of executing up to chunk-1 extra moves."""
    mc = MissionConfig(
        type="cmaes", episode_horizon=2, cma_popsize=6, cma_maxiter=3,
        cma_sigma=2.0,
    )
    p = CMAESPlanner(world, mc)
    assert p.scan_chunk == 4
    res = p.run(jax.random.key(5), batch_size=2, max_steps=5)  # 5 % 4 != 0
    assert res.budgets.shape[1] == 6  # initial + 5 requested steps
    np.testing.assert_allclose(
        np.asarray(res.final_state.budget), res.budgets[:, -1], rtol=1e-6
    )
    # uncertainty of the final state matches the last trimmed metric row
    final_unc = np.asarray(world.evaluate(res.final_state)["uncertainty"])
    np.testing.assert_allclose(
        final_unc, res.metrics["uncertainty"][:, -1], rtol=1e-5
    )
