"""Golden parity tests against the ACTUAL reference implementation.

Imports the reference modules from /root/reference (numpy/sklearn code,
runs fine on CPU) and checks our TPU-native kernels reproduce them
bit-for-bit (float64) on the canonical 10x10 workload:

  * FoV projection         vs sensors/cameras.py:49-75
  * H and R construction   vs sensors/models/sensor_models.py:32-81
  * Kalman update          vs mapping/mappings.py:155-215
  * flight-time costs      vs planning/common/actions.py:19-41
  * action lattice         vs planning/common/actions.py:73-91
  * rewards + adaptive msk vs planning/common/rewards.py:8-31
  * evaluation metrics     vs planning/evaluation_metrics.py:4-58
  * one-step greedy argmax vs planning/common/optimization.py:14-30
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

from mapping.grid_maps import GridMap as RefGridMap  # noqa: E402
from mapping.mappings import Mapping as RefMapping  # noqa: E402
from sensors.cameras import RGBCamera as RefCamera  # noqa: E402
from sensors.models.sensor_models import AltitudeSensorModel as RefModel  # noqa: E402
import planning.common.actions as ref_actions  # noqa: E402
import planning.common.rewards as ref_rewards  # noqa: E402
import planning.evaluation_metrics as ref_metrics  # noqa: E402

from ipp_rl_tpu.env.world import IPPWorld  # noqa: E402
from ipp_rl_tpu.ops.geometry import (  # noqa: E402
    build_action_lattice,
    flight_times,
    project_field_of_view,
)
from ipp_rl_tpu.ops.kalman import kf_update  # noqa: E402
from ipp_rl_tpu.ops import metrics as our_metrics  # noqa: E402
from ipp_rl_tpu.ops.priors import gp_prior_cov  # noqa: E402
from ipp_rl_tpu.ops.rewards import adaptive_mask  # noqa: E402

UAV = {"max_v": 2.0, "max_a": 2.0, "sampling_time": 2.0}


@pytest.fixture(scope="module")
def ref_stack(canonical_cfg):
    params = {
        "environment": {"x_dim": 10, "y_dim": 10, "resolution": 4},
    }
    grid = RefGridMap(params)
    model = RefModel(coeff_a=0.05, coeff_b=0.2)
    camera = RefCamera(
        {"angle_x": 60, "angle_y": 60}, model, grid, encoding="rgb8"
    )
    return grid, model, camera


@pytest.fixture(scope="module")
def world(canonical_cfg):
    return IPPWorld(canonical_cfg, dtype=jnp.float64)


def test_fov_projection_parity(ref_stack, canonical_cfg):
    _, _, camera = ref_stack
    rng = np.random.default_rng(0)
    for _ in range(50):
        pos = np.array(
            [rng.uniform(0, 40), rng.uniform(0, 40), rng.uniform(8, 14)]
        )
        assert project_field_of_view(pos, canonical_cfg) == camera.project_field_of_view(pos)


def test_action_lattice_parity(ref_stack, canonical_cfg):
    grid, _, _ = ref_stack
    ref = ref_actions.enumerate_actions(grid, 8.0, 14.0, 6.0)
    ref_np = ref_actions.action_dict_to_np_array(ref)
    ours = build_action_lattice(canonical_cfg).xyz
    np.testing.assert_allclose(ours, ref_np)


def test_measurement_model_parity(ref_stack, world, canonical_cfg):
    """H and R for EVERY lattice action match the reference construction."""
    grid, model, camera = ref_stack
    t = world.table
    for a in range(t.num_actions):
        pos = t.lattice.xyz[a]
        rf = camera.get_resolution_factor(pos)
        fov = camera.project_field_of_view(pos)
        xl, xr, yu, yd = fov
        m = int(np.ceil((xr - xl + 1) / rf) * np.ceil((yd - yu + 1) / rf))
        H_ref = model.measurement_model_matrix(grid, fov, m, rf)
        R_ref = model.measurement_variance_matrix(pos, m, rf)
        assert t.num_meas[a] == m, f"action {a}"
        np.testing.assert_allclose(t.H[a, :m], H_ref, err_msg=f"action {a}")
        np.testing.assert_allclose(
            t.R_diag[a, :m], np.diag(R_ref), err_msg=f"action {a}"
        )


def test_kalman_update_parity(ref_stack, world):
    """Full mean+cov commit vs reference kalman_filter_update on the GP
    prior with a synthetic observation."""
    grid, model, camera = ref_stack
    t = world.table
    n = 100
    P0 = np.asarray(gp_prior_cov(world.cfg))
    mean0 = 0.5 * np.ones(n)
    rng = np.random.default_rng(1)
    for a in [0, 44, 77, 100, 144, 199]:
        m = int(t.num_meas[a])
        z = rng.uniform(0, 1, m)
        H_ref = t.H[a, :m]
        R_ref = np.diag(t.R_diag[a, :m])
        x_ref, P_ref = RefMapping.kalman_filter_update(
            P0, H_ref, R_ref, grid_mean=mean0.reshape(10, 10), observation=z
        )
        z_pad = np.concatenate([z, np.zeros(t.max_meas - m)])
        x_out, P_out = kf_update(
            jnp.asarray(P0),
            jnp.asarray(mean0),
            jnp.asarray(t.H[a]),
            jnp.asarray(t.R_diag[a]),
            jnp.asarray(z_pad),
        )
        np.testing.assert_allclose(np.asarray(P_out), P_ref, atol=1e-9)
        np.testing.assert_allclose(np.asarray(x_out), x_ref, atol=1e-9)


def test_flight_time_parity(world):
    rng = np.random.default_rng(2)
    for _ in range(30):
        a = rng.uniform(0, 40, 3)
        b = rng.uniform(0, 40, 3)
        ref = ref_actions.compute_flight_time(a, b, UAV)
        ours = float(flight_times(jnp.asarray(a), jnp.asarray(b), 2.0, 2.0))
        np.testing.assert_allclose(ours, ref, rtol=1e-12)
    # vectorized variant
    acts = rng.uniform(0, 40, (20, 3))
    prev = rng.uniform(0, 40, 3)
    ref = ref_actions.compute_flight_times(acts, prev, UAV)
    ours = np.asarray(flight_times(jnp.asarray(acts), jnp.asarray(prev)[None], 2.0, 2.0))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_reward_and_mask_parity(world):
    rng = np.random.default_rng(3)
    P0 = np.asarray(gp_prior_cov(world.cfg))
    mean = rng.uniform(0, 1, 100)
    msk_ref = ref_rewards.compute_adaptive_msk(mean.reshape(10, 10), P0, 0.4, 0.0)
    msk_ours = np.asarray(adaptive_mask(jnp.asarray(mean), jnp.asarray(np.diag(P0)), 0.4, 0.0))
    np.testing.assert_allclose(msk_ours, msk_ref.astype(float))

    P1 = P0 * 0.9
    prev = np.array([2.0, 2.0, 14.0])
    act = np.array([6.0, 10.0, 8.0])
    ref = ref_rewards.compute_reward(P0, P1, prev, act, UAV, msk_ref)
    gain = np.sum((np.diag(P0) - np.diag(P1))[msk_ref])
    cost = float(flight_times(jnp.asarray(act), jnp.asarray(prev), 2.0, 2.0))
    np.testing.assert_allclose(gain / (cost + 1.0), ref, rtol=1e-12)


def test_metrics_parity(world):
    rng = np.random.default_rng(4)
    gt = rng.uniform(0, 1, (10, 10))
    est = np.clip(gt + rng.normal(0, 0.1, (10, 10)), 0, 1)
    P = np.asarray(gp_prior_cov(world.cfg))
    msk = gt.flatten() >= 0.4

    pairs = [
        (ref_metrics.root_mean_squared_error(gt, est),
         our_metrics.rmse(jnp.asarray(gt.ravel()), jnp.asarray(est.ravel()))),
        (ref_metrics.root_mean_squared_error(gt, est, msk),
         our_metrics.rmse(jnp.asarray(gt.ravel()), jnp.asarray(est.ravel()), jnp.asarray(msk))),
        (ref_metrics.weighted_root_mean_squared_error(gt, est),
         our_metrics.weighted_rmse(jnp.asarray(gt.ravel()), jnp.asarray(est.ravel()))),
        (ref_metrics.mean_log_loss(gt, est, P),
         our_metrics.mean_log_loss(jnp.asarray(gt.ravel()), jnp.asarray(est.ravel()), jnp.asarray(np.diag(P)))),
        (ref_metrics.weighted_mean_log_loss(gt, est, P),
         our_metrics.weighted_mean_log_loss(jnp.asarray(gt.ravel()), jnp.asarray(est.ravel()), jnp.asarray(np.diag(P)))),
        (ref_metrics.map_uncertainty(P, msk),
         our_metrics.map_uncertainty(jnp.asarray(np.diag(P)), jnp.asarray(msk))),
        (ref_metrics.map_uncertainty_difference(P, msk),
         our_metrics.map_uncertainty_difference(jnp.asarray(np.diag(P)), jnp.asarray(msk))),
    ]
    for ref_v, our_v in pairs:
        np.testing.assert_allclose(float(our_v), ref_v, rtol=1e-10)


def test_greedy_step_parity(world):
    """The sweep's argmax action matches a reference-style per-action
    evaluation (simulate_prediction_step semantics, cov-only updates)."""
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains

    t = world.table
    P0 = np.asarray(gp_prior_cov(world.cfg))
    prev = np.array([2.0, 2.0, 14.0])

    # reference-style loop: per action, Cholesky KF cov update + reward
    rewards_ref = np.zeros(t.num_actions)
    for a in range(t.num_actions):
        m = int(t.num_meas[a])
        _, P1 = RefMapping.kalman_filter_update(
            P0, t.H[a, :m], np.diag(t.R_diag[a, :m]), cov_only=True
        )
        gain = np.trace(P0) - np.trace(P1)
        cost = ref_actions.compute_flight_time(t.lattice.xyz[a], prev, UAV)
        rewards_ref[a] = gain / (cost + 1.0)

    gains = np.asarray(
        kf_sweep_gains(jnp.asarray(P0), jnp.asarray(t.H), jnp.asarray(t.R_diag))
    )
    costs = np.asarray(
        flight_times(jnp.asarray(t.lattice.xyz), jnp.asarray(prev)[None], 2.0, 2.0)
    )
    rewards_ours = gains / (costs + 1.0)
    np.testing.assert_allclose(rewards_ours, rewards_ref, rtol=1e-7)
    assert int(np.argmax(rewards_ours)) == int(np.argmax(rewards_ref))


def test_full_greedy_trajectory_parity(world, canonical_cfg):
    """End-to-end action-sequence parity: a full greedy mission driven by
    the REFERENCE update loop (kalman_filter_update + per-action
    simulate-prediction argmax, reference planning/greedy_mission.py:73-110)
    vs our batched planner, with identical deterministic (noiseless)
    observations z = Z·gt.  Action sequences must match exactly."""
    import jax

    from ipp_rl_tpu.config.schema import MissionConfig
    from ipp_rl_tpu.env.world import IPPWorld
    from ipp_rl_tpu.planners import GreedyPlanner
    from ipp_rl_tpu.ops.kalman import kf_sweep_gains

    t = world.table
    A_count = t.num_actions
    n = 100
    budget0 = canonical_cfg.constraints.budget

    # deterministic world: zero measurement noise
    noiseless = IPPWorld(canonical_cfg, dtype=jnp.float64)
    noiseless.noise_std = jnp.zeros_like(noiseless.noise_std)

    rng = np.random.default_rng(9)
    gt = rng.uniform(0, 1, n)

    # ---- reference-style numpy driver -------------------------------
    P = np.asarray(gp_prior_cov(canonical_cfg))
    mean = 0.5 * np.ones(n)
    pos = np.array([2.0, 2.0, 14.0])
    budget = budget0
    ref_actions_seq = []
    max_steps = 12
    for _ in range(max_steps):
        costs = ref_actions.compute_flight_times(t.lattice.xyz, pos, UAV)
        rewards = np.full(A_count, -np.inf)
        adaptive = gt_mask = None
        msk = ref_rewards.compute_adaptive_msk(
            mean.reshape(10, 10), P, 0.4, 0.0
        )
        for a in range(A_count):
            if not (0 < costs[a] <= budget):
                continue
            m = int(t.num_meas[a])
            _, P1 = RefMapping.kalman_filter_update(
                P, t.H[a, :m], np.diag(t.R_diag[a, :m]), cov_only=True
            )
            gain = np.sum((np.diag(P) - np.diag(P1))[msk])
            rewards[a] = gain / (costs[a] + 1.0)
        a_star = int(np.argmax(rewards))
        if not np.isfinite(rewards[a_star]):
            break
        m = int(t.num_meas[a_star])
        z = t.Z[a_star, :m] @ gt  # noiseless block means
        x1, P1 = RefMapping.kalman_filter_update(
            P,
            t.H[a_star, :m],
            np.diag(t.R_diag[a_star, :m]),
            grid_mean=mean.reshape(10, 10),
            observation=z,
        )
        mean, P = x1, P1
        budget -= costs[a_star]
        pos = t.lattice.xyz[a_star]
        ref_actions_seq.append(a_star)

    # ---- our batched planner on the same world ----------------------
    state = noiseless.init_state(
        jax.random.key(0), 1, ground_truth=jnp.asarray(gt)
    )
    planner = GreedyPlanner(noiseless, MissionConfig(type="greedy"))
    res = planner.run(jax.random.key(1), 1, max_steps=max_steps, init_state=state)
    ours = res.waypoints[0]
    ours = ours[~np.isnan(ours[:, 0])]

    ref_xyz = t.lattice.xyz[ref_actions_seq]
    assert len(ours) == len(ref_xyz), (
        f"step counts differ: ours {len(ours)} vs ref {len(ref_xyz)}"
    )
    np.testing.assert_allclose(ours, ref_xyz, atol=1e-9)
    # final belief parity as well
    np.testing.assert_allclose(
        np.asarray(res.final_state.mean[0]), mean.flatten(), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res.final_state.cov[0]), P, atol=1e-7
    )


def test_fov_feature_plane_parity_off_lattice(ref_stack, canonical_cfg):
    """use_fov_input footprint at ARBITRARY (off-lattice) positions vs
    the reference's generate_fov_feature_plane (features.py:35-44),
    including its linspace[:-1] last-row/col-drop quirk and the arena's
    [0, 0, 10] start."""
    import types

    import planning.common.features as ref_features

    from ipp_rl_tpu.planners.zero.features import fov_cell_mask

    grid, _, camera = ref_stack
    mapping_shim = types.SimpleNamespace(grid_map=grid, sensor=camera)
    rng = np.random.default_rng(3)
    positions = [np.array([0.0, 0.0, 10.0])] + [
        np.array([rng.uniform(0, 40), rng.uniform(0, 40), rng.uniform(8, 14)])
        for _ in range(20)
    ]
    for pos in positions:
        ref_plane = ref_features.generate_fov_feature_plane(mapping_shim, pos)
        mask = np.asarray(fov_cell_mask(canonical_cfg, jnp.asarray(pos)))
        ours_plane = np.outer(mask, mask).astype(float)
        np.testing.assert_array_equal(ours_plane, ref_plane, err_msg=str(pos))


def test_gcb_rollout_softmax_distribution_parity(world, canonical_cfg):
    """The GCB rollout samples from softmax(benefit-to-cost) over the
    available actions (reference mcts_mission.py:192-209); our
    categorical logits produce the same distribution."""
    from ipp_rl_tpu.config.schema import MissionConfig
    from ipp_rl_tpu.planners import ClassicMCTSPlanner

    t = world.table
    n = 100
    P = np.asarray(gp_prior_cov(canonical_cfg))
    mean = 0.5 * np.ones(n)
    pos = np.array([10.0, 14.0, 8.0])
    budget = 60.0
    radius = 10.0

    # ---- reference gcb_policy math (mcts_mission.py:167-209) --------
    ft = ref_actions.compute_flight_times(t.lattice.xyz, pos, UAV)
    dist = np.linalg.norm(t.lattice.xyz - pos, ord=2, axis=1)
    avail_ref = (ft > 0) & (ft <= budget) & (dist < radius)
    msk = ref_rewards.compute_adaptive_msk(mean.reshape(10, 10), P, 0.4, 0.0)
    benefits = []
    for a in np.nonzero(avail_ref)[0]:
        m = int(t.num_meas[a])
        _, P1 = RefMapping.kalman_filter_update(
            P, t.H[a, :m], np.diag(t.R_diag[a, :m]), cov_only=True
        )
        benefits.append(
            ref_rewards.compute_reward(
                P, P1, pos, t.lattice.xyz[a], UAV, msk
            )
        )
    benefits = np.asarray(benefits)
    probs_ref = np.exp(benefits) / np.exp(benefits).sum()

    # ---- our categorical logits -------------------------------------
    mc = MissionConfig(
        type="mcts", use_gcb_rollout=True, horizontal_spacing=radius,
        episode_horizon=5,
    )
    planner = ClassicMCTSPlanner(world, mc)
    Pj, meanj, posj = jnp.asarray(P), jnp.asarray(mean), jnp.asarray(pos)
    rewards, _ = planner._sweep_rewards(Pj, posj, meanj)
    avail = np.asarray(planner._available(posj, jnp.asarray(budget)))
    np.testing.assert_array_equal(avail, avail_ref)
    logits = np.asarray(jnp.where(jnp.asarray(avail), rewards, -jnp.inf))
    ours = np.exp(logits[avail]) / np.exp(logits[avail]).sum()
    np.testing.assert_allclose(ours, probs_ref, rtol=1e-8)
