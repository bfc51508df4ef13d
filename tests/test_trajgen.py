"""Native min-snap trajectory generator tests (C++ via ctypes)."""

import numpy as np
import pytest

from ipp_rl_tpu.trajgen import MavTrajectoryGenerator


@pytest.fixture(scope="module")
def gen():
    return MavTrajectoryGenerator(max_v=2.0, max_a=2.0)


WAYPOINTS = np.array(
    [
        [2.0, 2.0, 14.0],
        [10.0, 6.0, 8.0],
        [18.0, 18.0, 14.0],
        [30.0, 10.0, 8.0],
    ]
)


def test_samples_shape_and_endpoints(gen):
    traj = gen.plan_uav_trajectory(WAYPOINTS, sampling_time=0.5)
    assert traj.ndim == 2 and traj.shape[1] == 3
    assert len(traj) > 4
    np.testing.assert_allclose(traj[0], WAYPOINTS[0], atol=1e-6)
    np.testing.assert_allclose(traj[-1], WAYPOINTS[-1], atol=0.2)


def test_passes_through_waypoints(gen):
    dt = 0.05
    traj = gen.plan_uav_trajectory(WAYPOINTS, sampling_time=dt)
    for wp in WAYPOINTS:
        d = np.linalg.norm(traj - wp[None, :], axis=1).min()
        assert d < 0.25, f"trajectory misses waypoint {wp} by {d:.3f} m"


def test_velocity_acceleration_limits(gen):
    dt = 0.02
    traj = gen.plan_uav_trajectory(WAYPOINTS, sampling_time=dt)
    v = np.diff(traj, axis=0) / dt
    a = np.diff(v, axis=0) / dt
    vmax = np.linalg.norm(v, axis=1).max()
    amax = np.linalg.norm(a, axis=1).max()
    assert vmax <= 2.0 * 1.15, f"vmax {vmax:.2f} exceeds limit"
    assert amax <= 2.0 * 1.3, f"amax {amax:.2f} exceeds limit"


def test_smoothness(gen):
    """Min-snap trajectories have continuous acceleration: finite-difference
    jerk must be bounded (no impulses at segment boundaries)."""
    dt = 0.02
    traj = gen.plan_uav_trajectory(WAYPOINTS, sampling_time=dt)
    j = np.diff(traj, n=3, axis=0) / dt**3
    assert np.linalg.norm(j, axis=1).max() < 50.0


def test_rest_to_rest(gen):
    dt = 0.02
    traj = gen.plan_uav_trajectory(WAYPOINTS, sampling_time=dt)
    v_start = np.linalg.norm(traj[1] - traj[0]) / dt
    v_end = np.linalg.norm(traj[-1] - traj[-2]) / dt
    assert v_start < 0.3
    assert v_end < 1.0  # final sample may fall short of total time


def test_two_waypoints(gen):
    wps = WAYPOINTS[:2]
    traj = gen.plan_uav_trajectory(wps, sampling_time=0.5)
    np.testing.assert_allclose(traj[0], wps[0], atol=1e-6)
    np.testing.assert_allclose(traj[-1], wps[1], atol=0.3)


def test_single_waypoint_passthrough(gen):
    wps = WAYPOINTS[:1]
    traj = gen.plan_uav_trajectory(wps, sampling_time=0.5)
    np.testing.assert_allclose(traj, wps)


def test_total_time_reasonable(gen):
    t = gen.total_flight_time(WAYPOINTS)
    # straight-line distance / max_v is a lower bound
    d = np.sum(np.linalg.norm(np.diff(WAYPOINTS, axis=0), axis=1))
    assert t >= d / 2.0 * 0.9
    assert t < 10 * d  # not absurdly slow
