"""Closed-loop robot deployment with a simulated UAV.

The reference closes its planning loop through third-party catkin
stacks: the latched ``WaypointsTrajectory`` goes to a C++ trajectory
sampler and an MPC controller flying a Gazebo UAV whose camera images
feed the mapper (reference docker-compose.yaml:3-123 — Gazebo + MPC
services; planning/ipp_mission_node.py:22-73 publishes the plan).  This
module provides the native equivalent so the L8 loop runs standalone:

  plan (one replan step from the current belief)
    → publish the segment as a ``WaypointsTrajectory`` message
    → FLY it: min-snap polynomial through the segment
      (trajgen.MavTrajectoryGenerator — the same role as the reference's
      mav_trajectory_generation sampler + MPC tracking), sampled at the
      UAV ``sampling_time``
    → MEASURE at the arrival pose with the mission's sensor model
      (lattice H/R for discrete planners; the continuous-position
      camera model with off-lattice FoV projection for waypoint
      planners like CMA-ES)
    → commit the Kalman update and replan from the new belief.

``ClosedLoopMission.run()`` executes that cycle until the budget is
exhausted and returns the full flight log (per-cycle waypoints, sampled
trajectories, budgets, masked tr(P) / RMSE curves).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ipp_rl_tpu.config.schema import Config, MissionConfig
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.experiments.experiment import create_planner
from ipp_rl_tpu.ros.mission_node import WaypointsTrajectory

logger = logging.getLogger(__name__)


@dataclass
class FlightLog:
    """Per-cycle record of the closed loop."""

    waypoints: List[List[float]] = field(default_factory=list)
    poses: List[List[float]] = field(default_factory=list)  # actual arrival
    trajectories: List[List[List[float]]] = field(default_factory=list)
    budgets: List[float] = field(default_factory=list)
    uncertainty: List[float] = field(default_factory=list)
    rmse: List[float] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


class SimulatedUAV:
    """Kinematic UAV that flies a waypoint segment on a min-snap
    trajectory (the role of the reference's sampler + MPC + Gazebo
    dynamics).

    ``tracking_noise_std`` > 0 models the MPC/dynamics tracking error
    the reference's Gazebo loop exhibits (reference
    docker-compose.yaml:88-123): the arrival pose is the planned
    min-snap endpoint plus bounded Gaussian noise (clipped at 2σ and to
    the flight envelope) instead of exact polynomial tracking — the
    mapper then measures at the *actual* pose and the adaptive replanner
    has to absorb the discrepancy."""

    def __init__(
        self,
        uav_cfg,
        start: np.ndarray,
        tracking_noise_std: float = 0.0,
        bounds=None,
        rng: Optional[np.random.Generator] = None,
    ):
        from ipp_rl_tpu.trajgen import MavTrajectoryGenerator

        self.gen = MavTrajectoryGenerator(uav_cfg.max_v, uav_cfg.max_a)
        self.sampling_time = uav_cfg.sampling_time
        self.position = np.asarray(start, float)
        self.tracking_noise_std = float(tracking_noise_std)
        self.bounds = bounds  # (lo (3,), hi (3,)) position clamp
        self.rng = rng or np.random.default_rng(0)

    def fly(self, waypoint: np.ndarray):
        """Fly from the current position to ``waypoint``; returns the
        sampled trajectory (T, 3) and updates the position to the
        (possibly noise-perturbed) arrival pose."""
        wps = np.stack([self.position, np.asarray(waypoint, float)])
        traj = self.gen.plan_uav_trajectory(
            wps, sampling_time=self.sampling_time
        )
        traj = np.asarray(traj, float).reshape(-1, traj.shape[-1])[:, :3]
        pose = np.asarray(waypoint, float)
        if self.tracking_noise_std > 0:
            s = self.tracking_noise_std
            noise = np.clip(self.rng.normal(0.0, s, 3), -2.0 * s, 2.0 * s)
            pose = pose + noise
            if self.bounds is not None:
                pose = np.clip(pose, self.bounds[0], self.bounds[1])
        self.position = pose
        return traj


class ClosedLoopMission:
    """Adaptive replanning against a simulated robot: each cycle plans
    ONE step from the current belief, flies it, measures at the arrival
    pose with the mission's sensor model, and commits the update."""

    def __init__(
        self,
        cfg: Config,
        mission_cfg: Optional[MissionConfig] = None,
        seed: int = 0,
        tracking_noise_std: float = 0.0,
    ):
        self.cfg = cfg
        self.mission_cfg = mission_cfg or cfg.missions[0]
        self.world = IPPWorld(cfg)
        self.planner = create_planner(self.world, self.mission_cfg)
        self.seed = seed
        self.tracking_noise_std = float(tracking_noise_std)

    def run(self, max_cycles: int = 64) -> FlightLog:
        world, cfg = self.world, self.cfg
        key = jax.random.key(self.seed)
        k_init, key = jax.random.split(key)
        state = world.init_state(k_init, 1)
        env, con = cfg.environment, cfg.constraints
        bounds = (
            np.array([0.0, 0.0, con.min_altitude]),
            np.array([env.extent_x, env.extent_y, con.max_altitude]),
        )
        uav = SimulatedUAV(
            cfg.uav,
            np.asarray(state.pos[0]),
            tracking_noise_std=self.tracking_noise_std,
            bounds=bounds,
            rng=np.random.default_rng(self.seed),
        )
        log = FlightLog()

        def record(state):
            m = world.evaluate(state)
            log.budgets.append(float(state.budget[0]))
            log.uncertainty.append(float(np.asarray(m["uncertainty"])[0]))
            log.rmse.append(float(np.asarray(m["rmse"])[0]))

        record(state)
        for cycle in range(max_cycles):
            if float(state.budget[0]) < cfg.environment.resolution:
                break
            key, k_plan = jax.random.split(key)
            # one replan step from the current belief; the planner
            # commits the measurement at its chosen waypoint (the same
            # pose the simulated UAV arrives at below)
            res = self.planner.run(
                k_plan, batch_size=1, max_steps=1, init_state=state
            )
            wp = res.waypoints[0, 0]
            if np.any(np.isnan(wp)):
                break
            # publish + fly the segment (message parity with the
            # reference's latched WaypointsTrajectory: the full planned
            # segment, start first — ADVICE r4)
            start = uav.position.copy()
            traj = uav.fly(wp)
            msg = WaypointsTrajectory(
                max_v=cfg.uav.max_v,
                max_a=cfg.uav.max_a,
                sampling_time=cfg.uav.sampling_time,
                points=[start.tolist(), [float(x) for x in wp]],
                sampled_trajectory=traj.tolist(),
            )
            logger.debug("cycle %d: %s", cycle, msg.to_json()[:120])
            if uav.tracking_noise_std > 0:
                # the UAV did NOT arrive exactly at the planned waypoint:
                # discard the planner's hypothetical commit and measure at
                # the ACTUAL pose with the continuous camera model — the
                # next replan starts from the belief the robot really has
                key, k_meas = jax.random.split(key)
                state = world.step_position(
                    state,
                    jnp.asarray(uav.position, world.dtype)[None],
                    k_meas,
                )
            else:
                state = res.final_state
            log.waypoints.append([float(x) for x in wp])
            log.poses.append([float(x) for x in uav.position])
            log.trajectories.append(traj.tolist())
            record(state)
        return log


def main():  # pragma: no cover — thin CLI (exercised via docker-compose)
    """Run the closed loop standalone and write the flight log (the
    native replacement for the reference's rotors_simulation +
    mav_control_rw services, reference docker-compose.yaml:88-123)."""
    import os

    from ipp_rl_tpu.config.schema import load_config
    from ipp_rl_tpu.utils import setup_logger

    setup_logger(os.environ.get("LOG_DIR", "logs"))
    cfg = load_config(
        os.environ.get("CONFIG_FILE_PATH", "ipp_rl_tpu/config/example.yaml")
    )
    mission = ClosedLoopMission(
        cfg,
        tracking_noise_std=float(os.environ.get("TRACKING_NOISE_STD", "0")),
    )
    log = mission.run(max_cycles=int(os.environ.get("MAX_CYCLES", "64")))
    out = os.environ.get("FLIGHT_LOG_OUTPUT", "flight_log.json")
    with open(out, "w") as f:
        f.write(log.to_json())
    logger.info(
        "closed loop done: %d cycles, final masked tr(P) %.2f -> %s",
        len(log.waypoints), log.uncertainty[-1], out,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
