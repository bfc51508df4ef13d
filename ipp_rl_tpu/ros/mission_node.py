"""Robot deployment node (reference planning/ipp_mission_node.py:22-73).

The reference runs a rospy node that builds the planning stack, creates
waypoints, and publishes a latched ``WaypointsTrajectory`` message
(max_v / max_a / sampling_time + Points) on ``plan/waypoints`` for the
downstream C++ trajectory sampler + MPC controller.

This module keeps that surface with pluggable transports:

  * with rospy installed, ``IPPMissionNode.run_ros()`` publishes the
    same latched topic;
  * without ROS (this environment), ``run()`` returns the message and
    optionally writes it as JSON — the min-snap sampling the reference
    delegated to an external catkin node is done natively here
    (trajgen.MavTrajectoryGenerator), so the full plan→smooth→sample
    pipeline works standalone.
"""

from __future__ import annotations

import json
import logging
from dataclasses import asdict, dataclass, field
from typing import List, Optional

import jax
import numpy as np

from ipp_rl_tpu.config.schema import Config, MissionConfig
from ipp_rl_tpu.env.world import IPPWorld
from ipp_rl_tpu.experiments.experiment import create_planner

logger = logging.getLogger(__name__)


@dataclass
class WaypointsTrajectory:
    """Message parity with the reference's WaypointsTrajectory
    (reference planning/ipp_mission_node.py:53-69)."""

    max_v: float
    max_a: float
    sampling_time: float
    points: List[List[float]] = field(default_factory=list)
    sampled_trajectory: Optional[List[List[float]]] = None

    def to_json(self) -> str:
        return json.dumps(asdict(self))


class IPPMissionNode:
    """Builds the full stack and produces the waypoint trajectory for
    the robot (reference ipp_mission_node.py:32-69)."""

    def __init__(
        self,
        cfg: Config,
        mission_cfg: Optional[MissionConfig] = None,
        seed: int = 0,
        smooth: bool = True,
    ):
        self.cfg = cfg
        self.mission_cfg = mission_cfg or cfg.missions[0]
        self.world = IPPWorld(cfg)
        self.planner = create_planner(self.world, self.mission_cfg)
        self.seed = seed
        self.smooth = smooth

    def create_waypoints(self, max_steps: Optional[int] = None) -> np.ndarray:
        res = self.planner.run(
            jax.random.key(self.seed), batch_size=1, max_steps=max_steps
        )
        wp = res.waypoints[0]
        return wp[~np.isnan(wp[:, 0])]

    def build_message(self, max_steps: Optional[int] = None) -> WaypointsTrajectory:
        uav = self.cfg.uav
        wps = self.create_waypoints(max_steps)
        msg = WaypointsTrajectory(
            max_v=uav.max_v,
            max_a=uav.max_a,
            sampling_time=uav.sampling_time,
            points=wps.tolist(),
        )
        if self.smooth and len(wps) >= 2:
            from ipp_rl_tpu.trajgen import MavTrajectoryGenerator

            gen = MavTrajectoryGenerator(uav.max_v, uav.max_a)
            traj = gen.plan_uav_trajectory(wps, sampling_time=uav.sampling_time)
            msg.sampled_trajectory = traj.tolist()
        return msg

    def run(
        self, output_path: Optional[str] = None, max_steps: Optional[int] = None
    ) -> WaypointsTrajectory:
        msg = self.build_message(max_steps)
        if output_path:
            with open(output_path, "w") as f:
                f.write(msg.to_json())
            logger.info("wrote waypoint trajectory to %s", output_path)
        return msg

    def run_ros(self, topic: str = "plan/waypoints", max_steps: Optional[int] = None):
        """Publish on a latched ROS topic (requires rospy; reference
        ipp_mission_node.py:29, 69)."""
        try:
            import rospy
            from geometry_msgs.msg import Point
            from std_msgs.msg import String
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "rospy not available — use run() for the standalone transport"
            ) from e
        rospy.init_node("ipp_mission")  # pragma: no cover
        pub = rospy.Publisher(topic, String, queue_size=1, latch=True)
        msg = self.build_message(max_steps)
        pub.publish(String(data=msg.to_json()))
        rospy.spin()


def main():  # pragma: no cover — thin CLI (exercised via docker-compose)
    """CLI entry (the reference's roslaunch ipp_planning mission.launch,
    reference planning/launch/mission.launch:1-8): build the stack from
    CONFIG_FILE_PATH, plan, and publish — over ROS when rospy is
    importable, else to the PLAN_OUTPUT JSON file."""
    import os

    from ipp_rl_tpu.config.schema import load_config
    from ipp_rl_tpu.utils import setup_logger

    setup_logger(os.environ.get("LOG_DIR", "logs"))
    cfg = load_config(
        os.environ.get("CONFIG_FILE_PATH", "ipp_rl_tpu/config/example.yaml")
    )
    node = IPPMissionNode(cfg)
    try:
        import rospy  # noqa: F401

        node.run_ros()
    except ImportError:
        node.run(output_path=os.environ.get("PLAN_OUTPUT", "waypoints.json"))


if __name__ == "__main__":  # pragma: no cover
    main()
