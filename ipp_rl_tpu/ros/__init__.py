from ipp_rl_tpu.ros.mission_node import IPPMissionNode, WaypointsTrajectory  # noqa: F401
