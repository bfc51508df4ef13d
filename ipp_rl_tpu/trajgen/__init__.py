from ipp_rl_tpu.trajgen.planner import MavTrajectoryGenerator, build_library  # noqa: F401
