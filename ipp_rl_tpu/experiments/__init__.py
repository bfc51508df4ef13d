from ipp_rl_tpu.experiments.experiment import Experiment, create_planner  # noqa: F401
