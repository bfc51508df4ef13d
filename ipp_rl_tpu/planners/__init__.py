from ipp_rl_tpu.planners.base import MissionResult, Planner, sweep_rewards  # noqa: F401
from ipp_rl_tpu.planners.greedy import GreedyPlanner  # noqa: F401
from ipp_rl_tpu.planners.static_paths import (  # noqa: F401
    LawnmowerPlanner,
    RandomContinuousPlanner,
    RandomDiscretePlanner,
    SpiralPlanner,
)
from ipp_rl_tpu.planners.mcts_classic import ClassicMCTSPlanner  # noqa: F401
from ipp_rl_tpu.planners.cmaes import CMAESPlanner  # noqa: F401
