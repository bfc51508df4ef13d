from ipp_rl_tpu.planners.zero.features import (  # noqa: F401
    EpisodeHistory,
    feature_planes,
    init_history,
    push_history,
)
from ipp_rl_tpu.planners.zero.mcts import Tree, ZeroMCTS  # noqa: F401
from ipp_rl_tpu.planners.zero.selfplay import SelfPlay, Trajectory  # noqa: F401
from ipp_rl_tpu.planners.zero.replay import (  # noqa: F401
    PrioritizedReplayBuffer,
    ReplayBuffer,
)
from ipp_rl_tpu.planners.zero.learn import ZeroLearner  # noqa: F401
from ipp_rl_tpu.planners.zero.mission import ZeroPlanner  # noqa: F401
