from ipp_rl_tpu.planners.zero.features import (  # noqa: F401
    EpisodeHistory,
    feature_planes,
    init_history,
    push_history,
)
