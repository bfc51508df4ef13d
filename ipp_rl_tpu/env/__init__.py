from ipp_rl_tpu.env.fields import generate_ground_truth  # noqa: F401
from ipp_rl_tpu.env.world import BeliefState, IPPWorld  # noqa: F401
