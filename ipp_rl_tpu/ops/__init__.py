from ipp_rl_tpu.ops.geometry import (  # noqa: F401
    ActionLattice,
    build_action_lattice,
    flight_times,
    travel_costs,
)
from ipp_rl_tpu.ops.sensor_model import ActionTable, build_action_table  # noqa: F401
from ipp_rl_tpu.ops.kalman import (  # noqa: F401
    kf_gain_factor,
    kf_sweep_gains,
    kf_update,
)
