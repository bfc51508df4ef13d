from ipp_rl_tpu.models.networks import (  # noqa: F401
    PolicyNetwork,
    PolicyValueNetwork,
    ValueNetwork,
    build_network,
)
