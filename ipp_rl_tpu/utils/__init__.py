from ipp_rl_tpu.utils.logging_utils import setup_logger  # noqa: F401
from ipp_rl_tpu.utils.notifications import Notifier  # noqa: F401
