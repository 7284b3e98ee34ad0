from lsfa_tpu.utils.logger import create_logger  # noqa: F401
from lsfa_tpu.utils.profiler import Speedometer, PhaseTimer  # noqa: F401
