from .metrics import ScalarLogger
from .timing import PhaseTimer
from .profiling import trace_to

__all__ = ["ScalarLogger", "PhaseTimer", "trace_to"]
