from .profiling import StepTimer, trace_context, device_memory_stats
from .logging import TagLogger
from .trace import TraceRecorder

__all__ = [
    "StepTimer",
    "trace_context",
    "device_memory_stats",
    "TagLogger",
    "TraceRecorder",
]
