from .profiling import StepTimer, trace_context, device_memory_stats
from .logging import TagLogger

__all__ = ["StepTimer", "trace_context", "device_memory_stats", "TagLogger"]
