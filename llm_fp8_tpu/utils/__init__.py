"""Utilities: device monitoring, metric sinks, benchmark helpers."""
from .monitor import device_memory_stats, MemoryProfiler, StepTimer, estimate_memory_gb
from .metrics import MetricLogger

__all__ = [
    "device_memory_stats", "MemoryProfiler", "StepTimer", "estimate_memory_gb",
    "MetricLogger",
]
