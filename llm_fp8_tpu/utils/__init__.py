"""Utilities: device monitoring, metric sinks, benchmark helpers."""
from .monitor import device_memory_stats, MemoryProfiler, StepTimer, estimate_memory_gb
from .metrics import MetricLogger
from .benchmark import benchmark_forward, benchmark_backward, benchmark_fwd_bwd, benchmark_memory

__all__ = [
    "device_memory_stats", "MemoryProfiler", "StepTimer", "estimate_memory_gb",
    "MetricLogger",
    "benchmark_forward", "benchmark_backward", "benchmark_fwd_bwd", "benchmark_memory",
]
