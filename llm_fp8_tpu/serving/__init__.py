"""Serving: continuous-batching FP8 inference engine."""
from .engine import Engine, EngineConfig, SamplingParams, Request
from .block_table import BlockAllocator, SequenceTable, native_available
from .speculative import SpeculativeDecoder
from .spec_engine import SpecEngine

__all__ = [
    "Engine", "EngineConfig", "SamplingParams", "Request",
    "BlockAllocator", "SequenceTable", "native_available",
    "SpeculativeDecoder", "SpecEngine",
]
