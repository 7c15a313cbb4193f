"""Serving: continuous-batching FP8 inference engine."""
from .engine import Engine, EngineConfig, SamplingParams, Request

__all__ = ["Engine", "EngineConfig", "SamplingParams", "Request"]
