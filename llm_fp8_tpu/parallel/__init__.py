"""GSPMD distribution: mesh + sharding rules (replaces DDP/FSDP/TP wrappers)."""
from .mesh import (
    MeshConfig, make_mesh, AXIS_DP, AXIS_FSDP, AXIS_PP, AXIS_CP, AXIS_EP,
    AXIS_TP,
)
from .pipeline import pipeline_apply, forward_pipelined, stage_params
from .ring_attention import ring_attention
from .sharding import (
    param_specs,
    shard_params,
    batch_spec,
    activation_spec,
    kv_cache_spec,
    constrain,
)

__all__ = [
    "MeshConfig", "make_mesh",
    "AXIS_DP", "AXIS_FSDP", "AXIS_PP", "AXIS_CP", "AXIS_EP", "AXIS_TP",
    "param_specs", "shard_params", "batch_spec", "activation_spec",
    "kv_cache_spec", "constrain", "ring_attention",
    "pipeline_apply", "forward_pipelined", "stage_params",
]
