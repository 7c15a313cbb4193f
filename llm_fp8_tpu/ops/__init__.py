"""Ops: golden reference implementations + dispatch to Pallas kernels."""
from .rmsnorm import rmsnorm, rmsnorm_residual
from .rotary import rope_frequencies, rope_cos_sin, apply_rope
from .attention import attention, attention_ref
from .sampling import sample, greedy

__all__ = [
    "rmsnorm", "rmsnorm_residual",
    "rope_frequencies", "rope_cos_sin", "apply_rope",
    "attention", "attention_ref",
    "sample", "greedy",
]
