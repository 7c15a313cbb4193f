"""Pallas TPU kernels: the framework's native tier.

Each kernel has a golden jnp reference in ``llm_fp8_tpu.ops`` and is tested
against it (the reference repo's ``attention_ref`` idiom, SURVEY.md §4).
"""
from .flash_attention import flash_attention
from .quant_matmul import quant_matmul, qdot_fused
from .paged_attention import paged_attention

__all__ = ["flash_attention", "quant_matmul", "qdot_fused", "paged_attention"]
