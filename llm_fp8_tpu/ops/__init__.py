"""Ops: golden reference implementations + dispatch to Pallas kernels."""
from .rmsnorm import rmsnorm, rmsnorm_residual
from .rotary import rope_frequencies, rope_cos_sin, apply_rope
from .attention import attention, attention_ref, decode_attention
from .sampling import sample, greedy
from .varlen import unpad_input, pad_input, pack_sequences, cu_seqlens

__all__ = [
    "rmsnorm", "rmsnorm_residual",
    "rope_frequencies", "rope_cos_sin", "apply_rope",
    "attention", "attention_ref", "decode_attention",
    "sample", "greedy",
    "unpad_input", "pad_input", "pack_sequences", "cu_seqlens",
]
