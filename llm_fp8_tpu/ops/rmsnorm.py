"""RMSNorm.

Equivalent of the RMSNorm TE fuses into ``LayerNormMLP`` / ``MultiheadAttention``
(reference ``te_llama.py:45-63``, normalization="RMSNorm") and of the CUDA
``csrc/layer_norm`` extension (SURVEY.md §2c #44). On TPU the reduction +
rescale fuses into neighbouring ops under XLA; a Pallas fused
rmsnorm(+residual) kernel lives in ``llm_fp8_tpu.kernels.rmsnorm`` for the
cases profiles show XLA missing the fusion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rmsnorm", "rmsnorm_residual"]


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """``x * rsqrt(mean(x^2) + eps) * weight``, reduction in fp32."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def rmsnorm_residual(
    x: jax.Array, residual: jax.Array, weight: jax.Array, eps: float = 1e-5
):
    """Fused residual-add + RMSNorm: returns ``(norm(x+res), x+res)``.

    Mirrors the dropout-add-layernorm fusion of the reference's layer_norm
    extension (``csrc/layer_norm``, pre-norm residual path).
    """
    s = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rmsnorm(s, weight, eps), s
