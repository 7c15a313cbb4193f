"""LayerNorm (mean-subtracting, with bias) — for the GPT-2/BERT families.

The Llama/Qwen path uses RMSNorm (``ops/rmsnorm.py``); classic architectures
in the zoo (reference ``flash_attn/models/{gpt,bert,...}.py``) need full
LayerNorm. Reductions in fp32, XLA fuses the composition.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["layernorm"]


def layernorm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        dtype
    )
