"""Rotary position embeddings (RoPE), including the Llama-3 frequency rescale.

Equivalent of TE's ``RotaryPositionEmbedding`` precomputed to
``max_position_embeddings`` (reference ``te_llama.py:65-66``) and the
``csrc/rotary`` CUDA apply kernel (SURVEY.md §2c #45). Uses the HF
"half-rotation" convention (rotate_half), which is what Llama/Qwen checkpoints
are trained with.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rope_frequencies", "rope_cos_sin", "apply_rope"]


def rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    scaling: Optional[dict] = None,
) -> jax.Array:
    """Inverse frequencies ``[head_dim//2]`` with optional llama3 scaling.

    ``scaling`` follows the HF ``rope_scaling`` dict for ``rope_type="llama3"``:
    ``{factor, low_freq_factor, high_freq_factor, original_max_position_embeddings}``.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is None:
        return inv_freq
    factor = float(scaling["factor"])
    low = float(scaling.get("low_freq_factor", 1.0))
    high = float(scaling.get("high_freq_factor", 4.0))
    orig = float(scaling.get("original_max_position_embeddings", 8192))
    wavelen = 2.0 * jnp.pi / inv_freq
    low_wavelen = orig / low
    high_wavelen = orig / high
    # Long wavelengths fully rescaled; short kept; middle smoothly blended.
    smooth = (orig / wavelen - low) / (high - low)
    scaled = jnp.where(
        wavelen > low_wavelen,
        inv_freq / factor,
        jnp.where(
            wavelen < high_wavelen,
            inv_freq,
            (1.0 - smooth) * inv_freq / factor + smooth * inv_freq,
        ),
    )
    return scaled


def rope_cos_sin(
    positions: jax.Array, inv_freq: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables ``[..., head_dim//2]`` for integer positions, fp32."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply RoPE in the HF rotate-half convention.

    ``x``: ``[..., seq, heads, head_dim]``; ``cos/sin``: ``[..., seq, head_dim//2]``
    (broadcast over the heads axis).
    """
    dtype = x.dtype
    half = x.shape[-1] // 2
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    c = jnp.expand_dims(cos, -2)  # broadcast over heads
    s = jnp.expand_dims(sin, -2)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(dtype)
