"""Rotary position embeddings (RoPE), including the Llama-3 frequency rescale.

Equivalent of TE's ``RotaryPositionEmbedding`` precomputed to
``max_position_embeddings`` (reference ``te_llama.py:65-66``) and the
``csrc/rotary`` CUDA apply kernel (SURVEY.md §2c #45). Uses the HF
"half-rotation" convention (rotate_half), which is what Llama/Qwen checkpoints
are trained with.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "rope_frequencies", "rope_cos_sin", "apply_rope",
    "rope_attention_scaling",
]


def _yarn_mscale(scale: float, mscale: float = 1.0) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def rope_attention_scaling(scaling: Optional[dict]) -> float:
    """YaRN's post-scale on cos/sin (HF ``attention_scaling``,
    ``modeling_rope_utils.py::_compute_yarn_parameters``). 1.0 for every
    other rope type. With both ``mscale`` and ``mscale_all_dim`` set
    (DeepSeek-V2's convention) the two magnitudes cancel per HF."""
    if scaling is None:
        return 1.0
    rope_type = scaling.get("rope_type", scaling.get("type", "llama3"))
    if rope_type != "yarn":
        return 1.0
    af = scaling.get("attention_factor")
    if af is not None:
        return float(af)
    factor = float(scaling["factor"])
    mscale = scaling.get("mscale")
    mscale_all = scaling.get("mscale_all_dim")
    if mscale and mscale_all:
        return _yarn_mscale(factor, mscale) / _yarn_mscale(factor, mscale_all)
    return _yarn_mscale(factor)


def _yarn_frequencies(head_dim: int, theta: float, s: dict) -> jax.Array:
    """YaRN (NTK-by-parts) inverse frequencies — numerics match HF
    ``_compute_yarn_parameters``: per-dim linear blend between the
    interpolated (``inv_freq / factor``) and extrapolated (unscaled) bands,
    with the blend range set by ``beta_fast``/``beta_slow`` rotations at the
    original context length."""
    factor = float(s["factor"])
    beta_fast = float(s.get("beta_fast") or 32)
    beta_slow = float(s.get("beta_slow") or 1)
    orig = s.get("original_max_position_embeddings")
    if orig is None:
        raise ValueError(
            "yarn rope_scaling requires original_max_position_embeddings"
        )
    orig = float(orig)

    def corr_dim(num_rot: float) -> float:
        return (head_dim * math.log(orig / (num_rot * 2 * math.pi))
                ) / (2 * math.log(theta))

    low, high = corr_dim(beta_fast), corr_dim(beta_slow)
    if s.get("truncate", True):
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0.0), min(high, head_dim - 1.0)
    if low == high:
        high += 0.001  # HF's singularity guard
    pos_freqs = theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    )
    extrap = 1.0 / pos_freqs
    interp = 1.0 / (factor * pos_freqs)
    ramp = jnp.clip(
        (jnp.arange(head_dim // 2, dtype=jnp.float32) - low) / (high - low),
        0.0, 1.0,
    )
    extrap_w = 1.0 - ramp
    return interp * (1.0 - extrap_w) + extrap * extrap_w


def rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    scaling: Optional[dict] = None,
) -> jax.Array:
    """Inverse frequencies ``[head_dim//2]`` with optional scaling.

    ``scaling`` follows the HF ``rope_scaling`` dict; supported
    ``rope_type``: ``"llama3"`` (the default when the key is absent, for
    back-compat), ``"yarn"`` (DeepSeek-V2 / Qwen long-context — pair with
    :func:`rope_attention_scaling` on the cos/sin tables), ``"linear"``,
    and ``"default"`` (no rescale).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if scaling is None:
        return inv_freq
    rope_type = scaling.get("rope_type", scaling.get("type", "llama3"))
    if rope_type == "default":
        return inv_freq
    if rope_type == "yarn":
        return _yarn_frequencies(head_dim, theta, scaling)
    if rope_type == "linear":
        return inv_freq / float(scaling["factor"])
    if rope_type != "llama3":
        raise ValueError(f"unsupported rope_type {rope_type!r}")
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
    positions: jax.Array, inv_freq: jax.Array,
    scaling: Optional[dict] = None,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables ``[..., head_dim//2]`` for integer positions, fp32.

    Pass the model's ``rope_scaling`` dict so YaRN's ``attention_scaling``
    multiplies the tables (HF applies it to ``freqs_cis``); a no-op for
    every other rope type."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    f = rope_attention_scaling(scaling)
    if f != 1.0:
        cos, sin = cos * f, sin * f
    return cos, sin


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
