"""Shared kernel-side helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pad_to_multiple", "dropout_keep_mask"]


def pad_to_multiple(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    """Zero-pad ``axis`` up to the next multiple (no-op when aligned)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


_GOLD = 0x9E3779B9  # 2^32 / phi — Weyl increment


def _fmix32(x: jax.Array) -> jax.Array:
    """murmur3 32-bit finalizer: full-avalanche integer mix (uint32)."""
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


def dropout_keep_mask(
    seed: jax.Array,  # scalar int32
    bh: jax.Array,  # scalar int32: flattened (batch, head) index
    q_pos: jax.Array,  # int32 absolute q row index (any broadcastable shape)
    k_pos: jax.Array,  # int32 absolute k col index
    rate: float,
) -> jax.Array:
    """Counter-based dropout keep mask (True = keep), purely functional.

    The reference regenerates its dropout mask in the backward kernel from a
    saved Philox state (``csrc/flash_attn/src/dropout.h``); the TPU
    equivalent is this stateless counter hash of the absolute score
    coordinates — the same (seed, b·h, i, j) always produces the same bit in
    forward, backward, and in the pure-jnp golden, on every backend (Pallas
    interpret mode included, which the hardware PRNG primitive is not).
    """
    h0 = _fmix32(jnp.uint32(seed) + jnp.uint32(bh) * jnp.uint32(_GOLD))
    ctr = (
        q_pos.astype(jnp.uint32) * jnp.uint32(_GOLD)
        + k_pos.astype(jnp.uint32)
    )
    bits = _fmix32(h0 ^ ctr)
    threshold = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return bits >= threshold
