"""Shared kernel-side helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pad_to_multiple"]


def pad_to_multiple(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    """Zero-pad ``axis`` up to the next multiple (no-op when aligned)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)
