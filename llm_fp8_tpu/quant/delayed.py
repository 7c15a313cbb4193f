"""Delayed scaling as functional state.

In the reference, delayed scaling lives in mutable TE module buffers
(``amax_history`` etc.) silently updated inside ``fp8_autocast``
(``train_fp8.py:159-165``: ``amax_history_len=16, amax_compute_algo="max",
interval=1``). The TPU-native equivalent is explicit: the amax history is a
pytree leaf of the train state; the step function observes the current step's
amaxes and returns an updated history. Under ``jit`` over a sharded mesh the
``jnp.max`` reductions become XLA ``all-reduce-max`` over the mesh
automatically — no host sync, no collective boilerplate.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .formats import Format
from .qtensor import compute_scale

__all__ = ["ScaleState", "init_scale_state", "observe_amax", "current_scale"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScaleState:
    """Rolling amax history for one quantized tensor class.

    ``history[0]`` is the most recent observation. ``scale`` is the scale to
    *use this step*, derived from history before the step ran (that is what
    makes the scaling "delayed").
    """

    history: jax.Array  # [amax_history_len] f32
    scale: jax.Array  # scalar f32


def init_scale_state(history_len: int = 16) -> ScaleState:
    return ScaleState(
        history=jnp.zeros((history_len,), jnp.float32),
        scale=jnp.ones((), jnp.float32),
    )


def observe_amax(
    state: ScaleState,
    amax: jax.Array,
    fmt: Format,
    *,
    amax_compute: str = "max",
    margin: int = 0,
) -> ScaleState:
    """Record this step's amax and derive the next step's scale."""
    history = jnp.roll(state.history, 1).at[0].set(jnp.asarray(amax, jnp.float32))
    if amax_compute == "max":
        eff = jnp.max(history)
    elif amax_compute == "most_recent":
        eff = history[0]
    else:
        raise ValueError(f"unknown amax_compute {amax_compute!r}")
    return ScaleState(history=history, scale=compute_scale(eff, fmt, margin))


def current_scale(x: jax.Array, fmt: Format, margin: int = 0) -> jax.Array:
    """Just-in-time ("current") scaling: scale from this tensor's own amax.

    On TPU the amax reduction fuses into the producing op, so current scaling
    costs ~nothing extra — it is the default for backward-pass tensors where
    threading delayed state through ``custom_vjp`` would complicate the API.
    """
    return compute_scale(jnp.max(jnp.abs(x.astype(jnp.float32))), fmt, margin)
