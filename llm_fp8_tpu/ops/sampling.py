"""Token sampling: greedy, temperature, top-k, top-p.

Semantics of the reference's sampling stack
(``flash_attn/utils/generation.py:45-97``: ``modify_logits_for_top_k_filtering``
/ ``top_p`` / ``sample``): top-k filter first, then top-p over the surviving
mass, then categorical sample at the given temperature. Everything is
shape-static and jit-safe so the decode step compiles once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample", "greedy", "filtered_logits", "filtered_probs"]

_NEG = -jnp.inf


def greedy(logits: jax.Array) -> jax.Array:
    """Argmax over the last axis; ``logits [B, V] -> [B] int32``."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    # Keep the k largest per row (k is static under jit).
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, _NEG, logits)


def _top_p_mask(logits: jax.Array, p: float) -> jax.Array:
    # Remove the smallest-probability tail whose cumulative mass exceeds 1-p,
    # matching the reference's "sort ascending, drop while cumsum <= 1-p"
    # formulation (generation.py:68-78) which always keeps the top token.
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    drop_sorted = cum <= (1.0 - p)
    # Threshold: the largest logit that is still dropped.
    thresh = jnp.max(
        jnp.where(drop_sorted, sorted_logits, _NEG), axis=-1, keepdims=True
    )
    return jnp.where(logits <= thresh, _NEG, logits)


def filtered_logits(
    logits: jax.Array,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Apply the reference's filter pipeline, return masked/scaled logits.

    Order (generation.py:88-93): top-k filter, then temperature scaling, then
    nucleus (top-p) over the tempered distribution. The softmax of the result
    is the exact distribution :func:`sample` draws from — speculative
    decoding's rejection test needs this distribution explicitly for both the
    draft and the target model.
    """
    logits = logits.astype(jnp.float32)
    if top_k > 0:
        # Reference clamps top_k to the vocab size (generation.py:56).
        logits = _top_k_mask(logits, min(top_k, logits.shape[-1]))
    if temperature != 1.0:
        logits = logits / temperature
    if 0.0 < top_p < 1.0:
        logits = _top_p_mask(logits, top_p)
    return logits


def filtered_probs(
    logits: jax.Array,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Softmax of :func:`filtered_logits` — the effective sampling distribution."""
    return jax.nn.softmax(
        filtered_logits(
            logits, temperature=temperature, top_k=top_k, top_p=top_p
        ),
        axis=-1,
    )


def sample(
    logits: jax.Array,
    key: jax.Array,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 0.0,
) -> jax.Array:
    """Sample token ids from ``logits [B, V]``.

    ``temperature == 0`` or both filters trivial+temp 1 with top_k==1 reduce
    to greedy. ``top_k=0`` disables the k filter; ``top_p=0`` disables the p
    filter (reference semantics: ``top_p ∈ (0, 1]`` active).
    """
    if temperature == 0.0 or top_k == 1:
        return greedy(logits)
    return jax.random.categorical(
        key,
        filtered_logits(
            logits, temperature=temperature, top_k=top_k, top_p=top_p
        ),
        axis=-1,
    ).astype(jnp.int32)
