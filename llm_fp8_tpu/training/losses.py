"""Causal LM loss: next-token cross entropy with padding mask.

Parity targets: the reference's token-weighted eval loss → perplexity
(``train_fp8.py:316-356``) and the vendored fused ``CrossEntropyLoss`` with
z-loss + label smoothing + logits-sharding support
(``flash_attn/losses/cross_entropy.py:9-66``). Under GSPMD the TP-sharded
logits case needs no special handling — XLA partitions the log-softmax
reduction; z-loss and smoothing are kept as explicit knobs.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["causal_lm_loss", "IGNORE_INDEX"]

IGNORE_INDEX = -100  # HF convention used by the reference's collator


def causal_lm_loss(
    logits: jax.Array,  # [B, S, V] f32
    tokens: jax.Array,  # [B, S] int
    mask: Optional[jax.Array] = None,  # [B, S] attention/pad mask (1 = real)
    *,
    z_loss: float = 0.0,
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Next-token CE. Returns ``(mean_loss, total_tokens)``.

    Labels are ``tokens`` shifted left (position t predicts token t+1); the
    final position and padded positions are excluded. ``total_tokens`` is the
    count the mean is over — callers accumulate ``loss * tokens`` for the
    token-weighted corpus perplexity the reference reports
    (``train_fp8.py:341-350``).
    """
    B, S, V = logits.shape
    labels = tokens[:, 1:]
    lg = logits[:, :-1].astype(jnp.float32)

    valid = labels != IGNORE_INDEX
    if mask is not None:
        valid &= mask[:, 1:].astype(bool)
    safe_labels = jnp.where(valid, labels, 0)

    lse = jax.nn.logsumexp(lg, axis=-1)
    picked = jnp.take_along_axis(lg, safe_labels[..., None], axis=-1)[..., 0]
    nll = lse - picked
    if label_smoothing > 0.0:
        # Smooth toward uniform: (1-eps)*nll + eps*mean over classes.
        smooth = lse - jnp.mean(lg, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if z_loss > 0.0:
        nll = nll + z_loss * jnp.square(lse)

    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / n, n
