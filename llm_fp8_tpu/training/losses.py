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

__all__ = ["causal_lm_loss", "chunked_causal_lm_loss", "IGNORE_INDEX"]

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


def chunked_causal_lm_loss(
    hidden: jax.Array,  # [B, S, D] final-norm output (pre lm_head)
    lm_weight: jax.Array,  # [D, V]
    tokens: jax.Array,  # [B, S] int
    mask: Optional[jax.Array] = None,
    *,
    num_chunks: int = 8,
    z_loss: float = 0.0,
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """:func:`causal_lm_loss` fused with the lm_head projection, chunked.

    The memory-bound step in large-vocab training is the logits tensor:
    [B, S, V] fp32 at Llama's 128k vocab is ~2 GB live through the whole
    backward, plus its cotangent. This computes the identical loss without
    ever materializing it: rows are processed in ``num_chunks`` chunks under
    a ``lax.scan`` whose body is ``jax.checkpoint``-ed, so the forward keeps
    only scalar accumulators and the backward recomputes one chunk of logits
    at a time (one extra [rows, V] matmul per chunk — the same
    recompute-the-cheap-part trade the reference's fused xentropy kernel
    makes, ``csrc/xentropy``, ``flash_attn/losses/cross_entropy.py:9-66``).

    Gradients flow to both ``hidden`` and ``lm_weight`` (the weight cotangent
    accumulates across chunks inside the scan), so tied-embedding models can
    pass ``params["embed"].T``.
    """
    B, S, D = hidden.shape
    h = hidden[:, :-1].reshape(-1, D)
    labels = tokens[:, 1:].reshape(-1)
    valid = labels != IGNORE_INDEX
    if mask is not None:
        valid &= mask[:, 1:].reshape(-1).astype(bool)
    labels = jnp.where(valid, labels, 0)

    n_rows = h.shape[0]
    pad = (-n_rows) % num_chunks
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    rows = (n_rows + pad) // num_chunks
    h = h.reshape(num_chunks, rows, D)
    labels = labels.reshape(num_chunks, rows)
    valid = valid.reshape(num_chunks, rows)

    def body(acc, xs):
        hc, lc, vc = xs
        lg = jnp.dot(
            hc, lm_weight.astype(hc.dtype), preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        lse = jax.nn.logsumexp(lg, axis=-1)
        picked = jnp.take_along_axis(lg, lc[:, None], axis=-1)[:, 0]
        nll = lse - picked
        if label_smoothing > 0.0:
            smooth = lse - jnp.mean(lg, axis=-1)
            nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
        if z_loss > 0.0:
            nll = nll + z_loss * jnp.square(lse)
        return acc + jnp.sum(jnp.where(vc, nll, 0.0)), None

    total, _ = jax.lax.scan(
        jax.checkpoint(body), jnp.float32(0.0), (h, labels, valid)
    )
    n = jnp.maximum(jnp.sum(valid), 1)
    return total / n, n
