"""Variable-length batch utilities: padding removal and sequence packing.

Parity with the reference's ``bert_padding.py`` (``unpad_input`` /
``pad_input`` / ``IndexFirstAxis``, ``flash_attn/bert_padding.py:8-224``) and
its varlen kernels' ``cu_seqlens`` convention — reshaped for TPU, where
dynamic shapes are hostile: instead of ragged concatenation, sequences pack
into a fixed-size token stream with *segment ids*, the GSPMD-friendly varlen
representation (the flash kernel masks across segment boundaries via
position resets).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["unpad_input", "pad_input", "pack_sequences", "cu_seqlens"]


def unpad_input(x: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gather real tokens to the front of a flattened stream.

    ``x [B, S, ...]``, ``mask [B, S]`` (1 = real). Returns
    ``(packed [B*S, ...], indices [B*S], n_tokens)`` — packed keeps the full
    static size (TPU needs static shapes); real tokens occupy the first
    ``n_tokens`` rows, the tail repeats row 0 (callers mask by count).
    """
    B, S = mask.shape
    flat = x.reshape(B * S, *x.shape[2:])
    m = mask.reshape(-1).astype(bool)
    # Stable order: real tokens first, original order preserved.
    order = jnp.argsort(~m, stable=True)
    return flat[order], order, jnp.sum(m)


def pad_input(packed: jax.Array, indices: jax.Array, batch: int, seqlen: int) -> jax.Array:
    """Inverse of :func:`unpad_input`: scatter rows back to [B, S, ...]."""
    flat = jnp.zeros((batch * seqlen, *packed.shape[1:]), packed.dtype)
    flat = flat.at[indices].set(packed)
    return flat.reshape(batch, seqlen, *packed.shape[1:])


def cu_seqlens(lens: Sequence[int]) -> np.ndarray:
    """Cumulative sequence-length offsets (the FA varlen convention)."""
    return np.concatenate([[0], np.cumsum(np.asarray(lens, np.int32))]).astype(
        np.int32
    )


def pack_sequences(
    seqs: Sequence[np.ndarray], total_len: int, pad_id: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack token sequences into one fixed-length stream with segment ids.

    Returns ``(tokens [total_len], segment_ids [total_len], positions
    [total_len])``. ``segment_ids`` are 1-based; 0 marks padding. Sequences
    that don't fit are dropped (greedy first-fit in order).
    """
    tokens = np.full((total_len,), pad_id, np.int32)
    seg = np.zeros((total_len,), np.int32)
    pos = np.zeros((total_len,), np.int32)
    cursor = 0
    sid = 1
    for s in seqs:
        n = len(s)
        if cursor + n > total_len:
            break
        tokens[cursor : cursor + n] = s
        seg[cursor : cursor + n] = sid
        pos[cursor : cursor + n] = np.arange(n)
        cursor += n
        sid += 1
    return tokens, seg, pos
