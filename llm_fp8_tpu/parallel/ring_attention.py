"""Ring attention: context parallelism over the ICI mesh — trainable.

The long-context scaling lever the reference *lacks* (SURVEY.md §5: no ring /
context-parallel / Ulysses anywhere; its levers stop at sliding windows and
split-KV). Design per the TPU playbook: K/V chunks rotate around the mesh
axis ring via ``jax.lax.ppermute`` while each chip runs the local flash
kernel on the chunk in front of it; partial outputs merge with the same
online-softmax correction flash uses across tiles — just across chips.

Differentiable end-to-end (``jax.custom_vjp``): the backward is a second
ring. Each chip keeps its query chunk, ``do``, the *final* combined LSE and
output; K/V chunks rotate again, and because the saved LSE is the global
softmax normalizer, each per-chunk call of the flash backward kernels
(``kernels/flash_attention_bwd.py``) yields exact partial gradients that
simply sum — dQ accumulates locally, dK/dV accumulators ride the ring with
their chunk and take one final hop home.

Feature surface (round 3): ``window`` (sliding-window attention — Mistral /
Gemma-2 families), ``softcap`` (Gemma-2 logit caps), and ragged ``kv_lens``
(absolute per-sequence valid KV lengths — ragged batches) all ride the ring:
the local kernel already evaluates its masks in *absolute* coordinates via
the per-chunk relative ``q_offset``, so the window/causal compares are
correct chunk-by-chunk; ragged lengths localize as
``clip(kv_lens - src*Sk, 0, Sk)``; window additionally widens the dead-chunk
skip (a chunk entirely behind every query's window contributes nothing).

Use inside ``shard_map`` with q, k, v sharded along the *sequence* axis:

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="cp"),
        mesh=mesh,
        in_specs=(P(None, "cp", None, None),) * 3,
        out_specs=P(None, "cp", None, None),
        check_vma=False,
    )(q, k, v)

Causality across chunks is handled by giving the local flash kernel a
*relative* q_offset: queries in chunk ``i`` start at absolute position
``i * Cq``, the rotating KV chunk from source chip ``s`` starts at
``s * Ck`` — the kernel only ever sees local coordinates plus that offset.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from llm_fp8_tpu.kernels.flash_attention import _flash_fwd_call
from llm_fp8_tpu.kernels.flash_attention_bwd import flash_attention_bwd
from llm_fp8_tpu.kernels._common import pad_to_multiple

__all__ = ["ring_attention"]


def _blocks(Sq, Sk):
    return min(128, max(Sq, 8)), min(128, Sk)


def _chunk_schedule(step, idx, Sq, Sk, n, causal, window):
    """(src chip, q_offset scalar, dead flag) for the chunk at ``step``."""
    src = (idx - step) % n  # which chip's chunk we currently hold
    # Relative offset so the kernel's causal/window compares work in local
    # coordinates: q_abs = idx*Sq + i, k_abs = src*Sk + j.
    q_offset = idx * Sq - src * Sk
    if causal:
        # Chunks entirely in the future (all k_abs > all q_abs) are dead:
        # still run the kernel for shape reasons under jit, mask kv_lens=0.
        dead = src * Sk > idx * Sq + Sq - 1
    else:
        dead = jnp.asarray(False)
    if window is not None:
        # Sliding window: every query attends only to k_abs > q_abs - W.
        # A chunk whose last key is at or behind the *youngest* query's
        # window edge is entirely dead.
        dead = dead | (src * Sk + Sk - 1 <= idx * Sq - window)
    return src, q_offset, dead


def _local_lens(kv_lens, src, Sk, dead, B):
    """Per-batch valid length of the current chunk in local coordinates."""
    if kv_lens is None:
        lens = jnp.full((B,), Sk, jnp.int32)
    else:
        lens = jnp.clip(kv_lens - src * Sk, 0, Sk).astype(jnp.int32)
    return jnp.where(dead, 0, lens)


def _ring_forward(q, k, v, kv_lens, axis_name, causal, scale, window,
                  softcap, interpret):
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    block_q, block_k = _blocks(Sq, Sk)

    # Running combine state (numerically the cross-tile online softmax,
    # applied across chips): m_run = max of partial LSEs, acc = weighted
    # partial outputs, l_run = weight normalizer.
    m_run = jnp.full((B, Sq, Hq), -jnp.inf, jnp.float32)
    l_run = jnp.zeros((B, Sq, Hq), jnp.float32)
    acc = jnp.zeros((B, Sq, Hq, D), jnp.float32)

    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        src, q_offset, dead = _chunk_schedule(
            step, idx, Sq, Sk, n, causal, window)
        lens = _local_lens(kv_lens, src, Sk, dead, B)

        out_p, lse_p = _flash_fwd_call(
            q, k_blk, v_blk,
            jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,)), lens,
            causal=causal, window=window, softcap=softcap, scale=scale,
            block_q=block_q, block_k=block_k,
            interpret=interpret,
        )
        # lse: [B, Hq, 8, Sq_pad] -> [B, Sq, Hq]
        lse_p = lse_p[:, :, 0, :Sq].transpose(0, 2, 1)
        out_p = out_p.astype(jnp.float32)

        m_new = jnp.maximum(m_run, lse_p)
        # Guard -inf - -inf (both empty so far).
        safe = jnp.isfinite(m_new)
        alpha = jnp.where(safe, jnp.exp(m_run - jnp.where(safe, m_new, 0.0)), 0.0)
        beta = jnp.where(
            jnp.isfinite(lse_p),
            jnp.exp(lse_p - jnp.where(safe, m_new, 0.0)),
            0.0,
        )
        acc = acc * alpha[..., None] + out_p * beta[..., None]
        l_run = l_run * alpha + beta
        m_run = m_new

        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    l_inv = jnp.where(l_run == 0.0, 1.0, 1.0 / l_run)
    out = (acc * l_inv[..., None]).astype(q.dtype)
    # Global LSE of the full (ring-wide) softmax — the backward's normalizer.
    lse = m_run + jnp.log(jnp.where(l_run == 0.0, 1.0, l_run))
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _ring_attention(q, k, v, kv_lens, axis_name, causal, scale, window,
                    softcap, interpret):
    out, _ = _ring_forward(q, k, v, kv_lens, axis_name, causal, scale,
                           window, softcap, interpret)
    return out


def _ring_fwd_rule(q, k, v, kv_lens, axis_name, causal, scale, window,
                   softcap, interpret):
    out, lse = _ring_forward(q, k, v, kv_lens, axis_name, causal, scale,
                             window, softcap, interpret)
    return out, (q, k, v, kv_lens, out, lse)


def _ring_bwd_rule(axis_name, causal, scale, window, softcap, interpret,
                   res, do):
    import numpy as np

    q, k, v, kv_lens, out, lse = res
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    block_q, block_k = _blocks(Sq, Sk)

    # The bwd kernels take the forward kernel's LSE layout: [B, Hq, 8, Sq_p]
    # (8 identical sublanes, padded to block_q; padded rows contribute ds=0
    # because do and di are zero there).
    lse8 = pad_to_multiple(lse.transpose(0, 2, 1), 2, block_q)
    lse8 = jnp.broadcast_to(lse8[:, :, None, :], (B, Hq, 8, lse8.shape[-1]))

    dq = jnp.zeros(q.shape, jnp.float32)
    dk_blk = jnp.zeros(k.shape, jnp.float32)
    dv_blk = jnp.zeros(v.shape, jnp.float32)
    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        src, q_offset, dead = _chunk_schedule(
            step, idx, Sq, Sk, n, causal, window)
        lens = _local_lens(kv_lens, src, Sk, dead, B)

        dq_p, dk_p, dv_p = flash_attention_bwd(
            q, k_blk, v_blk, out, lse8, do,
            causal=causal, window=window, softcap=softcap, scale=scale,
            q_offset=jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,)),
            kv_lens=lens, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )
        dq = dq + dq_p.astype(jnp.float32)
        dk_blk = dk_blk + dk_p.astype(jnp.float32)
        dv_blk = dv_blk + dv_p.astype(jnp.float32)

        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
            dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)

    # After n-1 rotations the chunk that originated on chip c sits on chip
    # c-1 — its accumulated gradient takes one final hop home.
    dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
    dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)
    kv_lens_ct = (np.zeros(kv_lens.shape, jax.dtypes.float0)
                  if kv_lens is not None else None)
    return (dq.astype(q.dtype), dk_blk.astype(k.dtype),
            dv_blk.astype(v.dtype), kv_lens_ct)


_ring_attention.defvjp(_ring_fwd_rule, _ring_bwd_rule)


def ring_attention(
    q: jax.Array,  # [B, Sq_local, Hq, D] — this chip's query chunk
    k: jax.Array,  # [B, Sk_local, Hk, D] — this chip's KV chunk
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    kv_lens: Optional[jax.Array] = None,  # [B] absolute valid KV lengths
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Context-parallel flash attention over a mesh-axis ring.

    Differentiable (ring backward over the flash bwd kernels); use under
    ``jax.grad`` for long-context *training*, or via ``forward(...,
    cp_axis=...)`` in the model stack. ``window``/``softcap`` serve the
    Mistral / Gemma-2 families under CP; ``kv_lens`` serves ragged batches
    (absolute lengths — each chunk masks its local slice).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    return _ring_attention(q, k, v, kv_lens, axis_name, causal, scale,
                           window, softcap, interpret)
