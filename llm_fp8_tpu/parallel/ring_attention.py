"""Ring attention: context parallelism over the ICI mesh.

The long-context scaling lever the reference *lacks* (SURVEY.md §5: no ring /
context-parallel / Ulysses anywhere; its levers stop at sliding windows and
split-KV). Design per the TPU playbook: K/V chunks rotate around the mesh
axis ring via ``jax.lax.ppermute`` while each chip runs the local flash
kernel on the chunk in front of it; partial outputs merge with the same
online-softmax correction flash uses across tiles — just across chips.

Use inside ``shard_map`` with q, k, v sharded along the *sequence* axis:

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="tp"),
        mesh=mesh,
        in_specs=(P(None, "tp", None, None),) * 3,
        out_specs=P(None, "tp", None, None),
        check_vma=False,
    )(q, k, v)

Causality across chunks is handled by giving the local flash kernel a
*relative* q_offset: queries in chunk ``i`` start at absolute position
``i * Cq``, the rotating KV chunk from source chip ``s`` starts at
``s * Ck`` — the kernel only ever sees local coordinates plus that offset.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llm_fp8_tpu.kernels.flash_attention import _flash_fwd_call

__all__ = ["ring_attention"]


def ring_attention(
    q: jax.Array,  # [B, Sq_local, Hq, D] — this chip's query chunk
    k: jax.Array,  # [B, Sk_local, Hk, D] — this chip's KV chunk
    v: jax.Array,
    axis_name: str,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    scale = scale if scale is not None else D ** -0.5
    kv_lens = jnp.full((B,), Sk, jnp.int32)

    # Running combine state (numerically the cross-tile online softmax,
    # applied across chips): m_run = max of partial LSEs, acc = weighted
    # partial outputs, l_run = weight normalizer.
    m_run = jnp.full((B, Sq, Hq), -jnp.inf, jnp.float32)
    l_run = jnp.zeros((B, Sq, Hq), jnp.float32)
    acc = jnp.zeros((B, Sq, Hq, D), jnp.float32)

    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        src = (idx - step) % n  # which chip's chunk we currently hold
        # Relative offset so the kernel's causal compare works in local
        # coordinates: q_abs = idx*Sq + i, k_abs = src*Sk + j.
        q_offset = idx * Sq - src * Sk

        if causal:
            # Skip chunks entirely in the future (all k_abs > all q_abs):
            # src*Sk > idx*Sq + Sq - 1. Still must run the kernel for shape
            # reasons under jit — mask via kv_lens=0 instead.
            dead = src * Sk > idx * Sq + Sq - 1
            lens = jnp.where(dead, 0, kv_lens)
        else:
            lens = kv_lens

        out_p, lse_p = _flash_fwd_call(
            q, k_blk, v_blk,
            jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,)), lens,
            causal=causal, window=None, softcap=None, scale=scale,
            block_q=min(128, max(Sq, 8)), block_k=min(128, Sk),
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
    return (acc * l_inv[..., None]).astype(q.dtype)
