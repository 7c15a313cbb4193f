"""Split-KV attention: partial-attention chunks + log-sum-exp combine.

Parity with the reference's split-KV machinery — ``num_splits`` partial
attention with the LSE-weighted combine kernel
(``csrc/flash_attn/flash_api.cpp:1202+``, ``hopper/flash_fwd_combine.cu``,
``flash_attn_combine`` in ``hopper/flash_attn_interface.py``): the KV axis is
cut into chunks, each chunk attends independently (parallel work), and the
partials merge with the same online-softmax correction flash applies across
tiles. The identical math powers cross-chip context parallelism
(``parallel/ring_attention.py``); here it is exposed intra-chip for
long-context decode where one sequence's KV scan limits parallelism.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["auto_num_splits", "combine_partials", "split_kv_attention"]


def auto_num_splits(
    batch: int,
    kv_heads: int,
    cache_len: int,
    *,
    num_cores: Optional[int] = None,
    min_chunk: int = 1024,
    max_splits: int = 8,
) -> int:
    """Choose ``num_splits`` for decode attention from occupancy.

    TPU translation of the reference's C++ split heuristic
    (``csrc/flash_attn/flash_api.cpp`` ``num_splits_heuristic`` /
    ``hopper/heuristics.h``): split only when the natural work grid
    (``batch × kv_heads`` independent (b, h) programs) cannot occupy every
    compute core, and never cut chunks below ``min_chunk`` tokens (the
    LSE-combine pass costs one extra read+write of the partials; amortizing
    it needs long chunks — measured table in docs/PERF_NOTES.md).

    On single-TensorCore chips (v5e) this returns 1 for any batch: the
    Pallas/XLA grid executes sequentially on one core, so intra-chip
    split-KV adds combine traffic without adding parallelism — measured as
    a pure loss (docs/PERF_NOTES.md §split-KV). On megacore parts (v4/v5p:
    2 TensorCores) batch-1 long-cache decode gets 2 splits.
    """
    if num_cores is None:
        try:
            num_cores = jax.devices()[0].num_cores
        except Exception:
            num_cores = 1
    grid = max(1, batch * kv_heads)
    if grid >= num_cores or cache_len < 2 * min_chunk:
        return 1
    want = -(-num_cores // grid)  # ceil: fill every core
    return int(min(want, cache_len // min_chunk, max_splits))


def combine_partials(
    outs: jax.Array,  # [N, B, Sq, Hq, D] partial outputs (each normalized)
    lses: jax.Array,  # [N, B, Sq, Hq] partial log-sum-exps
) -> jax.Array:
    """Merge N partial attentions over disjoint KV chunks.

    ``out = Σ_i softmax-weight_i · out_i`` with ``weight_i =
    exp(lse_i - logsumexp_i(lse))``; -inf LSEs (empty chunks) contribute 0.
    """
    m = jnp.max(lses, axis=0, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.where(jnp.isfinite(lses), jnp.exp(lses - m_safe), 0.0)  # [N,...]
    denom = jnp.sum(w, axis=0)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    num = jnp.sum(w[..., None] * outs.astype(jnp.float32), axis=0)
    return (num / denom[..., None]).astype(outs.dtype)


def split_kv_attention(
    q: jax.Array,  # [B, Sq, Hq, D]
    k: jax.Array,  # [B, Sk, Hk, D]
    v: jax.Array,
    *,
    num_splits: int,
    causal: bool = True,
    scale: Optional[float] = None,
    q_offset: int | jax.Array = 0,
    kv_lens: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention computed as ``num_splits`` independent KV-chunk passes.

    Numerically equivalent to one full pass; the chunks expose parallelism
    along the KV axis (the reference's ``num_splits`` decode heuristic,
    ``hopper/flash_api.cpp:504``).
    """
    from llm_fp8_tpu.kernels.flash_attention import _flash_fwd_call

    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    assert Sk % num_splits == 0, (Sk, num_splits)
    chunk = Sk // num_splits
    scale = scale if scale is not None else D ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    if kv_lens is None:
        kv_lens = jnp.full((B,), Sk, jnp.int32)

    outs, lses = [], []
    for i in range(num_splits):
        k_i = k[:, i * chunk : (i + 1) * chunk]
        v_i = v[:, i * chunk : (i + 1) * chunk]
        # Local coordinates: queries keep absolute positions via the offset;
        # this chunk's keys start at absolute i*chunk.
        off_i = q_offset - i * chunk
        lens_i = jnp.clip(kv_lens - i * chunk, 0, chunk)
        o_i, lse_i = _flash_fwd_call(
            q, k_i, v_i, off_i, lens_i,
            causal=causal, window=None, softcap=None, scale=scale,
            block_q=min(128, max(8, Sq)), block_k=min(128, chunk),
            interpret=interpret,
        )
        outs.append(o_i.astype(jnp.float32))
        lses.append(lse_i[:, :, 0, :Sq].transpose(0, 2, 1))  # [B, Sq, Hq]
    return combine_partials(
        jnp.stack(outs), jnp.stack(lses)
    ).astype(q.dtype)
