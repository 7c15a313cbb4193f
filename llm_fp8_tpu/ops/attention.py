"""Attention: golden reference implementation + dispatch.

This is the framework's equivalent of the reference's pure-PyTorch
``attention_ref`` used as the golden model for every flash kernel
(``flash-attention-2.8.0/tests/test_util.py:185``): an einsum/softmax
composition in fp32 that every Pallas kernel is tested against. The public
``attention()`` entry dispatches to the Pallas flash kernel on TPU and falls
back to this reference everywhere else.

Feature parity targets (reference ``flash_attn_interface.py:1135+``):
GQA/MQA (kv heads broadcast), causal masking, sliding window, soft-capping,
padding masks via explicit lengths.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["attention_ref", "attention", "default_alibi_slopes",
           "alibi_slopes_list"]


def alibi_slopes_list(nheads: int) -> list:
    """Standard ALiBi slope schedule (Press et al.) as plain Python floats:
    head i of n gets ``2^(-8(i+1)/n)`` for power-of-two n, with the published
    interleaving rule for non-power-of-two head counts. Matches the slopes
    HF/Baichuan/BTLM-style alibi models bake in. Python floats so the decode
    kernels can take them as *static* arguments (compile-time constants — no
    SMEM reads in the hot loop).
    """
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(nheads).is_integer():
        return pow2_slopes(nheads)
    closest = 2 ** math.floor(math.log2(nheads))
    return (
        pow2_slopes(closest)
        + pow2_slopes(2 * closest)[0::2][: nheads - closest]
    )


def default_alibi_slopes(nheads: int) -> jax.Array:
    """:func:`alibi_slopes_list` as an f32 array (the flash-kernel form)."""
    return jnp.asarray(alibi_slopes_list(nheads), jnp.float32)


def _build_mask(
    q_len: int,
    k_len: int,
    causal: bool,
    window: Optional[int],
    q_offset,
    kv_lens: Optional[jax.Array],
    batch: int,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    attention_chunk: Optional[int] = None,
    kv_start: Optional[jax.Array] = None,
):
    """Boolean mask [B or 1, 1, q_len, k_len], True = attend.

    ``q_offset`` may be a scalar or a per-batch ``[B]`` vector (continuous
    batching: each slot decodes at its own absolute position).
    ``segment_ids``: packed-varlen masking — positions attend only within
    their own segment (the reference's varlen ``cu_seqlens`` semantics,
    expressed the TPU way).
    ``attention_chunk``: Llama-4-style chunked attention — a query attends
    only keys in its own length-C chunk, ``floor(q/C) == floor(k/C)``
    (the reference's ``construct_chunk_mask``,
    ``flash-attention-2.8.0/flash_attn/utils/testing.py:194-224``).
    """
    q_offset = jnp.asarray(q_offset, jnp.int32)
    if q_offset.ndim == 0:
        q_offset = q_offset[None]  # [1] broadcasts over batch
    # [B?, q_len, k_len] position grids
    q_pos = (q_offset[:, None] + jnp.arange(q_len)[None, :])[:, :, None]
    k_pos = jnp.arange(k_len)[None, None, :]
    mask = jnp.ones((1, q_len, k_len), dtype=bool)
    if causal:
        mask = mask & (k_pos <= q_pos)
    if window is not None:
        mask = mask & (k_pos > q_pos - window)
    if attention_chunk is not None:
        chunk_start = (q_pos // attention_chunk) * attention_chunk
        mask = mask & (k_pos >= chunk_start) & (
            k_pos < chunk_start + attention_chunk
        )
    mask = mask[:, None]  # [B?, 1, q, k]
    if kv_lens is not None:
        valid = k_pos[None] < kv_lens[:, None, None, None]
        mask = mask & valid[:, 0][:, None]
    if kv_start is not None:
        # Left padding in the cache (the reference's ``cache_leftpad``,
        # flash_attn_interface.py:1464+): keys before each sequence's start
        # index are dead.
        alive = k_pos[None] >= kv_start[:, None, None, None]
        mask = mask & alive[:, 0][:, None]
    if q_segment_ids is not None:
        same = (
            q_segment_ids[:, None, :, None] == kv_segment_ids[:, None, None, :]
        )
        mask = mask & same
    return mask


def attention_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    scale: Optional[float] = None,
    q_offset: int | jax.Array = 0,
    kv_lens: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    attention_chunk: Optional[int] = None,
    kv_start: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_seed: int | jax.Array = 0,
) -> jax.Array:
    """Golden attention in fp32.

    Shapes (bshd layout, matching the reference's TE config ``qkv_format=bshd``,
    ``te_llama.py:45-56``):
      q: [B, Sq, Hq, D], k/v: [B, Sk, Hk, D] with Hq % Hk == 0 (GQA).
      q_offset: absolute position of q[0] (for decode steps q_offset = cache len).
      kv_lens: [B] valid KV lengths (padding / ragged batches).
    Returns [B, Sq, Hq, D] in q.dtype.
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    groups = Hq // Hk
    scale = scale if scale is not None else D ** -0.5

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if groups > 1:
        kf = jnp.repeat(kf, groups, axis=2)
        vf = jnp.repeat(vf, groups, axis=2)

    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    if softcap is not None:
        logits = softcap * jnp.tanh(logits / softcap)
    if alibi_slopes is not None:
        # -slope * |q_pos - k_pos|, the reference's alibi bias
        # (tests/test_flash_attn.py:29-55) with absolute positions.
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None, :], (B, Hq))
        q_off = jnp.asarray(q_offset, jnp.int32)
        if q_off.ndim == 0:
            q_off = jnp.broadcast_to(q_off, (B,))
        q_pos = q_off[:, None] + jnp.arange(Sq, dtype=jnp.int32)[None, :]
        dist = jnp.abs(
            q_pos[:, :, None] - jnp.arange(Sk, dtype=jnp.int32)[None, None, :]
        )  # [B, Sq, Sk]
        logits = logits - (
            slopes[:, :, None, None] * dist[:, None].astype(jnp.float32)
        )
    mask = _build_mask(Sq, Sk, causal, window, q_offset, kv_lens, B,
                       q_segment_ids, kv_segment_ids, attention_chunk,
                       kv_start)
    logits = jnp.where(mask, logits, -jnp.inf)
    # Fully-masked rows (can happen with kv_lens=0) must produce zeros, not NaN.
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(jnp.any(mask, axis=-1, keepdims=True), probs, 0.0)
    if dropout_p > 0.0:
        # Same counter-hash mask as the flash kernel — the golden and the
        # kernel drop identical entries for identical (seed, b·h, i, j).
        from llm_fp8_tpu.kernels._common import dropout_keep_mask

        q_off = jnp.asarray(q_offset, jnp.int32)
        if q_off.ndim == 0:
            q_off = jnp.broadcast_to(q_off, (B,))
        bh = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * Hq
            + jnp.arange(Hq, dtype=jnp.int32)[None, :]
        )  # [B, Hq]
        q_pos = q_off[:, None] + jnp.arange(Sq, dtype=jnp.int32)[None, :]
        keep = dropout_keep_mask(
            jnp.asarray(dropout_seed, jnp.int32),
            bh[:, :, None, None],
            q_pos[:, None, :, None],
            jnp.arange(Sk, dtype=jnp.int32)[None, None, None, :],
            dropout_p,
        )
        probs = jnp.where(keep, probs, 0.0) / (1.0 - dropout_p)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vf)
    return out.astype(q.dtype)


def decode_attention(
    q: jax.Array,  # [B, 1, Hq, D]
    k: jax.Array,  # [B, S, Hk, D]
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_lens: Optional[jax.Array] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    q_offset: int | jax.Array = 0,
    alibi_slopes: Optional[jax.Array] = None,
    attention_chunk: Optional[int] = None,
    kv_start: Optional[jax.Array] = None,
    num_splits: int | str = 1,
) -> jax.Array:
    """Single-token decode attention, GQA-grouped, XLA-fused.

    The flash kernel's tiled grid is overkill for Sq=1 (one 128-row Q tile
    per (batch, head) with one live row → launch overhead dominates; profiled
    at ~900us/layer on v5e). This grouped einsum reads the KV cache exactly
    once with no GQA materialization and lets XLA fuse mask+softmax into the
    two GEMVs — the decode analogue of the reference's
    ``flash_attn_with_kvcache`` fast path (``mha.py:502-541``).

    ``num_splits``: split the KV axis into independent partial attentions
    merged by LSE combine (the reference's ``num_splits`` decode lever,
    ``hopper/flash_api.cpp:504``). ``"auto"`` applies
    :func:`llm_fp8_tpu.ops.split_kv.auto_num_splits` — occupancy-driven,
    resolving to 1 on single-TensorCore chips (v5e; measured table in
    docs/PERF_NOTES.md).
    """
    B, Sq, Hq, D = q.shape
    assert Sq == 1, "decode_attention is the Sq==1 fast path"
    _, S, Hk, _ = k.shape
    g = Hq // Hk
    scale = scale if scale is not None else D ** -0.5
    if num_splits == "auto":
        from llm_fp8_tpu.ops.split_kv import auto_num_splits

        num_splits = auto_num_splits(B, Hk, S)
        if S % num_splits != 0:  # heuristic miss → silent unsplit fallback
            num_splits = 1
    elif num_splits > 1:
        # An explicit integer is a user contract: fail loudly rather than
        # silently running unsplit (split_kv_attention asserts the same).
        assert S % num_splits == 0, (
            f"num_splits={num_splits} must divide the KV length S={S}; "
            f"pass num_splits='auto' for a divisibility-safe heuristic"
        )
    if num_splits > 1:
        return _decode_attention_split(
            q, k, v, int(num_splits), scale=scale, kv_lens=kv_lens,
            window=window, softcap=softcap, q_offset=q_offset,
            alibi_slopes=alibi_slopes, attention_chunk=attention_chunk,
            kv_start=kv_start,
        )

    qg = (q.astype(jnp.float32) * scale).reshape(B, Hk, g, D)
    s = jnp.einsum(
        "bhgd,bshd->bhgs", qg, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # [B, Hk, g, S]
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    k_pos = jnp.arange(S, dtype=jnp.int32)
    q_pos = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None, :], (B, Hq))
        dist = jnp.abs(q_pos[:, None] - k_pos[None, :])  # [B, S]
        s = s - (
            slopes.reshape(B, Hk, g)[:, :, :, None]
            * dist[:, None, None, :].astype(jnp.float32)
        )
    mask = k_pos[None, :] <= q_pos[:, None]  # causal vs absolute position
    if kv_lens is not None:
        mask &= k_pos[None, :] < kv_lens[:, None]
    if kv_start is not None:
        # cache_leftpad semantics (flash_attn_interface.py:1464+): the valid
        # cache for sequence b starts at kv_start[b].
        mask &= k_pos[None, :] >= kv_start[:, None]
    if window is not None:
        mask &= k_pos[None, :] > q_pos[:, None] - window
    if attention_chunk is not None:
        # Llama-4 chunked attention: attend only within the query's own
        # length-C chunk (upper bound subsumed by causal).
        mask &= k_pos[None, :] >= (
            (q_pos[:, None] // attention_chunk) * attention_chunk
        )
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)
    o = jnp.einsum(
        "bhgs,bshd->bhgd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return o.reshape(B, 1, Hq, D).astype(q.dtype)


def _decode_attention_split(
    q: jax.Array,  # [B, 1, Hq, D]
    k: jax.Array,  # [B, S, Hk, D]
    v: jax.Array,
    num_splits: int,
    *,
    scale: float,
    kv_lens: Optional[jax.Array],
    window: Optional[int],
    softcap: Optional[float],
    q_offset: int | jax.Array,
    alibi_slopes: Optional[jax.Array],
    attention_chunk: Optional[int],
    kv_start: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode attention as ``num_splits`` independent KV-chunk partials
    merged by LSE combine — numerically the same online-softmax merge flash
    applies across tiles, exposed across chunks so a multi-core chip can
    schedule them in parallel (``hopper/flash_fwd_combine.cu`` semantics).
    """
    from llm_fp8_tpu.ops.split_kv import combine_partials

    B, _, Hq, D = q.shape
    _, S, Hk, _ = k.shape
    g = Hq // Hk
    N, C = num_splits, S // num_splits
    kc = k.astype(jnp.float32).reshape(B, N, C, Hk, D)
    vc = v.astype(jnp.float32).reshape(B, N, C, Hk, D)
    qg = (q.astype(jnp.float32) * scale).reshape(B, Hk, g, D)
    s = jnp.einsum("bhgd,bnchd->bnhgc", qg, kc,
                   preferred_element_type=jnp.float32)
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    k_pos = (jnp.arange(N, dtype=jnp.int32) * C)[:, None] + jnp.arange(
        C, dtype=jnp.int32)[None, :]  # [N, C] absolute positions
    q_pos = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None, :], (B, Hq))
        dist = jnp.abs(q_pos[:, None, None] - k_pos[None])  # [B, N, C]
        s = s - (
            slopes.reshape(B, 1, Hk, g, 1)
            * dist[:, :, None, None, :].astype(jnp.float32)
        )
    mask = k_pos[None] <= q_pos[:, None, None]  # [B, N, C]
    if kv_lens is not None:
        mask &= k_pos[None] < kv_lens[:, None, None]
    if kv_start is not None:
        mask &= k_pos[None] >= kv_start[:, None, None]
    if window is not None:
        mask &= k_pos[None] > q_pos[:, None, None] - window
    if attention_chunk is not None:
        mask &= k_pos[None] >= (
            (q_pos[:, None, None] // attention_chunk) * attention_chunk
        )
    s = jnp.where(mask[:, :, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1)  # [B, N, Hk, g]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.where(jnp.isfinite(s), jnp.exp(s - m_safe[..., None]), 0.0)
    denom = jnp.sum(w, axis=-1)  # [B, N, Hk, g]
    o = jnp.einsum("bnhgc,bnchd->bnhgd", w, vc,
                   preferred_element_type=jnp.float32)
    o = o / jnp.where(denom == 0.0, 1.0, denom)[..., None]
    lse = jnp.where(denom > 0.0, m_safe + jnp.log(jnp.maximum(denom, 1e-37)),
                    -jnp.inf)
    # combine_partials expects [N, B, Sq, Hq, D] / [N, B, Sq, Hq].
    outs = o.transpose(1, 0, 2, 3, 4).reshape(N, B, 1, Hq, D)
    lses = lse.transpose(1, 0, 2, 3).reshape(N, B, 1, Hq)
    return combine_partials(outs, lses).astype(q.dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    scale: Optional[float] = None,
    q_offset: int | jax.Array = 0,
    kv_lens: Optional[jax.Array] = None,
    alibi_slopes: Optional[jax.Array] = None,
    attention_chunk: Optional[int] = None,
    kv_start: Optional[jax.Array] = None,
    dropout_p: float = 0.0,
    dropout_seed: int | jax.Array = 0,
    impl: str = "auto",
    cp_axis: Optional[str] = None,
    cp_mesh=None,
) -> jax.Array:
    """Public attention entry; dispatches to the Pallas flash kernel on TPU.

    ``impl``: "auto" (decode fast path for Sq==1, flash on TPU, reference
    elsewhere), "flash", "decode", "ref".

    ``dropout_p``: attention dropout (training); supported by the flash and
    reference paths — the single-token decode fast path is inference-only.

    ``cp_axis``/``cp_mesh``: context parallelism. When set, the call becomes
    a manual-sharding island inside the surrounding GSPMD program: q/k/v are
    resharded so *sequence* lies along ``cp_axis`` of ``cp_mesh`` and the
    differentiable ring of flash kernels runs over explicit ``ppermute``
    hops (``parallel/ring_attention.py``). Dense causal/full attention only.
    """
    if cp_axis is not None:
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from llm_fp8_tpu.parallel.ring_attention import ring_attention

        if dropout_p != 0.0 or alibi_slopes is not None:
            raise NotImplementedError(
                "context parallelism supports window/softcap/ragged-kv_lens "
                "attention (Mistral/Gemma families, ragged batches) but not "
                "dropout or ALiBi"
            )
        assert cp_mesh is not None, "cp_axis requires cp_mesh"
        names = set(cp_mesh.axis_names)
        shape = dict(zip(cp_mesh.axis_names, cp_mesh.devices.shape))
        # Keep batch sharded over the data axes and heads over tp while the
        # island runs — each (batch, head) shard rings independently; only
        # axes that divide evenly can stay sharded.
        b_ax = tuple(
            a for a in ("dp", "fsdp")
            if a in names and q.shape[0] % shape[a] == 0 and shape[a] > 1
        )
        h_ax = (
            "tp"
            if "tp" in names
            and q.shape[2] % shape["tp"] == 0
            and k.shape[2] % shape["tp"] == 0
            else None
        )
        spec = P(b_ax or None, cp_axis, h_ax, None)
        if kv_lens is None:
            fn = shard_map(
                partial(ring_attention, axis_name=cp_axis, causal=causal,
                        scale=scale, window=window, softcap=softcap),
                mesh=cp_mesh, in_specs=(spec,) * 3, out_specs=spec,
                check_vma=False,
            )
            return fn(q, k, v)
        # Ragged batch: kv_lens [B] rides sharded over the same batch axes.
        lens_spec = P(b_ax or None)
        fn = shard_map(
            lambda q_, k_, v_, lens_: ring_attention(
                q_, k_, v_, axis_name=cp_axis, causal=causal, scale=scale,
                window=window, softcap=softcap, kv_lens=lens_),
            mesh=cp_mesh, in_specs=(spec, spec, spec, lens_spec),
            out_specs=spec, check_vma=False,
        )
        return fn(q, k, v, jnp.asarray(kv_lens, jnp.int32))
    if impl == "auto":
        if q.shape[1] == 1 and causal and dropout_p == 0.0:
            impl = "decode"
        else:
            impl = "flash" if jax.default_backend() == "tpu" else "ref"
    if impl == "decode":
        assert dropout_p == 0.0, "decode fast path is inference-only"
        return decode_attention(
            q, k, v, scale=scale, kv_lens=kv_lens, window=window,
            softcap=softcap, q_offset=q_offset, alibi_slopes=alibi_slopes,
            attention_chunk=attention_chunk, kv_start=kv_start,
            num_splits="auto",
        )
    if impl == "flash":
        from llm_fp8_tpu.kernels.flash_attention import flash_attention

        if kv_start is not None:
            raise NotImplementedError(
                "kv_start (cache_leftpad) is a decode-path feature; the "
                "prefill/training flash kernel takes right-aligned kv_lens"
            )
        return flash_attention(
            q, k, v, causal=causal, window=window, softcap=softcap,
            scale=scale, q_offset=q_offset, kv_lens=kv_lens,
            alibi_slopes=alibi_slopes, attention_chunk=attention_chunk,
            dropout_p=dropout_p, dropout_seed=dropout_seed,
        )
    return attention_ref(
        q, k, v, causal=causal, window=window, softcap=softcap,
        scale=scale, q_offset=q_offset, kv_lens=kv_lens, kv_start=kv_start,
        alibi_slopes=alibi_slopes, attention_chunk=attention_chunk,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
    )
