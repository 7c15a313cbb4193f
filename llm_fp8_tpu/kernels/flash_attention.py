"""Pallas flash-attention forward kernel for TPU.

TPU-native equivalent of the reference's FA2/FA3 forward kernels
(``csrc/flash_attn/src/flash_fwd_kernel.h:52`` ``compute_attn_1rowblock``;
``hopper/mainloop_fwd_sm90_tma_gmma_ws.hpp:34``): tiled online-softmax
attention that never materializes the [Sq, Sk] score matrix. Design follows
the canonical JAX TPU flash kernel (grid over batch × head × Q-tile × KV-tile,
fp32 m/l/acc scratch in VMEM, causal tile skipping) rather than the CUDA
warp-specialization, which has no TPU analogue — the Mosaic compiler does the
pipelining that TMA/WGMMA scheduling does by hand on Hopper.

Supported (parity with ``flash_attn_func`` / ``flash_attn_with_kvcache``
essentials): GQA/MQA via head-index mapping (no K/V repeat materialized),
causal masking with absolute ``q_offset`` (decode against a cache), per-batch
``kv_lens`` masking, sliding window, softcap, logit scale.

The same kernel serves prefill (Sq large) and single-token decode (Sq padded
to one Q tile): decode is HBM-bandwidth-bound streaming K/V, so the padded
rows ride along free on the MXU's minimum tile.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_fp8"]

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128


def _auto_block(seq: int) -> int:
    """Largest tile in {128, 256, 512} whose padding overhead is bounded.

    At training shapes the kernel is grid-overhead bound, not FLOPs bound:
    with 128x128 tiles at B8/Hq32/S512/D64 the grid is 4096 programs of
    ~4 MFLOP each and the forward measures 41 ms where the attention-FLOPs
    ideal is <1 ms (scripts/profile_fwd_parts.py). 512-wide tiles collapse
    the grid 16x and quadruple MXU work per program; VMEM stays far under
    budget (scores block [512, 512] f32 = 1 MB). Decode (Sq=1) keeps the
    128 floor so padded rows stay cheap.

    A big tile only wins when the sequence roughly FILLS the padded grid:
    e.g. Sk=520 under 512-tiles pads to 1024 (2x the K work of 128-tiles'
    640) — so a candidate is taken only when its padded length is within
    25% of the 128-tile padded length (1 extra 128-tile of slack per 512).
    """
    import os

    env = os.environ.get("LLM_FP8_FLASH_BLOCK")
    if env:  # trace-time sweep hook (scripts/sweep_train.py block study)
        return int(env)

    def pad_to(b):
        return -(-seq // b) * b

    base = pad_to(128)
    for b in (512, 256):
        if seq >= b and pad_to(b) <= 1.25 * base:
            return b
    return 128
# -0.7 * f32_max, not -inf: exp(-inf - (-inf)) would NaN in the online update.
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _fwd_kernel(
    # scalar prefetch
    q_offset_ref,  # [B] absolute position of q row 0, per batch
    kv_lens_ref,  # [B] valid KV length per batch
    seed_ref,  # [1] dropout seed (ignored when dropout_rate == 0)
    alibi_ref,  # [B, Hq] f32 per-head alibi slopes ([1, 1] dummy if unused)
    descale_ref,  # [3, B, Hk] f32 q/k/v descales ([1, 1, 1] dummy if unused)
    # blocked inputs
    q_ref,  # [1, 1, bq, D]
    k_ref,  # [1, 1, D, bk] — K stored contraction-major (Mosaic bf16 matmul
    #         requires the contraction on the sublane axis of the rhs)
    v_ref,  # [1, 1, bk, D]
    qseg_ref,  # [1, 8, bq] int32 segment ids (8 identical sublanes); dummy
    #            zeros block when has_segments=False
    kseg_ref,  # [1, 8, bk] int32
    # blocked outputs
    o_ref,  # [1, 1, bq, D]
    lse_ref,  # [1, 1, 8, bq] f32 log-sum-exp residual (8 sublanes to satisfy
    #           the TPU (8, 128) min-tile rule; all 8 rows identical)
    # scratch
    m_ref,  # [bq, 128] f32
    l_ref,  # [bq, 128] f32
    acc_ref,  # [bq, D] f32
    *,
    scale: float,
    causal: bool,
    window: Optional[int],
    softcap: Optional[float],
    block_q: int,
    block_k: int,
    num_k_tiles: int,
    has_segments: bool,
    has_alibi: bool = False,
    dropout_rate: float = 0.0,
    attention_chunk: Optional[int] = None,
    groups: int = 1,
    has_descale: bool = False,
    fp8_native: bool = False,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    q_off = q_offset_ref[b]
    kv_len = kv_lens_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Tile-level skip: this KV tile contributes iff some (q, k) pair is live.
    k_min = ki * block_k
    run = k_min < kv_len  # beyond the valid cache → dead tile
    if causal:
        # Largest absolute q position in this tile must reach the tile's k_min.
        q_max = q_off + qi * block_q + block_q - 1
        run = jnp.logical_and(run, q_max >= k_min)
    if window is not None:
        # Smallest q position must not have scrolled past the tile's k_max.
        q_min = q_off + qi * block_q
        run = jnp.logical_and(run, k_min + block_k - 1 > q_min - window)
        # ...nor past the ragged cache end: if even the smallest q's window
        # starts at/after kv_len, every row of this q tile is empty.
        run = jnp.logical_and(run, q_min - window + 1 < kv_len)
    if attention_chunk is not None:
        # Tile is dead if it lies entirely outside every row's chunk:
        # left of the first row's chunk start, or right of the last row's
        # chunk end (chunked attention, Llama-4 style).
        q_min = q_off + qi * block_q
        q_max = q_min + block_q - 1
        start_min = (q_min // attention_chunk) * attention_chunk
        end_max = (q_max // attention_chunk) * attention_chunk + attention_chunk
        run = jnp.logical_and(run, k_min + block_k - 1 >= start_min)
        run = jnp.logical_and(run, k_min < end_max)

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]  # [bq, D]
        k = k_ref[0, 0]  # [D, bk]
        if has_descale and not fp8_native:
            # Dequant route for fp8 inputs on chips without fp8 MXU: widen
            # the stored e4m3 operands to bf16 (hardware convert) before the
            # dot. Same operand VALUES as the native route — the contract
            # tests assert both routes agree.
            q, k = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16)
        s = jax.lax.dot(q, k, preferred_element_type=jnp.float32)  # [bq, bk]
        s *= scale
        if has_descale:
            # FA3 fp8 semantics (hopper/flash_api.cpp:322-341): q/k stored
            # quantized; per-(batch, kv-head) descales restore magnitudes
            # after the QK^T product (exact: scales are per-tensor-slice
            # constants, so (q·sq)ᵀ(k·sk) == (qᵀk)·sq·sk).
            s *= descale_ref[0, b, h // groups] * descale_ref[1, b, h // groups]
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)

        q_pos = (
            q_off + qi * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        )
        k_pos = k_min + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if has_alibi:
            # ALiBi positional bias, -slope * |q_pos - k_pos|: matches the
            # reference's causal form (slope * col, csrc/flash_attn/src/
            # alibi.h:40-49) up to a per-row constant the softmax cancels,
            # and its non-causal |row + sk - sq - col| form exactly when the
            # caller aligns ends via q_offset (tests/test_flash_attn.py:29-55).
            # Applied after softcap: the cap bounds QK scores; the positional
            # bias stays uncapped so long-range decay is preserved.
            slope = alibi_ref[b, h]
            s = s - slope * jnp.abs(q_pos - k_pos).astype(jnp.float32)
        mask = k_pos < kv_len
        if causal:
            mask &= k_pos <= q_pos
        if window is not None:
            mask &= k_pos > q_pos - window
        if attention_chunk is not None:
            # Chunked attention (Llama-4): attend only inside the query's own
            # length-C chunk (reference construct_chunk_mask,
            # flash_attn/utils/testing.py:194-224).
            chunk_start = (q_pos // attention_chunk) * attention_chunk
            mask &= k_pos >= chunk_start
            mask &= k_pos < chunk_start + attention_chunk
        if has_segments:
            # Packed varlen: attend only within the same segment id.
            seg_q = qseg_ref[0, 0]  # [bq]
            seg_k = kseg_ref[0, 0]  # [bk]
            mask &= seg_q[:, None] == seg_k[None, :]
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_ref[...][:, :1]  # [bq, 1]
        l_prev = l_ref[...][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)  # [bq, bk]
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

        if dropout_rate > 0.0:
            # Attention dropout (flash_attn_func's dropout_p,
            # flash_attn_interface.py:1135+): drop entries of the softmax
            # weights, scale survivors by 1/(1-rate). The normalizer l uses
            # the UNdropped p (dropout applies to the normalized softmax),
            # so only the V-accumulation sees the mask. The mask comes from
            # the stateless counter hash — backward regenerates it exactly.
            keep = dropout_keep_mask(
                seed_ref[0], b * pl.num_programs(1) + h, q_pos, k_pos,
                dropout_rate,
            )
            p_v = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
        else:
            p_v = p

        v = v_ref[0, 0]  # [bk, D]
        if has_descale:
            # FA3 PV in fp8: P requantizes to e4m3 with scale 1.0 (softmax
            # weights live in [0, 1], well inside e4m3 range); V's descale
            # is a per-head constant, deferred to the finalize epilogue.
            p8 = p_v.astype(jnp.float8_e4m3fn)
            if fp8_native:
                pv = jax.lax.dot(p8, v, preferred_element_type=jnp.float32)
            else:
                pv = jax.lax.dot(p8.astype(jnp.bfloat16),
                                 v.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot(
                p_v.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
        # Deferred normalization: accumulate unnormalized, divide at the end.
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ki == num_k_tiles - 1)
    def _finalize():
        l = l_ref[...][:, :1]
        m = m_ref[...][:, :1]
        # A row is dead when no live (unmasked) entry ever reached it: either
        # every tile was skipped (l == 0) or every visited entry was masked
        # (m never rose above MASK_VALUE — masked scores contribute
        # exp(MASK_VALUE - MASK_VALUE) = 1 to l, so l alone can't tell).
        # Reachable through feature conjunctions (e.g. sliding window past a
        # ragged kv_len: every key in (q-W, q] is ≥ kv_len); must emit
        # out = 0, lse = -inf like the reference's empty-row wash.
        dead = jnp.logical_or(l == 0.0, m <= MASK_VALUE * 0.5)
        l_inv = jnp.where(dead, 0.0, 1.0 / jnp.where(l == 0.0, 1.0, l))
        o = acc_ref[...] * l_inv
        if has_descale:
            o = o * descale_ref[2, b, h // groups]
        o_ref[0, 0] = o.astype(o_ref.dtype)
        # Log-sum-exp residual for the backward pass (dead rows get -inf;
        # backward turns them into zero gradients).
        lse = jnp.where(dead, -jnp.inf, m + jnp.log(jnp.where(l == 0.0, 1.0, l)))
        lse_ref[0, 0] = jnp.broadcast_to(lse[:, 0][None, :], lse_ref.shape[2:])


from ._common import dropout_keep_mask, pad_to_multiple as _pad_to  # noqa: E402


def _flash_fwd_call(
    q, k, v, q_offset, kv_lens, q_segment_ids=None, kv_segment_ids=None,
    seed=None, alibi=None, descale=None,
    *, causal, window, softcap, scale, block_q, block_k, interpret,
    dropout_rate=0.0, attention_chunk=None, fp8_native=False,
    out_dtype=None,
):
    """Forward kernel launch; returns (out bshd, lse [B, Hq, Sq_p])."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    assert Hq % Hk == 0, (Hq, Hk)
    groups = Hq // Hk

    # bhsd layout inside the kernel (K contraction-major: [B, Hk, D, Sk]);
    # pad seq dims to tile multiples.
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, block_q)
    kt = _pad_to(k.transpose(0, 2, 3, 1), 3, block_k)
    vt = _pad_to(v.transpose(0, 2, 1, 3), 2, block_k)
    Sq_p, Sk_p = qt.shape[2], kt.shape[3]
    num_k_tiles = Sk_p // block_k

    has_segments = q_segment_ids is not None
    if has_segments:
        # 8-sublane layout for the (8, 128) min-tile rule; q padding -> -1,
        # kv padding -> -2 so padded positions never match any segment.
        qs = _pad_to(q_segment_ids.astype(jnp.int32) + 0, 1, block_q)
        qs = jnp.where(
            jnp.arange(Sq_p)[None, :] < q.shape[1], qs, -1
        )
        ks = _pad_to(kv_segment_ids.astype(jnp.int32) + 0, 1, block_k)
        ks = jnp.where(
            jnp.arange(Sk_p)[None, :] < k.shape[1], ks, -2
        )
        qs8 = jnp.broadcast_to(qs[:, None, :], (B, 8, Sq_p))
        ks8 = jnp.broadcast_to(ks[:, None, :], (B, 8, Sk_p))
        qseg_map = lambda b, h, qi, ki, *_: (b, 0, qi)
        kseg_map = lambda b, h, qi, ki, *_: (b, 0, ki)
    else:
        qs8 = jnp.zeros((B, 8, block_q), jnp.int32)
        ks8 = jnp.zeros((B, 8, block_k), jnp.int32)
        qseg_map = lambda b, h, qi, ki, *_: (b, 0, 0)
        kseg_map = lambda b, h, qi, ki, *_: (b, 0, 0)

    grid = (B, Hq, Sq_p // block_q, num_k_tiles)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    has_alibi = alibi is not None
    alibi_arr = (
        alibi.astype(jnp.float32) if has_alibi
        else jnp.zeros((1, 1), jnp.float32)
    )
    has_descale = descale is not None
    descale_arr = (
        descale.astype(jnp.float32) if has_descale
        else jnp.zeros((1, 1, 1), jnp.float32)
    )

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        window=window,
        softcap=softcap,
        block_q=block_q,
        block_k=block_k,
        num_k_tiles=num_k_tiles,
        has_segments=has_segments,
        has_alibi=has_alibi,
        dropout_rate=dropout_rate,
        attention_chunk=attention_chunk,
        groups=groups,
        has_descale=has_descale,
        fp8_native=fp8_native,
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            # Index maps receive the scalar-prefetch refs as trailing args.
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, D, block_k),
                    lambda b, h, qi, ki, *_: (b, h // groups, 0, ki),
                ),
                pl.BlockSpec(
                    (1, 1, block_k, D),
                    lambda b, h, qi, ki, *_: (b, h // groups, ki, 0),
                ),
                pl.BlockSpec((1, 8, block_q), qseg_map),
                pl.BlockSpec((1, 8, block_k), kseg_map),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 8, block_q), lambda b, h, qi, ki, *_: (b, h, 0, qi)
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq_p, D), out_dtype or q.dtype),
            jax.ShapeDtypeStruct((B, Hq, 8, Sq_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_offset, kv_lens, seed, alibi_arr, descale_arr, qt, kt, vt, qs8, ks8)

    return out[:, :, :Sq].transpose(0, 2, 1, 3), lse


class _FlashCfg:
    """Hashable static config for the custom_vjp nondiff argument."""

    __slots__ = ("causal", "window", "softcap", "scale", "block_q", "block_k",
                 "interpret", "dropout_rate", "attention_chunk")

    def __init__(self, **kw):
        for k_, v_ in kw.items():
            setattr(self, k_, v_)

    def _key(self):
        return tuple(getattr(self, s) for s in self.__slots__)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _FlashCfg) and self._key() == other._key()

    def asdict(self):
        return {s: getattr(self, s) for s in self.__slots__}


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _flash(q, k, v, q_offset, kv_lens, qseg, kseg, seed, alibi,
           cfg: _FlashCfg):
    cfg_d = cfg.asdict()
    out, _ = _flash_fwd_call(q, k, v, q_offset, kv_lens, qseg, kseg, seed,
                             alibi, **cfg_d)
    return out


def _flash_fwd_rule(q, k, v, q_offset, kv_lens, qseg, kseg, seed, alibi,
                    cfg: _FlashCfg):
    out, lse = _flash_fwd_call(q, k, v, q_offset, kv_lens, qseg, kseg, seed,
                               alibi, **cfg.asdict())
    # Name the residuals so a jax.checkpoint policy can keep them: with
    # "flash_res" saveable (models.llama._remat_policy "dots"), the backward
    # reuses the primal out/lse instead of re-running this Pallas forward —
    # one flash-fwd execution per layer per step instead of two (measured in
    # the grad jaxpr: 4 -> 3 pallas_calls per attention).
    out = checkpoint_name(out, "flash_res")
    lse = checkpoint_name(lse, "flash_res")
    return out, (q, k, v, out, lse, q_offset, kv_lens, qseg, kseg, seed,
                 alibi)


def _flash_bwd_rule(cfg: _FlashCfg, res, do):
    import numpy as np

    from .flash_attention_bwd import flash_attention_bwd

    q, k, v, out, lse, q_offset, kv_lens, qseg, kseg, seed, alibi = res
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, do,
        causal=cfg.causal, window=cfg.window, softcap=cfg.softcap,
        scale=cfg.scale, q_offset=q_offset, kv_lens=kv_lens,
        q_segment_ids=qseg, kv_segment_ids=kseg,
        dropout_rate=cfg.dropout_rate, seed=seed, alibi=alibi,
        attention_chunk=cfg.attention_chunk,
        block_q=cfg.block_q, block_k=cfg.block_k, interpret=cfg.interpret,
    )
    zero_int = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # noqa: E731
    return (dq, dk, dv, zero_int(q_offset), zero_int(kv_lens),
            (zero_int(qseg) if qseg is not None else None),
            (zero_int(kseg) if kseg is not None else None),
            zero_int(seed),
            (jnp.zeros_like(alibi) if alibi is not None else None))


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,  # [B, Sq, Hq, D]
    k: jax.Array,  # [B, Sk, Hk, D]
    v: jax.Array,  # [B, Sk, Hk, D]
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
    dropout_p: float = 0.0,
    dropout_seed: int | jax.Array = 0,
    deterministic: bool = True,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention over bshd tensors; semantics of
    :func:`llm_fp8_tpu.ops.attention.attention_ref`. Differentiable: the
    backward runs the Pallas dKV/dQ kernels (flash_attention_bwd).

    ``segment_ids`` ([B, Sq] / [B, Sk] int32): packed-varlen masking — the
    TPU-idiomatic form of the reference's ``cu_seqlens`` varlen API
    (``flash_attn_varlen_func``); positions attend only within their own
    segment.

    ``dropout_p``/``dropout_seed``: attention dropout on the softmax weights
    (``flash_attn_func(dropout_p=...)``); the keep mask is a stateless
    counter hash of the absolute score coordinates, regenerated identically
    in the backward (the reference's saved-Philox-state idiom,
    ``csrc/flash_attn/src/dropout.h``). Vary ``dropout_seed`` per step.

    ``alibi_slopes`` ([Hq] or [B, Hq] f32): ALiBi positional bias
    ``-slope * |q_pos - k_pos|`` per head — the semantics of
    ``flash_attn_func(alibi_slopes=...)``
    (``csrc/flash_attn/src/alibi.h``); differentiable (slopes receive zero
    gradient, matching the reference's non-trainable slopes).

    ``deterministic``: accepted for API parity with
    ``flash_attn_func(deterministic=...)`` — the TPU backward is *always*
    deterministic (gradients accumulate in per-tile VMEM scratch over a
    sequential grid dimension; there are no atomics to race), so both values
    behave identically.

    ``interpret=None`` auto-selects Pallas interpreter mode off-TPU so the
    same code path is testable on the CPU backend.
    """
    del deterministic  # always deterministic on TPU (no atomics), see doc
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Sq, Hq, D = q.shape
    _, Sk, _, _ = k.shape
    if kv_lens is None:
        kv_lens = jnp.full((B,), Sk, jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
    if alibi_slopes is not None:
        alibi_slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if alibi_slopes.ndim == 1:
            alibi_slopes = jnp.broadcast_to(alibi_slopes[None, :], (B, Hq))
        assert alibi_slopes.shape == (B, Hq), alibi_slopes.shape
    if block_q is None:
        block_q = _auto_block(Sq)
    if block_k is None:
        block_k = _auto_block(Sk)
    cfg = _FlashCfg(
        causal=causal, window=window, softcap=softcap,
        scale=scale if scale is not None else D ** -0.5,
        block_q=block_q, block_k=block_k, interpret=interpret,
        dropout_rate=float(dropout_p),
        attention_chunk=attention_chunk,
    )
    return _flash(q, k, v, q_offset, kv_lens, q_segment_ids, kv_segment_ids,
                  seed, alibi_slopes, cfg)


def flash_attention_fp8(
    q: jax.Array,  # [B, Sq, Hq, D] float8_e4m3fn
    k: jax.Array,  # [B, Sk, Hk, D] float8_e4m3fn
    v: jax.Array,  # [B, Sk, Hk, D] float8_e4m3fn
    *,
    q_descale: jax.Array,  # [B, Hk] or [Hk] f32
    k_descale: jax.Array,
    v_descale: jax.Array,
    causal: bool = True,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    scale: Optional[float] = None,
    q_offset: "int | jax.Array" = 0,
    kv_lens: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
    fp8_native: Optional[bool] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """FP8-*compute* flash attention with FA3 descale semantics.

    The reference's core inference speed mechanism: FA3 executes QK^T and PV
    with e4m3 operands and applies per-(batch, kv-head) ``q/k/v_descale``
    factors inside the kernel (``hopper/flash_api.cpp:75,322-341``; descale
    application ``:1064``; P requantized to e4m3 with scale 1 before PV).
    This is the TPU equivalent:

    * ``fp8_native=True`` (default on fp8-MXU backends,
      :func:`llm_fp8_tpu.utils.backend.native_fp8_matmul`): the Pallas dots
      take the e4m3 refs directly with ``preferred_element_type=f32`` — the
      MXU multiplies 1-byte operands, halving operand VMEM/HBM traffic.
    * ``fp8_native=False`` (v5e and older): identical math via a hardware
      e4m3→bf16 widen before each dot. Same quantized operand values, so
      the two routes agree to MXU rounding — asserted by the contract tests
      (tests/test_flash_attention.py::TestFP8Compute).

    Forward-only (the reference's fp8 path is likewise inference-side).
    Descales broadcast per batch when given as ``[Hk]``.
    """
    assert q.dtype == jnp.float8_e4m3fn, q.dtype
    assert k.dtype == jnp.float8_e4m3fn and v.dtype == jnp.float8_e4m3fn
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if fp8_native is None:
        from llm_fp8_tpu.utils.backend import native_fp8_matmul

        fp8_native = native_fp8_matmul()
    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    if kv_lens is None:
        kv_lens = jnp.full((B,), Sk, jnp.int32)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))

    def as_bh(d):
        d = jnp.asarray(d, jnp.float32)
        if d.ndim == 0:
            d = d[None]
        if d.ndim == 1:
            d = jnp.broadcast_to(d[None, :], (B, Hk))
        assert d.shape == (B, Hk), d.shape
        return d

    descale = jnp.stack([as_bh(q_descale), as_bh(k_descale),
                         as_bh(v_descale)])
    out, _ = _flash_fwd_call(
        q, k, v, q_offset, kv_lens, None, None, None, None, descale,
        causal=causal, window=window, softcap=softcap,
        scale=scale if scale is not None else D ** -0.5,
        block_q=block_q or _auto_block(Sq),
        block_k=block_k or _auto_block(Sk),
        interpret=interpret, fp8_native=fp8_native, out_dtype=out_dtype,
    )
    return out
