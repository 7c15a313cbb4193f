"""Pallas flash-attention backward kernels (dK/dV and dQ).

TPU-native equivalent of the reference's FA2 backward
(``csrc/flash_attn/src/flash_bwd_kernel.h`` + the ``di = rowsum(o·do)``
preprocess kernel, SURVEY.md §2c #38): softmax weights are *recomputed* per
tile from the saved log-sum-exp, so the [Sq, Sk] score matrix never
materializes in the backward either.

Two kernels with opposite iteration orders (the reference's dKV/dQ split,
``flash-attention-2.8.0`` backward design):
  * dKV: grid over KV tiles, inner loop (trailing sequential grid dim) over
    Q tiles — dk/dv accumulate in VMEM scratch.
  * dQ:  grid over Q tiles, inner over KV tiles — dq accumulates in scratch.

GQA: gradients are produced per *query* head ([B, Hq, Sk, D]) and
segment-summed over the group outside the kernel — no cross-head races.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import dropout_keep_mask

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _recompute_p_and_ds(
    q, kT, vT, do, lse, di, *, scale, causal, window, softcap,
    q_off, kv_len, qi, ki, block_q, block_k, seg_q=None, seg_k=None,
    dropout_rate=0.0, seed=0, bh=0, alibi_slope=None,
    attention_chunk=None,
):
    """Shared tile math, f32. Returns ``(p_v, ds)``: ``p_v`` is the softmax
    weight actually applied to V in the forward (dropout mask + 1/(1-r)
    scaling included) — the dV operand; ``ds`` the score gradients."""
    s_raw = jax.lax.dot(q, kT, preferred_element_type=jnp.float32) * scale
    if softcap is not None:
        # z = cap·tanh(s/cap); dz/ds = 1 - (z/cap)^2 multiplies ds below.
        z = softcap * jnp.tanh(s_raw / softcap)
    else:
        z = s_raw
    q_pos = (
        q_off + qi * block_q
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    )
    k_pos = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    if alibi_slope is not None:
        # Same post-softcap ALiBi bias as the forward; additive in the score,
        # so the ds chain is unchanged (the tanh derivative below reads the
        # un-biased capped z, applying only to the capped QK part).
        z_b = z - alibi_slope * jnp.abs(q_pos - k_pos).astype(jnp.float32)
    else:
        z_b = z
    mask = k_pos < kv_len
    if causal:
        mask &= k_pos <= q_pos
    if window is not None:
        mask &= k_pos > q_pos - window
    if attention_chunk is not None:
        # Chunked attention (same mask as the forward kernel).
        chunk_start = (q_pos // attention_chunk) * attention_chunk
        mask &= (k_pos >= chunk_start) & (k_pos < chunk_start + attention_chunk)
    if seg_q is not None:
        mask &= seg_q[:, None] == seg_k[None, :]
    # p from the saved LSE: exp(z - lse). Fully-masked rows have lse=-inf;
    # guard the exp so they produce 0, not NaN.
    lse_col = lse[:, None]
    p = jnp.where(
        mask & jnp.isfinite(lse_col), jnp.exp(z_b - jnp.where(
            jnp.isfinite(lse_col), lse_col, 0.0)), 0.0
    )
    dp = jax.lax.dot(do, vT, preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        # Regenerate the forward's keep mask from the same counter hash.
        keep = dropout_keep_mask(seed, bh, q_pos, k_pos, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        p_v = jnp.where(keep, p, 0.0) * inv
        dpm = jnp.where(keep, dp * inv, 0.0)
    else:
        p_v = p
        dpm = dp
    ds = p * (dpm - di[:, None])
    if softcap is not None:
        ds = ds * (1.0 - (z / softcap) ** 2)
    ds = ds * scale
    return p_v, ds


def _dkv_kernel(
    q_offset_ref, kv_lens_ref, seed_ref, alibi_ref,
    q_ref, kT_ref, v_ref, vT_ref, do_ref, lse_ref, di_ref,
    qseg_ref, kseg_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, window, softcap, block_q, block_k, num_q_tiles,
    groups, num_q_heads,
    has_segments, has_alibi, dropout_rate, attention_chunk,
):
    # Grid: (B, Hk, nk, groups * nq). The inner sequential dim enumerates
    # (g, qi) pairs so the GQA group-sum of dk/dv happens IN the f32
    # accumulator — the per-q-head [B, Hq, Sk, D] intermediates (4x the
    # output bytes at Llama's groups=4) and the external bf16 reduction
    # pass both disappear.
    b, hk = pl.program_id(0), pl.program_id(1)
    ki, t = pl.program_id(2), pl.program_id(3)
    g = t // num_q_tiles
    qi = t % num_q_tiles
    hq = hk * groups + g
    q_off = q_offset_ref[b]
    kv_len = kv_lens_ref[b]

    @pl.when(t == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = ki * block_k < kv_len
    if causal:
        # Tile is dead if even the largest q position is left of the tile.
        run = jnp.logical_and(
            run, q_off + qi * block_q + block_q - 1 >= ki * block_k
        )

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        p_v, ds = _recompute_p_and_ds(
            q, kT_ref[0, 0], vT_ref[0, 0], do, lse_ref[0, 0, 0], di_ref[0, 0, 0],
            scale=scale, causal=causal, window=window, softcap=softcap,
            q_off=q_off,
            kv_len=kv_len, qi=qi, ki=ki, block_q=block_q, block_k=block_k,
            seg_q=qseg_ref[0, 0] if has_segments else None,
            seg_k=kseg_ref[0, 0] if has_segments else None,
            dropout_rate=dropout_rate, seed=seed_ref[0],
            bh=b * num_q_heads + hq,
            alibi_slope=alibi_ref[b, hq] if has_alibi else None,
            attention_chunk=attention_chunk,
        )
        dtype = q.dtype
        dv_acc[...] += jax.lax.dot(
            p_v.T.astype(dtype), do, preferred_element_type=jnp.float32
        )
        dk_acc[...] += jax.lax.dot(
            ds.T.astype(dtype), q, preferred_element_type=jnp.float32
        )

    @pl.when(t == groups * num_q_tiles - 1)
    def _():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_kernel(
    q_offset_ref, kv_lens_ref, seed_ref, alibi_ref,
    q_ref, kT_ref, k_ref, vT_ref, do_ref, lse_ref, di_ref,
    qseg_ref, kseg_ref,
    dq_ref,
    dq_acc,
    *, scale, causal, window, softcap, block_q, block_k, num_k_tiles,
    has_segments, has_alibi, dropout_rate, attention_chunk,
):
    b, h = pl.program_id(0), pl.program_id(1)
    qi, ki = pl.program_id(2), pl.program_id(3)
    q_off = q_offset_ref[b]
    kv_len = kv_lens_ref[b]

    @pl.when(ki == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = ki * block_k < kv_len
    if causal:
        run = jnp.logical_and(
            run, q_off + qi * block_q + block_q - 1 >= ki * block_k
        )
    if window is not None:
        run = jnp.logical_and(
            run, ki * block_k + block_k - 1 > q_off + qi * block_q - window
        )

    @pl.when(run)
    def _():
        q = q_ref[0, 0]
        _, ds = _recompute_p_and_ds(
            q, kT_ref[0, 0], vT_ref[0, 0], do_ref[0, 0], lse_ref[0, 0, 0],
            di_ref[0, 0, 0],
            scale=scale, causal=causal, window=window, softcap=softcap,
            q_off=q_off,
            kv_len=kv_len, qi=qi, ki=ki, block_q=block_q, block_k=block_k,
            seg_q=qseg_ref[0, 0] if has_segments else None,
            seg_k=kseg_ref[0, 0] if has_segments else None,
            dropout_rate=dropout_rate, seed=seed_ref[0],
            bh=b * pl.num_programs(1) + h,
            alibi_slope=alibi_ref[b, h] if has_alibi else None,
            attention_chunk=attention_chunk,
        )
        dq_acc[...] += jax.lax.dot(
            ds.astype(q.dtype), k_ref[0, 0], preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_k_tiles - 1)
    def _():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def flash_attention_bwd(
    q, k, v, o, lse, do,
    *,
    causal: bool,
    window: Optional[int],
    scale: float,
    q_offset: jax.Array,  # [B]
    kv_lens: jax.Array,  # [B]
    block_q: int,
    block_k: int,
    interpret: bool,
    softcap: Optional[float] = None,
    q_segment_ids=None,  # [B, Sq] int32 (packed varlen) or None
    kv_segment_ids=None,
    dropout_rate: float = 0.0,
    seed=None,  # [1] int32 dropout seed
    alibi=None,  # [B, Hq] f32 per-head alibi slopes or None
    attention_chunk: Optional[int] = None,
):
    """dq, dk, dv for bshd flash attention.

    ``lse``: [B, Hq, 8, Sq_p] from the forward kernel (8 identical sublanes) (padded seq). Shapes of
    q/k/v/o/do are the public bshd unpadded shapes.
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hk, _ = k.shape
    groups = Hq // Hk

    from ._common import pad_to_multiple as pad

    qt = pad(q.transpose(0, 2, 1, 3), 2, block_q)  # [B,Hq,Sqp,D]
    dot_ = pad(do.transpose(0, 2, 1, 3), 2, block_q)
    ot = pad(o.transpose(0, 2, 1, 3), 2, block_q)
    kt = pad(k.transpose(0, 2, 1, 3), 2, block_k)  # [B,Hk,Skp,D]
    kT = pad(k.transpose(0, 2, 3, 1), 3, block_k)  # [B,Hk,D,Skp]
    vt = pad(v.transpose(0, 2, 1, 3), 2, block_k)
    vT = pad(v.transpose(0, 2, 3, 1), 3, block_k)
    Sq_p, Sk_p = qt.shape[2], kt.shape[2]
    nq, nk = Sq_p // block_q, Sk_p // block_k

    has_segments = q_segment_ids is not None
    B_ = B
    if has_segments:
        qs = pad(q_segment_ids.astype(jnp.int32), 1, block_q)
        qs = jnp.where(jnp.arange(Sq_p)[None, :] < Sq, qs, -1)
        ks = pad(kv_segment_ids.astype(jnp.int32), 1, block_k)
        ks = jnp.where(jnp.arange(Sk_p)[None, :] < Sk, ks, -2)
        qs8 = jnp.broadcast_to(qs[:, None, :], (B_, 8, Sq_p))
        ks8 = jnp.broadcast_to(ks[:, None, :], (B_, 8, Sk_p))
        qseg_spec_kv = pl.BlockSpec((1, 8, block_q),
                                    lambda b, h, ki, t, *_: (b, 0, t % nq))
        kseg_spec_kv = pl.BlockSpec((1, 8, block_k),
                                    lambda b, h, ki, t, *_: (b, 0, ki))
        qseg_spec_q = pl.BlockSpec((1, 8, block_q),
                                   lambda b, h, qi, ki, *_: (b, 0, qi))
        kseg_spec_q = pl.BlockSpec((1, 8, block_k),
                                   lambda b, h, qi, ki, *_: (b, 0, ki))
    else:
        qs8 = jnp.zeros((B_, 8, block_q), jnp.int32)
        ks8 = jnp.zeros((B_, 8, block_k), jnp.int32)
        qseg_spec_kv = pl.BlockSpec((1, 8, block_q),
                                    lambda b, h, ki, t, *_: (b, 0, 0))
        kseg_spec_kv = pl.BlockSpec((1, 8, block_k),
                                    lambda b, h, ki, t, *_: (b, 0, 0))
        qseg_spec_q = qseg_spec_kv
        kseg_spec_q = kseg_spec_kv

    # di = rowsum(o * do) — the reference's preprocess kernel; XLA fuses this.
    di = jnp.sum(
        ot.astype(jnp.float32) * dot_.astype(jnp.float32), axis=-1
    )  # [B,Hq,Sqp] -> 8-sublane layout matching the forward's lse output
    di = jnp.broadcast_to(di[:, :, None, :], lse.shape)

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    has_alibi = alibi is not None
    alibi_arr = (
        alibi.astype(jnp.float32) if has_alibi
        else jnp.zeros((1, 1), jnp.float32)
    )

    common = dict(scale=scale, causal=causal, window=window, softcap=softcap,
                  block_q=block_q, block_k=block_k,
                  has_segments=has_segments, has_alibi=has_alibi,
                  dropout_rate=dropout_rate, attention_chunk=attention_chunk)

    # ---- dK/dV (grid: b, hk, ki, (g, qi)-inner — group-sum in-kernel) ----
    dkv = pl.pallas_call(
        functools.partial(_dkv_kernel, num_q_tiles=nq, groups=groups,
                          num_q_heads=Hq, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hk, nk, groups * nq),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, D),
                    lambda b, h, ki, t, *_: (b, h * groups + t // nq, t % nq, 0),
                ),  # q
                pl.BlockSpec((1, 1, D, block_k),
                             lambda b, h, ki, t, *_: (b, h, 0, ki)),  # kT
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, h, ki, t, *_: (b, h, ki, 0)),  # v
                pl.BlockSpec((1, 1, D, block_k),
                             lambda b, h, ki, t, *_: (b, h, 0, ki)),  # vT
                pl.BlockSpec(
                    (1, 1, block_q, D),
                    lambda b, h, ki, t, *_: (b, h * groups + t // nq, t % nq, 0),
                ),  # do
                pl.BlockSpec(
                    (1, 1, 8, block_q),
                    lambda b, h, ki, t, *_: (b, h * groups + t // nq, 0, t % nq),
                ),  # lse
                pl.BlockSpec(
                    (1, 1, 8, block_q),
                    lambda b, h, ki, t, *_: (b, h * groups + t // nq, 0, t % nq),
                ),  # di
                qseg_spec_kv,
                kseg_spec_kv,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, h, ki, t, *_: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, h, ki, t, *_: (b, h, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hk, Sk_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hk, Sk_p, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_offset, kv_lens, seed, alibi_arr, qt, kT, vt, vT, dot_, lse, di,
      qs8, ks8)
    dk_grouped, dv_grouped = dkv

    # ---- dQ (grid: b, h, qi, ki-inner) ----
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, num_k_tiles=nk, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hq, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),  # q
                pl.BlockSpec((1, 1, D, block_k),
                             lambda b, h, qi, ki, *_: (b, h // groups, 0, ki)),  # kT
                pl.BlockSpec((1, 1, block_k, D),
                             lambda b, h, qi, ki, *_: (b, h // groups, ki, 0)),  # k
                pl.BlockSpec((1, 1, D, block_k),
                             lambda b, h, qi, ki, *_: (b, h // groups, 0, ki)),  # vT
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, qi, ki, *_: (b, h, qi, 0)),  # do
                pl.BlockSpec((1, 1, 8, block_q),
                             lambda b, h, qi, ki, *_: (b, h, 0, qi)),  # lse
                pl.BlockSpec((1, 1, 8, block_q),
                             lambda b, h, qi, ki, *_: (b, h, 0, qi)),  # di
                qseg_spec_q,
                kseg_spec_q,
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D),
                                   lambda b, h, qi, ki, *_: (b, h, qi, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_offset, kv_lens, seed, alibi_arr, qt, kT, kt, vT, dot_, lse, di,
      qs8, ks8)

    dq_out = dq[:, :, :Sq].transpose(0, 2, 1, 3)
    # GQA group-sum already folded inside the dKV kernel (f32 accumulator).
    dk_out = dk_grouped[:, :, :Sk].transpose(0, 2, 1, 3).astype(k.dtype)
    dv_out = dv_grouped[:, :, :Sk].transpose(0, 2, 1, 3).astype(v.dtype)
    return dq_out, dk_out, dv_out
