"""Fused FP8-KV decode kernel: append + flash decode directly over an fp8 arena.

The round-1 fp8-KV serving path collapsed to 0.37x bf16 because the arena
was dequantized *in XLA* before attention: every step read the fp8 arena
(1 B/elem), wrote a bf16 copy to HBM (2 B/elem) and read it back (2 B/elem).
This kernel is the fix: K/V stream from HBM as fp8 and are dequantized
per-chunk in VMEM, so the cache costs exactly 1 byte of HBM traffic per
element — *less* than bf16-KV.

Two further round-2 findings shaped this version (measured on the v5e):
  * f32 MXU dots cost multiple passes — all dots are bf16 with the softmax
    scale and per-head K descale folded into q, and the V descale deferred
    to the epilogue (linear in V);
  * the XLA append scatter into a lane-major arena was ~4 ms/step at
    B=32 (one column write per (batch, head) = pathological sub-tile
    stores). The append now happens inside the kernel: one aligned
    [Hk, D, 128] tile read-modify-write per sequence, quantization
    included, overlapped with nothing else touching HBM.

Semantics match the reference's decode path ``flash_attn_with_kvcache``
(``flash_attn/flash_attn_interface.py:1464+``): one query token per
sequence, the kernel itself quantizes and appends the new K/V token
(``k``/``v`` arguments of the reference kernel), ragged ``lengths``, GQA,
optional sliding window and softcap, per-head k/v descales (FA3's
``q_descale/k_descale/v_descale``, ``hopper/flash_attn_interface.py:631-662``).
Rotary of the single new token stays in XLA (a [B, Hk, D] elementwise — the
hot terms were the arena dequant and the scatter, both now in-kernel).

Arena layout is lane-major on the sequence axis: ``[L, B, Hk, D, S]`` with
``S % 128 == 0`` — chunk DMAs ``[Hk, D, C]`` sit on aligned lanes for every
head_dim, and K arrives contraction-major for the q·k matmul (same layout
trick as the paged kernel's pages).

GQA is packed into sublanes: all ``Hq/Hk`` grouped query heads of one KV
head form rows of one MXU operand (reference ``hopper/pack_gqa.h``); the
grid is one cell per *batch row* with the KV-head loop unrolled in-kernel —
coarse cells amortize per-cell launch/DMA overhead (the fine (b, h) grid
measured 3 µs/cell of pure overhead).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_fp8_tpu.kernels._common import fp8_to_bf16_ftz

__all__ = ["decode_attention_arena"]

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    # scalar prefetch
    lengths_ref,  # [B] valid tokens per sequence, INCLUDING the new token
    layer_ref,  # [1]
    k_scale_ref,  # [Hk] per-head descales
    v_scale_ref,  # [Hk]
    # inputs
    q_ref,  # [1, Hk, G8, D] VMEM (grouped q heads, padded to 8 sublanes)
    alibi_ref,  # [Hk, G8] VMEM per-head ALiBi slopes (zeros when unused)
    *rest,
    chunk: int,
    scale: float,
    window: Optional[int],
    softcap: Optional[float],
    has_alibi: bool,
    append: bool,
    has_rope: bool,
    fmax: Optional[float],
):
    if append:
        if has_rope:
            (new_k_ref, new_v_ref, rope_ref, k_in_ref, v_in_ref,
             o_ref, k_out_ref, v_out_ref,
             k_buf, v_buf, tile_buf, sems, tile_sems) = rest
        else:
            (new_k_ref, new_v_ref, k_in_ref, v_in_ref,
             o_ref, k_out_ref, v_out_ref,
             k_buf, v_buf, tile_buf, sems, tile_sems) = rest
    else:
        (k_in_ref, v_in_ref, o_ref,
         k_buf, v_buf, sems) = rest
        k_out_ref, v_out_ref = k_in_ref, v_in_ref

    def _rope(x):
        # HF rotate-half on the lane (D) axis: x*cos ⊕ rot_half(x)*sin with
        # cos/sin stored duplicated over both halves ([D] = [cos|cos]) so the
        # mix is two elementwise FMAs — the in-kernel form of
        # flash_attn_with_kvcache's fused rotary
        # (csrc/flash_attn/src/rotary.h; flash_attn_interface.py:1464+).
        c = rope_ref[0, 0, 0].astype(jnp.float32)  # [D]
        s = rope_ref[0, 1, 0].astype(jnp.float32)
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x * c + rot * s

    b = pl.program_id(0)
    length = lengths_ref[b]
    layer = layer_ref[0]
    _, Hk, G8, D = q_ref.shape
    n_chunks = jax.lax.div(length + chunk - 1, chunk)

    # ---- in-kernel quantize + append of the new token ----
    # One aligned [Hk, D, 128] tile RMW. Re-quantizing the 127 resident
    # columns of the tile is exact (fp8 -> f32 -> clip -> fp8 at the same
    # scale is the identity), so a plain f32 `where` does the column insert
    # without fp8-select support.
    if append:
        p_new = length - 1
        ts = (p_new // 128) * 128  # 128-aligned lane offset of the tile

        rk = pltpu.make_async_copy(
            k_in_ref.at[layer, b, :, :, pl.ds(ts, 128)],
            tile_buf.at[0], tile_sems.at[0],
        )
        rv = pltpu.make_async_copy(
            v_in_ref.at[layer, b, :, :, pl.ds(ts, 128)],
            tile_buf.at[1], tile_sems.at[1],
        )
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()

        kscales = jnp.concatenate(
            [jnp.full((1, 1), k_scale_ref[h], jnp.float32) for h in range(Hk)]
        )  # [Hk, 1]
        vscales = jnp.concatenate(
            [jnp.full((1, 1), v_scale_ref[h], jnp.float32) for h in range(Hk)]
        )
        kq = new_k_ref[0].astype(jnp.float32)  # [Hk, D]
        if has_rope:
            # Rotate the raw new K before quantization (V carries no rope);
            # rope is a per-lane linear mix, the per-head scale divide
            # commutes with it.
            kq = _rope(kq)
        kq = kq / kscales
        vq = new_v_ref[0].astype(jnp.float32) / vscales
        if fmax is not None:
            # Saturate before the narrow cast (fp8 overflow would become
            # NaN; int8 astype would wrap).
            kq = jnp.clip(kq, -fmax, fmax)
            vq = jnp.clip(vq, -fmax, fmax)
        if jnp.issubdtype(tile_buf.dtype, jnp.integer):
            # float→int astype truncates toward zero; int8 KV needs
            # round-to-nearest (same contract as quant.qtensor.quantize).
            kq = jnp.round(kq)
            vq = jnp.round(vq)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Hk, D, 128), 2)
        off = p_new - ts
        tile_buf[0] = jnp.where(
            lane == off, kq[:, :, None], tile_buf[0].astype(jnp.float32)
        ).astype(tile_buf.dtype)
        tile_buf[1] = jnp.where(
            lane == off, vq[:, :, None], tile_buf[1].astype(jnp.float32)
        ).astype(tile_buf.dtype)

        # Write back; the chunk loop below must see the new column, so wait
        # before any chunk DMA is issued.
        wk = pltpu.make_async_copy(
            tile_buf.at[0], k_out_ref.at[layer, b, :, :, pl.ds(ts, 128)],
            tile_sems.at[0],
        )
        wv = pltpu.make_async_copy(
            tile_buf.at[1], v_out_ref.at[layer, b, :, :, pl.ds(ts, 128)],
            tile_sems.at[1],
        )
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    # ---- flash decode over the arena ----

    # Chunk fetches read through the *output* refs: with the arenas aliased
    # in-place they are the same HBM buffer as the inputs, and the loop must
    # observe the column the append above just wrote.
    def start_fetch(slot, chunk_idx):
        off = chunk_idx * chunk
        pltpu.make_async_copy(
            k_out_ref.at[layer, b, :, :, pl.ds(off, chunk)],
            k_buf.at[slot], sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            v_out_ref.at[layer, b, :, :, pl.ds(off, chunk)],
            v_buf.at[slot], sems.at[slot, 1],
        ).start()

    def wait_fetch(slot):
        pltpu.make_async_copy(
            k_out_ref.at[0, 0, :, :, pl.ds(0, chunk)],
            k_buf.at[slot], sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            v_out_ref.at[0, 0, :, :, pl.ds(0, chunk)],
            v_buf.at[slot], sems.at[slot, 1],
        ).wait()

    @pl.when(n_chunks > 0)
    def _():
        start_fetch(0, 0)

    # Fold softmax scale AND the per-head K descale into q once, outside the
    # chunk loop — MXU operands stay bf16 and no per-chunk f32 dequant copy
    # of K is ever materialized.
    q = jnp.stack(
        [
            ((_rope(q_ref[0, h].astype(jnp.float32)) if has_rope
              else q_ref[0, h].astype(jnp.float32))
             * (scale * k_scale_ref[h])).astype(jnp.bfloat16)
            for h in range(Hk)
        ]
    )  # [Hk, G8, D]

    def body(i, carry):
        m, l, acc = carry  # [Hk, G8, 1], [Hk, G8, 1], [Hk, G8, D]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            start_fetch(1 - slot, i + 1)

        wait_fetch(slot)
        # In-VMEM dequant to bf16: the only HBM traffic was the fp8 bytes,
        # the only VPU work the type conversion (scales folded into q and
        # the epilogue). fp8 uses the shift+multiply route (~1.5x the
        # software convert on v5e; FTZ on format subnormals — below the
        # calibrated kv_scale's 2^-6, i.e. noise); int8 astype is hardware.
        s = jnp.stack(
            [
                jax.lax.dot(
                    q[h], fp8_to_bf16_ftz(k_buf[slot, h]),
                    preferred_element_type=jnp.float32,
                )
                for h in range(Hk)
            ]
        )  # [Hk, G8, C]
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        pos = i * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (Hk, G8, chunk), 2
        )
        if has_alibi:
            # ALiBi bias after softcap (same ordering as the flash kernel:
            # the cap bounds QK scores, the positional bias stays uncapped).
            # The decode token sits at position length-1 ≥ every valid k, so
            # -slope·|q_pos - k_pos| = slope·(pos - (length-1)).
            slope = alibi_ref[...][:, :, None]  # [Hk, G8, 1]
            s = s + slope * (pos - (length - 1)).astype(jnp.float32)
        mask = pos < length
        if window is not None:
            # The decode token sits at absolute position length-1.
            mask &= pos > (length - 1) - window
        s = jnp.where(mask, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=2, keepdims=True)
        pb = p.astype(jnp.bfloat16)
        pv = jnp.stack(
            [
                jax.lax.dot_general(
                    pb[h], fp8_to_bf16_ftz(v_buf[slot, h]),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(Hk)
            ]
        )  # [Hk, G8, D]
        acc_next = acc * alpha + pv
        return m_next, l_next, acc_next

    init = (
        jnp.full((Hk, G8, 1), -jnp.inf, jnp.float32),
        jnp.zeros((Hk, G8, 1), jnp.float32),
        jnp.zeros((Hk, G8, D), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    # V descale deferred out of the loop: acc is linear in V.
    vsc = jnp.stack(
        [jnp.full((1, 1), v_scale_ref[h], jnp.float32) for h in range(Hk)]
    )  # [Hk, 1, 1]
    l_inv = jnp.where(l == 0.0, 1.0, vsc / l)
    o_ref[0] = (acc * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "softcap", "alibi_slopes", "chunk",
                     "interpret"),
)
def decode_attention_arena(
    q: jax.Array,  # [B, Hq, D]
    k_arena: jax.Array,  # [L, B, Hk, D, S] fp8 (or bf16)
    v_arena: jax.Array,
    lengths: jax.Array,  # [B] valid tokens (including the one just appended)
    layer_idx: jax.Array | int = 0,
    *,
    new_k: Optional[jax.Array] = None,  # [B, Hk, D] unquantized new token
    new_v: Optional[jax.Array] = None,
    rope_cos_sin: Optional[tuple] = None,  # (cos, sin) [B, D/2] f32
    k_scale: jax.Array | float = 1.0,  # scalar or [Hk] per-head descale
    v_scale: jax.Array | float = 1.0,
    scale: Optional[float] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[tuple] = None,  # [Hq] floats, hashable (static)
    chunk: int = 512,
    interpret: Optional[bool] = None,
):
    """Single-token flash decode over a lane-major (transposed) KV arena.

    With ``new_k``/``new_v``, the kernel first quantizes (by the per-head
    descales) and appends the token at column ``lengths - 1`` of the arena
    (one aligned 128-lane tile RMW in HBM, aliased in-place), then attends
    over ``lengths`` tokens; returns ``(out [B, Hq, D], k_arena, v_arena)``.
    Without them it only attends and returns ``out``. The kernel never
    materializes a dequantized copy of the cache — fp8 K/V stream from HBM
    and convert in VMEM (the ``q/k/v_descale`` path of FA3's kvcache kernel,
    ``hopper/flash_api.cpp:1064``, built TPU-style).

    ``rope_cos_sin``: per-batch (cos, sin) ``[B, D/2]`` for the decode
    token's position — rotary applied to ``q`` and ``new_k`` *inside* the
    kernel, mirroring ``flash_attn_with_kvcache``'s fused rotary
    (``flash_attn_interface.py:1464+``, ``csrc/flash_attn/src/rotary.h``);
    pass pre-rotated q/new_k and omit this to keep rotary in XLA. Append
    path only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Hq, D = q.shape
    L, _, Hk, _, S = k_arena.shape
    chunk = min(chunk, S)
    if not interpret and (S % 128 != 0 or chunk % 128 != 0):
        raise ValueError(
            f"arena seq len {S} and chunk {chunk} must be multiples of 128 "
            "on TPU (chunk DMAs sit on the 128-lane axis)"
        )
    if S % chunk != 0:
        raise ValueError(f"arena seq len {S} must be divisible by chunk {chunk}")
    append = new_k is not None
    groups = Hq // Hk
    scale = scale if scale is not None else D ** -0.5
    layer_idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    k_scale = jnp.broadcast_to(jnp.asarray(k_scale, jnp.float32), (Hk,))
    v_scale = jnp.broadcast_to(jnp.asarray(v_scale, jnp.float32), (Hk,))
    quantized = k_arena.dtype not in (jnp.bfloat16, jnp.float32)
    if not quantized:
        fmax = None
    elif jnp.issubdtype(k_arena.dtype, jnp.integer):
        fmax = float(jnp.iinfo(k_arena.dtype).max)  # int8 KV: ±127
    else:
        fmax = float(jnp.finfo(k_arena.dtype).max)

    # Pack grouped q heads into sublanes, padded to the f32 min tile (8).
    G8 = max(8, groups)
    qg = q.reshape(B, Hk, groups, D)
    if G8 != groups:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - groups), (0, 0)))

    has_alibi = alibi_slopes is not None
    if has_alibi:
        # [Hq] flat slopes -> [Hk, G8] array matching the q packing (grouped
        # heads in sublanes, zero bias on the padding rows). Passed as a tiny
        # VMEM input — Pallas kernels cannot capture constant arrays.
        flat = tuple(float(s) for s in alibi_slopes)
        assert len(flat) == Hq, (len(flat), Hq)
        alibi_arr = jnp.asarray(
            [flat[h * groups:(h + 1) * groups] + (0.0,) * (G8 - groups)
             for h in range(Hk)],
            jnp.float32,
        )
    else:
        alibi_arr = jnp.zeros((Hk, G8), jnp.float32)
    alibi_spec = pl.BlockSpec((Hk, G8), lambda b, *_: (0, 0))

    has_rope = rope_cos_sin is not None
    if has_rope:
        assert append, "in-kernel rotary rides the append path"
        cos, sin = rope_cos_sin
        # Duplicated-halves layout ([cos|cos], [sin|sin]) so the kernel's
        # rotate-half mix is two elementwise FMAs; 8 sublanes for the
        # (8, 128) min-tile rule (all rows identical).
        rope = jnp.stack(
            [jnp.concatenate([cos, cos], -1), jnp.concatenate([sin, sin], -1)],
            axis=1,
        ).astype(jnp.float32)  # [B, 2, D]
        rope = jnp.broadcast_to(rope[:, :, None, :], (B, 2, 8, D))
        rope_specs = [pl.BlockSpec((1, 2, 8, D), lambda b, *_: (b, 0, 0, 0))]
        rope_args = [rope]
    else:
        rope_specs, rope_args = [], []

    kernel = functools.partial(
        _kernel, chunk=chunk, scale=scale, window=window, softcap=softcap,
        has_alibi=has_alibi, append=append, has_rope=has_rope, fmax=fmax,
    )

    arena_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    q_spec = pl.BlockSpec((1, Hk, G8, D), lambda b, *_: (b, 0, 0, 0))
    o_spec = pl.BlockSpec((1, Hk, G8, D), lambda b, *_: (b, 0, 0, 0))
    buf_shapes = [
        pltpu.VMEM((2, Hk, D, chunk), k_arena.dtype),
        pltpu.VMEM((2, Hk, D, chunk), v_arena.dtype),
    ]

    if append:
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(B,),
                in_specs=[
                    q_spec,
                    alibi_spec,
                    pl.BlockSpec((1, Hk, D), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Hk, D), lambda b, *_: (b, 0, 0)),
                    *rope_specs,
                    *arena_specs,
                ],
                out_specs=(
                    o_spec,
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ),
                scratch_shapes=buf_shapes + [
                    pltpu.VMEM((2, Hk, D, 128), k_arena.dtype),
                    pltpu.SemaphoreType.DMA((2, 2)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, Hk, G8, D), q.dtype),
                jax.ShapeDtypeStruct(k_arena.shape, k_arena.dtype),
                jax.ShapeDtypeStruct(v_arena.shape, v_arena.dtype),
            ),
            # Inputs (scalar prefetch included) are (lengths, layer, ks, vs,
            # q, alibi, new_k, new_v[, rope], k_arena, v_arena): alias the
            # arenas to outputs 1/2 → the RMW is in-place in HBM.
            input_output_aliases={8 + len(rope_args): 1,
                                  9 + len(rope_args): 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(lengths, layer_idx, k_scale, v_scale, qg, alibi_arr,
          new_k.astype(jnp.bfloat16), new_v.astype(jnp.bfloat16),
          *rope_args, k_arena, v_arena)
        o, k_arena, v_arena = out
        return o[:, :, :groups].reshape(B, Hq, D), k_arena, v_arena

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B,),
            in_specs=[q_spec, alibi_spec, *arena_specs],
            out_specs=o_spec,
            scratch_shapes=buf_shapes + [pltpu.SemaphoreType.DMA((2, 2))],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hk, G8, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths, layer_idx, k_scale, v_scale, qg, alibi_arr, k_arena, v_arena)

    return out[:, :, :groups].reshape(B, Hq, D)
