"""Fused FP8-KV decode kernel: flash decode directly over an fp8 arena.

The round-1 fp8-KV serving path collapsed to 0.37x bf16 because the arena
was dequantized *in XLA* before attention (``models/llama.py`` round-1
lines 339-343): every step read the fp8 arena (1 B/elem), wrote a bf16 copy
to HBM (2 B/elem) and read it back (2 B/elem) — 5 bytes of HBM traffic per
cache element against bf16-KV's 2. This kernel is the fix: K/V stream from
HBM as fp8 and are dequantized per-chunk in VMEM registers, so the cache
costs exactly 1 byte of HBM traffic per element — *less* than bf16-KV.

Semantics match the reference's decode path ``flash_attn_with_kvcache``
(``flash_attn/flash_attn_interface.py:1464+``; FA3 fp8 descales
``hopper/flash_attn_interface.py:631-662``): one query token per sequence,
ragged ``lengths``, GQA, optional sliding window and softcap, per-head
k/v descales. The rotary+quantize+append of the single new token stays in
XLA — on TPU that is a [B, Hk, D] scatter the compiler fuses; the
whole-arena dequant was the hot term, and it is what moves in-kernel.

Arena layout is lane-major on the sequence axis: ``[L, B, Hk, D, S]`` with
``S % 128 == 0`` — chunk DMAs ``[D, C]`` sit on aligned lanes for every
head_dim, and K arrives contraction-major for the q·k matmul (same layout
trick as the paged kernel's pages).

GQA is packed into sublanes: grid cell = (batch, kv-head), with all
``Hq/Hk`` grouped query heads as rows of one MXU operand
(reference ``hopper/pack_gqa.h``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention_arena"]

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    # scalar prefetch
    lengths_ref,  # [B]
    layer_ref,  # [1]
    k_scale_ref,  # [Hk] per-head descales
    v_scale_ref,  # [Hk]
    # inputs
    q_ref,  # [1, 1, G8, D] VMEM (grouped q heads, padded to 8 sublanes)
    k_arena_ref,  # [L, B, Hk, D, S] HBM
    v_arena_ref,  # [L, B, Hk, D, S] HBM
    # output
    o_ref,  # [1, 1, G8, D]
    # scratch
    k_buf,  # [2, D, C] VMEM
    v_buf,  # [2, D, C] VMEM
    sems,  # DMA sems [2, 2]
    *,
    chunk: int,
    scale: float,
    window: Optional[int],
    softcap: Optional[float],
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = lengths_ref[b]
    layer = layer_ref[0]
    k_scale = k_scale_ref[h]
    v_scale = v_scale_ref[h]
    n_chunks = jax.lax.div(length + chunk - 1, chunk)

    def start_fetch(slot, chunk_idx):
        off = chunk_idx * chunk
        pltpu.make_async_copy(
            k_arena_ref.at[layer, b, h, :, pl.ds(off, chunk)],
            k_buf.at[slot], sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            v_arena_ref.at[layer, b, h, :, pl.ds(off, chunk)],
            v_buf.at[slot], sems.at[slot, 1],
        ).start()

    def wait_fetch(slot):
        pltpu.make_async_copy(
            k_arena_ref.at[0, 0, 0, :, pl.ds(0, chunk)],
            k_buf.at[slot], sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            v_arena_ref.at[0, 0, 0, :, pl.ds(0, chunk)],
            v_buf.at[slot], sems.at[slot, 1],
        ).wait()

    @pl.when(n_chunks > 0)
    def _():
        start_fetch(0, 0)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [G8, D]
    G8, D = q.shape

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            start_fetch(1 - slot, i + 1)

        wait_fetch(slot)
        # In-VMEM dequant: the only HBM traffic was the fp8 bytes.
        k = k_buf[slot].astype(jnp.float32) * k_scale  # [D, C]
        v = v_buf[slot].astype(jnp.float32) * v_scale  # [D, C]

        s = jax.lax.dot(q, k, preferred_element_type=jnp.float32)  # [G8, C]
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        pos = i * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (G8, chunk), 1
        )
        mask = pos < length
        if window is not None:
            # The decode token sits at absolute position length-1.
            mask &= pos > (length - 1) - window
        s = jnp.where(mask, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        acc_next = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_next, l_next, acc_next

    init = (
        jnp.full((G8, 1), -jnp.inf, jnp.float32),
        jnp.zeros((G8, 1), jnp.float32),
        jnp.zeros((G8, D), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "softcap", "chunk", "interpret"),
)
def decode_attention_arena(
    q: jax.Array,  # [B, Hq, D]
    k_arena: jax.Array,  # [L, B, Hk, D, S] fp8 (or bf16)
    v_arena: jax.Array,
    lengths: jax.Array,  # [B] valid tokens (including the one just appended)
    layer_idx: jax.Array | int = 0,
    *,
    k_scale: jax.Array | float = 1.0,  # scalar or [Hk] per-head descale
    v_scale: jax.Array | float = 1.0,
    scale: Optional[float] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    chunk: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-token flash decode over a lane-major (transposed) KV arena.

    Returns ``[B, Hq, D]`` in q.dtype. The kernel never materializes a
    dequantized copy of the cache — fp8 K/V stream from HBM and convert in
    VMEM (the ``q/k/v_descale`` path of FA3's kvcache kernel,
    ``hopper/flash_api.cpp:1064``, built TPU-style).
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
    groups = Hq // Hk
    scale = scale if scale is not None else D ** -0.5
    layer_idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    k_scale = jnp.broadcast_to(
        jnp.asarray(k_scale, jnp.float32), (Hk,)
    )
    v_scale = jnp.broadcast_to(
        jnp.asarray(v_scale, jnp.float32), (Hk,)
    )

    # Pack grouped q heads into sublanes, padded to the f32 min tile (8).
    G8 = max(8, groups)
    qg = q.reshape(B, Hk, groups, D)
    if G8 != groups:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - groups), (0, 0)))

    kernel = functools.partial(
        _kernel, chunk=chunk, scale=scale, window=window, softcap=softcap
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hk),
            in_specs=[
                pl.BlockSpec((1, 1, G8, D), lambda b, h, *_: (b, h, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),  # arenas stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, G8, D), lambda b, h, *_: (b, h, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, D, chunk), k_arena.dtype),
                pltpu.VMEM((2, D, chunk), v_arena.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hk, G8, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, layer_idx, k_scale, v_scale, qg, k_arena, v_arena)

    return out[:, :, :groups].reshape(B, Hq, D)
