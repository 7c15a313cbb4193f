"""Shared kernel-side helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pad_to_multiple", "dropout_keep_mask", "e4m3_to_bf16_ftz", "fp8_to_bf16_ftz"]


def e4m3_to_bf16_ftz(w: jax.Array) -> jax.Array:
    """e4m3fn → bf16 via bit-shift + one power-of-two multiply (kernel-side).

    ``bf16_bits = sign | (exp:mant << 4)`` re-seats e4m3's 7 payload bits in
    the bf16 exponent/mantissa field; the ×2^120 multiply then rebases the
    exponent (e4m3 bias 7 → bf16 bias 127). Exact for every NORMAL e4m3
    value; e4m3 subnormals (|x| < 2^-6) land on bf16-subnormal intermediates
    which the TPU VPU flushes, so they dequantize to ±0 — FTZ semantics.
    Weight quantization flushes those codes at quantize time
    (``quant.qtensor.quantize(flush_subnormal=True)``), making this bit-exact
    on the entire stored-code domain the framework emits.

    Why not the select-based exact chain: measured ~1.5× slower on v5e
    (30 → 45 GB/s dequant-bound, within-session ratio); the builtin
    ``astype`` convert is software on v5e and slower than either.
    """
    from jax.experimental.pallas import tpu as pltpu

    i32 = pltpu.bitcast(w, jnp.uint8).astype(jnp.int32)
    sign = jnp.left_shift(jnp.bitwise_and(i32, 0x80), 8)
    body = jnp.left_shift(jnp.bitwise_and(i32, 0x7F), 4)
    bits = jnp.bitwise_or(sign, body).astype(jnp.uint16)
    return pltpu.bitcast(bits, jnp.bfloat16) * jnp.bfloat16(2.0 ** 120)


def fp8_to_bf16_ftz(x: jax.Array) -> jax.Array:
    """fp8 (e4m3fn / e5m2) → bf16 via the shift+multiply route; other dtypes
    fall through to ``astype`` (int8 converts are hardware on v5e). e5m2 uses
    the same construction with a 5-bit payload shift and a ×2^112 rebias
    (bias 15 → 127). Same FTZ caveat as :func:`e4m3_to_bf16_ftz` — format
    subnormals (e5m2: |x| < 2^-14) dequantize to ±0."""
    if x.dtype == jnp.float8_e4m3fn:
        return e4m3_to_bf16_ftz(x)
    if x.dtype == jnp.float8_e5m2:
        from jax.experimental.pallas import tpu as pltpu

        i32 = pltpu.bitcast(x, jnp.uint8).astype(jnp.int32)
        sign = jnp.left_shift(jnp.bitwise_and(i32, 0x80), 8)
        body = jnp.left_shift(jnp.bitwise_and(i32, 0x7F), 5)
        bits = jnp.bitwise_or(sign, body).astype(jnp.uint16)
        return pltpu.bitcast(bits, jnp.bfloat16) * jnp.bfloat16(2.0 ** 112)
    return x.astype(jnp.bfloat16)


def pad_to_multiple(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    """Zero-pad ``axis`` up to the next multiple (no-op when aligned)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


_GOLD = 0x9E3779B9  # 2^32 / phi — Weyl increment


def _fmix32(x: jax.Array) -> jax.Array:
    """murmur3 32-bit finalizer: full-avalanche integer mix (uint32)."""
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


def dropout_keep_mask(
    seed: jax.Array,  # scalar int32
    bh: jax.Array,  # scalar int32: flattened (batch, head) index
    q_pos: jax.Array,  # int32 absolute q row index (any broadcastable shape)
    k_pos: jax.Array,  # int32 absolute k col index
    rate: float,
) -> jax.Array:
    """Counter-based dropout keep mask (True = keep), purely functional.

    The reference regenerates its dropout mask in the backward kernel from a
    saved Philox state (``csrc/flash_attn/src/dropout.h``); the TPU
    equivalent is this stateless counter hash of the absolute score
    coordinates — the same (seed, b·h, i, j) always produces the same bit in
    forward, backward, and in the pure-jnp golden, on every backend (Pallas
    interpret mode included, which the hardware PRNG primitive is not).
    """
    h0 = _fmix32(jnp.uint32(seed) + jnp.uint32(bh) * jnp.uint32(_GOLD))
    ctr = (
        q_pos.astype(jnp.uint32) * jnp.uint32(_GOLD)
        + k_pos.astype(jnp.uint32)
    )
    bits = _fmix32(h0 ^ ctr)
    threshold = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return bits >= threshold
