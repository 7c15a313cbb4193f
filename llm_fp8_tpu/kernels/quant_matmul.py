"""Fused dequant-matmul Pallas kernel: bf16 activations × FP8 weights.

TPU-native equivalent of the reference's FP8 GEMM path (TE → cuBLASLt FP8
GEMM behind ``fp8_autocast``, and the ``csrc/fused_dense_lib`` epilogues,
SURVEY.md §2c #42): weights stream from HBM as 1-byte elements and are
dequantized in VMEM on the way into the MXU — the weight never exists in
bf16 in HBM, *by construction*. Role on v5e (round-5 measurement): XLA's
convert+dot streams per-channel fp8 at ~hardware rate without materializing
a bf16 copy either, so plain-GEMM serving defaults to ``impl="xla"``
(``quant/dot.py``); this kernel is the MX-block-scale path (scales vary
along K — XLA would materialize the dequantized operand) and the
guaranteed-residency option (``LLM_FP8_QDOT=fused``).

Three scale modes, matching the quantization granularities in
``llm_fp8_tpu.quant``:
  * ``tensor``  — one scalar scale, applied to the output tile.
  * ``channel`` — per-output-channel ``[N]`` scale, applied to the output tile
                  (exact: scale constant along K).
  * ``mx``      — OCP MX ``[K/32, N]`` power-of-two scales; the weight tile is
                  dequantized before the dot (scales vary along K).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_fp8_tpu.quant.qtensor import QTensor, MX_BLOCK
from llm_fp8_tpu.kernels._common import e4m3_to_bf16_ftz

__all__ = ["quant_matmul", "qdot_fused"]


def _dequant_to(w: jax.Array, dtype, *, exact: Optional[bool] = None) -> jax.Array:
    """fp8 → bf16 tile dequantization.

    Default route is the shift+multiply construction
    (:func:`.._common.e4m3_to_bf16_ftz`) — ~1.5× the exact select chain on
    v5e, where fp8 converts are software on the VPU. It flushes e4m3
    subnormal codes (|x| < 2^-6) to ±0; ``quantize_params`` guarantees the
    serving weights contain none (``flush_subnormal=True`` at the scale-
    baking pass), so the route is bit-exact vs ``astype`` on every code the
    framework stores (tested). For externally-produced fp8 payloads that may
    carry subnormal codes, pin ``LLM_FP8_DEQUANT=exact`` (read at trace
    time) to restore the select-based exact chain: normals assembled into
    bf16 bit patterns (``exp_bf16 = exp_e4m3 + 120``), subnormals via exact
    integer→float of the mantissa.
    """
    if w.dtype == jnp.float8_e4m3fn and dtype == jnp.bfloat16:
        if exact is None:
            import os

            exact = os.environ.get("LLM_FP8_DEQUANT", "ftz") == "exact"
        if not exact:
            return e4m3_to_bf16_ftz(w)
        i32 = pltpu.bitcast(w, jnp.uint8).astype(jnp.int32)
        sign = jnp.left_shift(jnp.bitwise_and(i32, 0x80), 8)
        em = jnp.bitwise_and(i32, 0x7F)
        body = jnp.left_shift(em, 4) + (120 << 7)
        normal16 = jnp.bitwise_or(sign, body).astype(jnp.uint16)
        bf = pltpu.bitcast(normal16, jnp.bfloat16)
        sub = (em.astype(jnp.float32) * (2.0 ** -9)).astype(jnp.bfloat16)
        sub = jnp.where(sign != 0, -sub, sub)
        return jnp.where(em >= 8, bf, sub)
    return w.astype(dtype)


def _kernel_tensor_or_channel(
    x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k_tiles: int
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...],
        _dequant_to(w_ref[...], x_ref.dtype),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k_tiles - 1)
    def _():
        # scale_ref: [1, bn] (channel) or [1, 1] (tensor); broadcasts either way.
        o_ref[...] = (
            acc_ref[...] * scale_ref[...].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _kernel_mx(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k_tiles: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # scale_ref: [bk // 32, bn] — element-repeat each scale row over its
    # 32-row block ([s0,s1,…] → [s0×32, s1×32, …]; note pltpu.repeat is
    # tile-repeat, which would interleave wrongly).
    scales = jnp.repeat(
        scale_ref[...].astype(x_ref.dtype), MX_BLOCK, axis=0
    )
    w = _dequant_to(w_ref[...], x_ref.dtype) * scales
    acc_ref[...] += jax.lax.dot(
        x_ref[...], w, preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k_tiles - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


from ._common import pad_to_multiple as _pad_axis  # noqa: E402


@functools.partial(
    jax.jit,
    static_argnames=("mode", "block_m", "block_n", "block_k", "out_dtype",
                     "interpret"),
)
def quant_matmul(
    x: jax.Array,  # [M, K] bf16/f32
    w_q: jax.Array,  # [K, N] fp8
    scale: jax.Array,  # mode-dependent: [1,1] | [1,N] | [K/32, N]
    *,
    mode: str,
    block_m: Optional[int] = None,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2, (x.shape, w_q.shape)
    out_dtype = out_dtype or x.dtype

    # Decode has tiny M: clamp the M tile to the (padded) batch, rounded to
    # the bf16 sublane multiple (16).
    if block_m is None:
        block_m = min(128, -(-max(16, M) // 16) * 16)
    block_k = min(block_k, K)
    block_n = min(block_n, N)

    xp = _pad_axis(_pad_axis(x, 0, block_m), 1, block_k)
    wp = _pad_axis(_pad_axis(w_q, 0, block_k), 1, block_n)
    Mp, Kp = xp.shape
    Np = wp.shape[1]
    n_k_tiles = Kp // block_k
    grid = (Mp // block_m, Np // block_n, n_k_tiles)

    if mode == "mx":
        scale = _pad_axis(_pad_axis(scale, 0, block_k // MX_BLOCK), 1, block_n)
        scale_spec = pl.BlockSpec(
            (block_k // MX_BLOCK, block_n), lambda i, j, k: (k, j)
        )
        kernel = functools.partial(_kernel_mx, n_k_tiles=n_k_tiles)
    elif mode in ("tensor", "channel"):
        if mode == "channel":
            scale = _pad_axis(scale.reshape(1, -1), 1, block_n)
            scale_spec = pl.BlockSpec((1, block_n), lambda i, j, k: (0, j))
        else:
            scale = scale.reshape(1, 1)
            scale_spec = pl.BlockSpec((1, 1), lambda i, j, k: (0, 0))
        kernel = functools.partial(
            _kernel_tensor_or_channel, n_k_tiles=n_k_tiles
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            scale_spec,
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=Mp * Kp * x.dtype.itemsize + Kp * Np + Mp * Np * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wp, scale)
    return out[:M, :N]


def qdot_fused(x: jax.Array, w: QTensor, *, out_dtype=None) -> jax.Array:
    """``x [..., K] @ w [K, N]`` via the fused kernel; QTensor-aware wrapper.

    Accepts the same QTensors as :func:`llm_fp8_tpu.quant.qdot` (per-tensor,
    per-channel with scale ``[1, N]``, or MX with ``block_axis`` on K).
    """
    *lead, K = x.shape
    x2 = x.reshape(-1, K)
    if w.block_size is not None:
        mode = "mx"
        scale = w.scale.reshape(-1, w.scale.shape[-1])
    elif w.scale.size == 1:
        mode = "tensor"
        scale = w.scale
    else:
        mode = "channel"
        scale = w.scale
    y = quant_matmul(x2, w.qvalue, scale, mode=mode, out_dtype=out_dtype or x.dtype)
    return y.reshape(*lead, w.qvalue.shape[-1])
