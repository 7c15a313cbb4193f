"""QTensor: a quantized array + scale metadata as a JAX pytree.

This replaces the mutable FP8 tensor state that NVIDIA Transformer Engine keeps
inside module buffers behind ``fp8_autocast`` (reference: ``te_llama.py:76-81``).
Here quantized values and their scales are an explicit, immutable pytree that
flows through ``jit`` like any other array — scales live in checkpoints or in
the train state, never in hidden module state.

Scale convention: ``x ≈ qvalue.astype(f32) * spread(scale)`` — dequantization
multiplies. Quantization divides by the same scale.

Three granularities (mirrors the reference's three recipes, §2a #5-7 of
SURVEY.md):
  * per-tensor  — one scalar scale (TE DelayedScaling).
  * per-axis    — one scale per slice along given axes (a TPU-friendly upgrade
                  the reference lacks; cheap on the VPU, much tighter error).
  * block       — one power-of-two scale per ``block_size`` contiguous elements
                  along one axis (OCP MXFP8, TE MXFP8BlockScaling,
                  ``te_llama_mxfp8.py:28-29``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .formats import Format, E4M3, E8M0

__all__ = [
    "QTensor",
    "quantize",
    "quantize_mx",
    "dequantize",
    "compute_scale",
    "MX_BLOCK",
]

#: OCP MX block size: one shared scale per 32 contiguous elements.
MX_BLOCK = 32

# Smallest normal we allow in an amax before the scale computation; avoids
# log2(0) / division by zero for all-zero tensors.
_TINY = 1e-12


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QTensor:
    """Quantized tensor: fp8 payload + scale, registered as a pytree.

    ``scale`` must be broadcast-compatible with ``qvalue`` after block
    expansion: for per-tensor it is shape ``()`` (stored ``(1,)*ndim``), for
    per-axis it has 1s on the reduced axes, for block scaling it has
    ``shape[block_axis] // block_size`` along ``block_axis``.
    """

    qvalue: jax.Array
    scale: jax.Array
    fmt: Format = dataclasses.field(metadata=dict(static=True))
    block_size: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    block_axis: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    #: int4 nibble packing: when set, ``qvalue`` is int8 with TWO 4-bit values
    #: per byte along this (negative, like block_axis) axis — low nibble =
    #: even logical index, high nibble = odd. ``unpack()`` restores the
    #: logical int8 array. Packed because s4 dtypes are not reliably supported
    #: end-to-end on every backend; two shifts unpack it on the VPU and XLA
    #: fuses them into the consumer.
    pack_axis: Optional[int] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def shape(self):
        return self.qvalue.shape

    @property
    def dtype(self):
        return self.qvalue.dtype

    @property
    def ndim(self):
        return self.qvalue.ndim

    def spread_scale(self) -> jax.Array:
        """Scale expanded so it broadcasts elementwise against ``qvalue``."""
        scale = self.scale.astype(jnp.float32)
        if self.block_size is None:
            return scale
        return jnp.repeat(scale, self.block_size, axis=self.block_axis)

    def unpack(self) -> jax.Array:
        """Logical int8 array from a nibble-packed payload (no-op otherwise)."""
        if self.pack_axis is None:
            return self.qvalue
        return _unpack_int4(self.qvalue, self.pack_axis)

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (self.unpack().astype(jnp.float32) * self.spread_scale()).astype(dtype)

    def nbytes(self) -> int:
        return self.qvalue.size * self.qvalue.dtype.itemsize + self.scale.size * self.scale.dtype.itemsize


def compute_scale(amax: jax.Array, fmt: Format, margin: int = 0) -> jax.Array:
    """Scale from an amax: ``scale = amax / fmt.max * 2^margin``.

    ``margin`` backs the quantization range off by ``margin`` powers of two
    (TE's ``margin`` knob, reference ``train_fp8.py:159-165``) as headroom
    against inter-step amax growth under delayed scaling.
    """
    amax = jnp.maximum(jnp.asarray(amax, jnp.float32), _TINY)
    return amax / fmt.max * (2.0 ** margin)


def _amax(x: jax.Array, axes: Optional[Sequence[int]]) -> jax.Array:
    a = jnp.abs(x.astype(jnp.float32))
    if axes is None:
        return jnp.max(a)
    return jnp.max(a, axis=tuple(axes), keepdims=True)


def _pack_int4(q: jax.Array, axis: int) -> jax.Array:
    """Pack an int8 array of int4-range values two-per-byte along ``axis``.

    SPLIT-HALF byte layout: byte ``i`` holds logical elements ``i`` (low
    nibble) and ``i + n/2`` (high nibble) — NOT adjacent pairs. This makes
    each unpacked half a pure elementwise function of the packed array (two
    shifts, same shape, no interleave/reshape), so consumers can keep the
    unpack inside a fused operand read: ``x @ W = x_lo @ lo(Wp) + x_hi @
    hi(Wp)`` (quant/dot.py::_int4_dot). The interleaved layout's
    stack+reshape forced XLA to materialize the unpacked weights in HBM
    every decode step — measured 0.75x bf16 where int8 does 2.40x.
    """
    axis = axis % q.ndim
    n = q.shape[axis]
    if n % 2 != 0:
        raise ValueError(f"int4 pack axis {axis} has odd length {n}")
    lo = jax.lax.slice_in_dim(q, 0, n // 2, axis=axis)
    hi = jax.lax.slice_in_dim(q, n // 2, n, axis=axis)
    # hi << 4 wraps correctly in int8 for the full [-8, 7] nibble range.
    return ((lo & jnp.int8(0x0F)) | (hi << 4)).astype(jnp.int8)


def _unpack_int4_halves(q: jax.Array) -> tuple:
    """The two logical halves of a packed array, each elementwise in ``q``.

    Arithmetic right shift sign-extends; the ``<<4 >>4`` pair sign-extends
    the low nibble.
    """
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(q, jnp.int8(4)), jnp.int8(4)
    )
    hi = jax.lax.shift_right_arithmetic(q, jnp.int8(4))
    return lo, hi


def _unpack_int4(q: jax.Array, axis: int) -> jax.Array:
    """Inverse of :func:`_pack_int4`: int8 nibbles -> logical int8 array."""
    lo, hi = _unpack_int4_halves(q)
    return jnp.concatenate([lo, hi], axis=axis % q.ndim)


def _flush_e4m3_subnormal(q: jax.Array, fmt: Format) -> jax.Array:
    """Round e4m3 subnormal codes (|x| < 2^-6) to ±0 (see ``quantize``)."""
    if fmt.dtype != jnp.float8_e4m3fn:
        return q
    sub = jnp.abs(q.astype(jnp.float32)) < 2.0 ** -6
    return jnp.where(sub, jnp.zeros_like(q), q)


def quantize(
    x: jax.Array,
    fmt: Format = E4M3,
    *,
    axes: Optional[Sequence[int]] = None,
    scale: Optional[jax.Array] = None,
    margin: int = 0,
    group_size: Optional[int] = None,
    flush_subnormal: bool = False,
) -> QTensor:
    """Per-tensor (``axes=None``) or per-axis quantization.

    ``axes`` are the axes *reduced over* when computing the amax — e.g. for a
    weight ``[in, out]`` contracted over ``in``, ``axes=(0,)`` gives one scale
    per output channel. Pass ``scale`` to reuse a precomputed (e.g. delayed)
    scale instead of the just-in-time amax.

    ``flush_subnormal`` (weight scale-baking passes set it) rounds values
    that would land on e4m3 subnormal codes (|q| < 2^-6, i.e. below
    ~amax/28672 at per-channel scaling — beneath e4m3's own quantization
    error) to ±0, so the stored codes dequantize bit-exactly through the
    fused kernel's fast FTZ route (``kernels._common.e4m3_to_bf16_ftz``).
    Training-recipe quantizations (delayed scales) leave it off: they ride
    the XLA/native dots, which convert subnormals exactly.

    ``group_size`` subdivides the single reduction axis into groups that each
    get their own (float, not power-of-two) scale — the standard int4 serving
    granularity (GPTQ/AWQ-style symmetric groups): per-channel int4's 15
    levels are too coarse across a whole contraction, per-group recovers most
    of the accuracy for ~3% extra bytes at g=128. Falls back to per-axis when
    the axis is not divisible by the group size.
    """
    x32 = x.astype(jnp.float32)
    if (
        group_size is not None
        and scale is None
        and axes is not None
        and len(axes) == 1
        and x.shape[axes[0] % x.ndim] % group_size == 0
    ):
        return _quantize_grouped(x32, fmt, axes[0] % x.ndim, group_size, margin)
    if scale is None:
        scale = compute_scale(_amax(x32, axes), fmt, margin)
    else:
        scale = jnp.asarray(scale, jnp.float32)
    # Clip into the representable range: values that outgrow a delayed scale
    # must saturate, not overflow to inf/nan (e4m3fn has no inf encoding).
    q = jnp.clip(x32 / scale, -fmt.max, fmt.max)
    if jnp.issubdtype(fmt.dtype, jnp.integer):
        # float→int astype truncates toward zero; int8 needs round-to-nearest.
        q = jnp.round(q)
    q = q.astype(fmt.dtype)
    q = _flush_e4m3_subnormal(q, fmt) if flush_subnormal else q
    if scale.ndim == 0:
        scale = scale.reshape((1,) * x.ndim)
    if fmt.name == "int4":
        # Nibble-pack along the contraction axis (the single reduced axis).
        # Stored negative, like block_axis, so the QTensor stays valid when
        # lax.scan peels leading layer axes off a stacked [L, K, N] leaf.
        if axes is None or len(axes) != 1:
            raise ValueError(
                "int4 quantization needs exactly one reduction axis "
                "(the contraction) to pack along"
            )
        pack_axis = axes[0] % x.ndim
        return QTensor(
            qvalue=_pack_int4(q, pack_axis), scale=scale, fmt=fmt,
            pack_axis=pack_axis - x.ndim,
        )
    return QTensor(qvalue=q, scale=scale, fmt=fmt)


def _quantize_grouped(
    x32: jax.Array, fmt: Format, axis: int, group_size: int, margin: int
) -> QTensor:
    """Per-group scales along ``axis`` (float scales, one per group).

    Same block layout as MX (scale axis = ``shape[axis] // group_size``),
    but with exact float scales rather than power-of-two — int4 needs the
    tighter fit. int4 payloads come back nibble-packed.
    """
    n = x32.shape[axis]
    split = x32.shape[:axis] + (n // group_size, group_size) + x32.shape[axis + 1 :]
    xb = x32.reshape(split)
    amax = jnp.max(jnp.abs(xb), axis=axis + 1)  # [..., n//g, ...]
    scale = compute_scale(amax, fmt, margin)
    q = jnp.clip(xb / jnp.expand_dims(scale, axis + 1), -fmt.max, fmt.max)
    if jnp.issubdtype(fmt.dtype, jnp.integer):
        q = jnp.round(q)
    q = q.astype(fmt.dtype).reshape(x32.shape)
    pack_axis = None
    if fmt.name == "int4":
        q = _pack_int4(q, axis)
        pack_axis = axis - x32.ndim
    return QTensor(
        qvalue=q,
        scale=scale,
        fmt=fmt,
        block_size=group_size,
        block_axis=axis - x32.ndim,
        pack_axis=pack_axis,
    )


def quantize_mx(
    x: jax.Array,
    fmt: Format = E4M3,
    *,
    block_axis: int = -1,
    block_size: int = MX_BLOCK,
    flush_subnormal: bool = False,
) -> QTensor:
    """OCP MX block quantization: shared power-of-two scale per block.

    Matches TE's ``MXFP8BlockScaling`` semantics (32-element blocks, E8M0
    scales; reference ``te_llama_mxfp8.py:28-29``): the shared exponent is
    chosen so the block amax maps onto the element format's largest
    power-of-two, i.e. ``shared_exp = floor(log2(amax)) - emax(fmt)``.
    """
    block_axis = block_axis % x.ndim
    n = x.shape[block_axis]
    if n % block_size != 0:
        raise ValueError(
            f"axis {block_axis} size {n} not divisible by block_size {block_size}"
        )
    x32 = x.astype(jnp.float32)
    # [..., n, ...] -> [..., n//B, B, ...] with the block dim right after axis.
    split_shape = (
        x.shape[:block_axis] + (n // block_size, block_size) + x.shape[block_axis + 1 :]
    )
    xb = x32.reshape(split_shape)
    amax = jnp.max(jnp.abs(xb), axis=block_axis + 1)
    # Power-of-two shared scale (exact in e8m0).
    emax_elem = jnp.floor(jnp.log2(jnp.asarray(fmt.max, jnp.float32)))
    shared_exp = jnp.floor(jnp.log2(jnp.maximum(amax, _TINY))) - emax_elem
    # e8m0 exponent range is [-127, 127]; clamp so the stored scale round-trips.
    shared_exp = jnp.clip(shared_exp, -127.0, 127.0)
    scale = jnp.exp2(shared_exp)
    q = jnp.clip(xb / jnp.expand_dims(scale, block_axis + 1), -fmt.max, fmt.max)
    q = q.astype(fmt.dtype).reshape(x.shape)
    q = _flush_e4m3_subnormal(q, fmt) if flush_subnormal else q
    # E8M0 semantics (pure power-of-two shared exponent) stored as bfloat16:
    # bf16 has the full f32 exponent range so every e8m0 value round-trips
    # exactly, and — unlike f8e8m0 — the TPU compiler supports it natively.
    #
    # block_axis is stored negative (relative to the trailing dims) so the
    # QTensor stays valid when leading axes are sliced away — e.g. lax.scan
    # peeling one layer off a stacked [L, K, N] weight leaf.
    return QTensor(
        qvalue=q,
        scale=scale.astype(jnp.bfloat16),
        fmt=fmt,
        block_size=block_size,
        block_axis=block_axis - x.ndim,
    )


def dequantize(q: QTensor, dtype=jnp.float32) -> jax.Array:
    return q.dequantize(dtype)
