"""Single-pass fused amax + quantize Pallas kernel.

The JIT per-channel quantize that feeds the int8-MXU training path
(``quant/dot.py::_q_fwd``) lowers in XLA to a reduce pass (amax) plus an
elementwise pass (scale/round/cast) — the operand streams from HBM twice
before the dot reads the int8 payload. The op-level probe in
``docs/PERF_NOTES.md`` measured that these passes eat most of the int8 dot's
1.4× win (composite 1.08×). This kernel folds the whole thing into one VMEM
pass: each tile is read once, the per-row (or per-column) amax is reduced
in-register, and the rounded int8 payload plus the fp32 scale are written out.

Reference-role note: this is the TPU equivalent of the quantize epilogues
TransformerEngine fuses into its cuBLASLt GEMMs (the reference's FP8 path
quantizes inside ``fp8_autocast``-wrapped modules, ``te_llama.py:76-81``) —
the operand never takes an extra full-precision round trip through memory.

Row variant (``axis=-1``): per-row scales for activations ``[M, K]``
contracted over K. Column variant (``axis=0``): per-column scales for weights
``[K, N]`` contracted over K. Semantics are bit-identical to
``quant.quantize(t, fmt, axes=(axis,))`` (tested) — round-to-nearest-even,
saturating clip, ``scale = max(amax, tiny) / fmt.max * 2^margin``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from llm_fp8_tpu.quant.qtensor import QTensor, Format, _TINY

__all__ = ["quantize_fused"]


def _kernel_rows(x_ref, q_ref, s_ref, *, fmax: float, margin: int,
                 out_dtype):
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(amax, _TINY) / fmax * (2.0 ** margin)
    q = jnp.clip(x / scale, -fmax, fmax)
    if jnp.issubdtype(out_dtype, jnp.integer):
        q = jnp.round(q)
    q_ref[...] = q.astype(out_dtype)
    # Scale block is lane-padded to 128 (Mosaic min-tile rule); broadcast.
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)


def _kernel_cols(x_ref, q_ref, s_ref, *, fmax: float, margin: int,
                 out_dtype):
    x = x_ref[...].astype(jnp.float32)
    # Padded K rows are zero and cannot raise a max of |x| (>= 0 everywhere).
    amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    scale = jnp.maximum(amax, _TINY) / fmax * (2.0 ** margin)
    q = jnp.clip(x / scale, -fmax, fmax)
    if jnp.issubdtype(out_dtype, jnp.integer):
        q = jnp.round(q)
    q_ref[...] = q.astype(out_dtype)
    # Scale block is sublane-padded to 8 (min-tile rule); broadcast.
    s_ref[...] = jnp.broadcast_to(scale, s_ref.shape)


from ._common import pad_to_multiple as _pad_to  # noqa: E402


def _block_rows_for(K: int) -> int:
    # Keep the bf16 tile + f32 working copy within a few MB of VMEM.
    budget = 2 * 1024 * 1024  # bytes for the bf16 input tile
    rows = max(8, budget // (2 * max(K, 1)))
    return min(512, 1 << (rows.bit_length() - 1))


@functools.partial(
    jax.jit, static_argnames=("fmt", "axis", "margin", "interpret")
)
def quantize_fused(
    x: jax.Array,
    fmt: Format,
    *,
    axis: int = -1,
    margin: int = 0,
    interpret: bool = None,
) -> QTensor:
    """One-pass per-channel quantization of a 2-D operand.

    ``axis`` is the axis reduced over for the amax (the contraction axis of
    the dot that will consume the result): ``-1``/``1`` gives per-row scales
    ``[M, 1]``; ``0`` gives per-column scales ``[1, N]``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if x.ndim != 2:
        raise ValueError(f"quantize_fused wants 2-D input, got {x.shape}")
    axis = axis % 2

    if axis == 1:
        # Per-row scales over [M, K]. Zero padding on either axis is inert:
        # |0| never raises an amax, and padded rows/cols are sliced off.
        M, K = x.shape
        xp = _pad_to(_pad_to(x, 1, 128), 0, 8)
        Kp = xp.shape[1]
        block = _block_rows_for(Kp)
        xp = _pad_to(xp, 0, block)
        grid = (xp.shape[0] // block,)
        q, s = pl.pallas_call(
            functools.partial(
                _kernel_rows, fmax=float(fmt.max), margin=margin,
                out_dtype=fmt.dtype,
            ),
            grid=grid,
            in_specs=[pl.BlockSpec((block, Kp), lambda i: (i, 0))],
            out_specs=[
                pl.BlockSpec((block, Kp), lambda i: (i, 0)),
                pl.BlockSpec((block, 128), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(xp.shape, fmt.dtype),
                jax.ShapeDtypeStruct((xp.shape[0], 128), jnp.float32),
            ],
            interpret=interpret,
        )(xp)
        return QTensor(qvalue=q[:M, :K], scale=s[:M, :1], fmt=fmt)

    # axis == 0: per-column scales over [K, N]; tile along N, full-K strips.
    K, N = x.shape
    xp = _pad_to(x, 0, 8)
    Kp = xp.shape[0]
    block = 128
    xp = _pad_to(xp, 1, block)
    grid = (xp.shape[1] // block,)
    q, s = pl.pallas_call(
        functools.partial(
            _kernel_cols, fmax=float(fmt.max), margin=margin,
            out_dtype=fmt.dtype,
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((Kp, block), lambda j: (0, j))],
        out_specs=[
            pl.BlockSpec((Kp, block), lambda j: (0, j)),
            pl.BlockSpec((8, block), lambda j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, fmt.dtype),
            jax.ShapeDtypeStruct((8, xp.shape[1]), jnp.float32),
        ],
        interpret=interpret,
    )(xp)
    return QTensor(qvalue=q[:K, :N], scale=s[:1, :N], fmt=fmt)
