"""Quantized matmuls: the functional replacement for TE's FP8 GEMMs.

Reference behavior being reproduced: inside ``fp8_autocast`` TE quantizes both
GEMM operands to the recipe's forward format, runs the FP8 GEMM, and in the
backward pass quantizes gradients to the backward format
(``te_llama.py:76-81`` + TE internals). Here that is one pure function with a
``custom_vjp``:

  * forward operands quantized to ``recipe.fmt_fwd`` with *delayed* scales
    passed in explicitly (from :mod:`.delayed` state);
  * residuals saved **in FP8** (same memory saving TE gets);
  * backward gradient quantized to ``recipe.fmt_bwd`` with just-in-time
    scaling;
  * new amax observations returned to the caller — the backward-pass amax
    rides out through the cotangent of a zero-valued ``amax_sink`` argument,
    so delayed state for gradients can be maintained without any mutable
    buffers.

The math here is the *semantics* path (quantize → dequantize → MXU bf16 dot),
which XLA fuses well; the bandwidth-optimal fused dequant-matmul lives in
``llm_fp8_tpu.kernels.quant_matmul`` and is dispatched for the serving path.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .formats import E4M3, Format
from .qtensor import QTensor, quantize, quantize_mx, compute_scale, MX_BLOCK
from .recipe import Recipe

__all__ = ["qdot", "fp8_dot", "DotAmaxes"]


class DotAmaxes(NamedTuple):
    """Amax observations from one quantized dot, fed back into delayed state.

    ``g`` is only populated via the amax-sink cotangent (see module doc);
    in the primal output it is zero.
    """

    x: jax.Array
    w: jax.Array
    g: jax.Array


# --------------------------------------------------------------------------
# Inference path: weight-only / weight+act dequant-matmul on a prequantized w.
# --------------------------------------------------------------------------


def qdot(
    x: jax.Array, w: QTensor, *, out_dtype=None, impl: Optional[str] = None
) -> jax.Array:
    """``x [..., K] @ w [K, N]`` with ``w`` stored quantized.

    ``impl``: "fused" (Pallas dequant-matmul kernel — weights stream from HBM
    as fp8, the bandwidth-optimal serving path), "xla" (jnp composition),
    "fp8native" (quantize ``x`` just-in-time to e4m3 and run the dot with
    fp8 operands on the MXU — the cuBLASLt-FP8-GEMM equivalent, only a win
    where fp8 MXU exists), or None → fp8native on fp8-native backends with
    fp8 weights, xla elsewhere.

    XLA path: per-tensor / per-output-channel scales are applied *after* the
    matmul (mathematically exact, keeps the MXU operand narrow); block (MX)
    scales vary along the contraction axis, so the operand is dequantized
    first and XLA fuses the expand+multiply into the dot's operand read.
    """
    fp8_weight = (w.qvalue.dtype in _FP8_DTYPES and w.block_size is None
                  and w.pack_axis is None and _scale_is_post_applicable(w))
    if impl is None:
        import os

        # Default "xla" on today's chips: XLA fuses the e4m3->bf16 convert
        # into the dot's operand read at ~hardware stream rate (round-5
        # measurement: 3B decode 2605 tok/s vs the fused kernel's 1390,
        # with no materialized bf16 weight copy probed up to 8B/b28 —
        # docs/PERF_NOTES.md). The fused kernel remains the MX-mode path
        # and the explicit choice where fp8 residency must be guaranteed
        # against any future hoisting. On fp8-native MXUs the
        # narrow-operand dot is the default. Override with LLM_FP8_QDOT.
        default = "fp8native" if (fp8_weight and _native_fp8_enabled()) \
            else "xla"
        impl = os.environ.get("LLM_FP8_QDOT", default)
        if impl == "fp8native" and "LLM_FP8_QDOT" not in os.environ:
            _warn_fp8native_autoselect()
    if impl == "fp8native" and fp8_weight:
        # Just-in-time per-channel activation quantize (one VPU amax pass)
        # feeding an e4m3 x e4m3 -> f32 dot_general; both scales constant
        # along the contraction, applied after the f32 accumulation.
        xq = _quantize_channel(x, E4M3, x.ndim - 1, margin=0)
        return _narrow_dot(xq, w, out_dtype or x.dtype, "fp8")
    if impl == "fused" and w.pack_axis is None:
        from llm_fp8_tpu.kernels.quant_matmul import qdot_fused

        return qdot_fused(x, w, out_dtype=out_dtype)
    out_dtype = out_dtype or x.dtype
    if w.pack_axis is not None and w.pack_axis % w.ndim == w.ndim - 2:
        y = _int4_dot(x, w)
        if y is not None:
            return y.astype(out_dtype)
    if w.block_size is None and _scale_is_post_applicable(w):
        # unpack() restores the logical K for nibble-packed int4 (two shift
        # ops XLA fuses into the dot's operand read); no-op otherwise.
        y = jnp.dot(
            x, w.unpack().astype(x.dtype), preferred_element_type=jnp.float32
        )
        # scale is () or [1, ..., N]: flatten so it broadcasts over y's last dim.
        y = y * w.scale.astype(jnp.float32).reshape(-1)
        return y.astype(out_dtype)
    return jnp.dot(
        x, w.dequantize(x.dtype), preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _int4_dot(x: jax.Array, w: QTensor):
    """``x [..., K] @ w`` for split-half nibble-packed int4 weights.

    The pack layout (quant/qtensor.py::_pack_int4) stores logical elements
    ``i`` and ``i + K/2`` in one byte, so each half of W is a PURE
    ELEMENTWISE function of the packed array — two shifts, no reshape — and
    the dot decomposes as ``x_lo @ lo + x_hi @ hi`` with both unpacks fused
    into the MXU operand reads (the int8→bf16 convert is hardware on v5e).
    An interleaved layout would need a stack+reshape that XLA materializes
    in HBM every step (measured 0.75× bf16 decode where int8 does 2.40×).

    Returns None when this path can't apply (oddly-aligned group scales) —
    caller falls back to the dequantize-first dot.
    """
    from .qtensor import _unpack_int4_halves

    lo, hi = _unpack_int4_halves(w.qvalue)
    kh = w.qvalue.shape[-2]  # packed K/2
    x_lo, x_hi = x[..., :kh], x[..., kh:]
    if w.block_size is None and _scale_is_post_applicable(w):
        y = jnp.dot(x_lo, lo.astype(x.dtype), preferred_element_type=jnp.float32)
        y = y + jnp.dot(x_hi, hi.astype(x.dtype), preferred_element_type=jnp.float32)
        return y * w.scale.astype(jnp.float32).reshape(-1)
    if w.block_size is not None and w.scale.ndim == 2:
        # Group scales [G, N] vary along K: contract each group separately
        # (one batched MXU einsum per half), post-apply the group's scale to
        # its [..., G?, N] partial, then sum over groups — mathematically
        # exact, and the [..., G/2, N] partials are tiny next to the weights.
        g = w.block_size
        if kh % g != 0:
            return None  # group straddles the half boundary — slow path
        gh = kh // g
        n = w.qvalue.shape[-1]
        s = w.scale.astype(jnp.float32)
        lead = x.shape[:-1]
        # CPU's batched-dot thunk can't mix bf16 operands with an f32
        # accumulator; TPU can (and wants the narrow MXU operands).
        cd = x.dtype if jax.default_backend() != "cpu" else jnp.float32

        def half(xp, wp, sp):
            xg = xp.astype(cd).reshape(*lead, gh, g)
            wg = wp.astype(cd).reshape(gh, g, n)
            yg = jnp.einsum("...gk,gkn->...gn", xg, wg,
                            preferred_element_type=jnp.float32)
            return jnp.sum(yg * sp, axis=-2)

        return half(x_lo, lo, s[:gh]) + half(x_hi, hi, s[gh:])
    return None


def _scale_is_post_applicable(w: QTensor) -> bool:
    # Scale must be constant along the contraction (first) axis of w [K, N].
    return w.scale.ndim == 0 or all(
        d == 1 for d in w.scale.shape[:-1]
    )


# --------------------------------------------------------------------------
# Training path: quantize-both-operands dot with custom VJP.
# --------------------------------------------------------------------------


def _use_fused_quantize() -> bool:
    # Opt-in single-pass Pallas amax+quantize (kernels/quantize.py): the
    # operand streams from HBM once instead of twice. Off by default until
    # the TPU measurement confirms the win (docs/PERF_NOTES.md agenda).
    # Read at TRACE time (like LLM_FP8_QDOT): set it before the first
    # compile — flipping it later has no effect on cached executables.
    import os

    return os.environ.get("LLM_FP8_QUANTIZE", "xla") == "pallas"


def _quantize_channel(t: jax.Array, fmt, contract_axis: int,
                      margin: int) -> QTensor:
    """Per-channel quantize, via the fused Pallas kernel when enabled.

    VMEM guards: the kernel holds a full contraction strip per tile (the
    amax needs the whole reduced axis in one block), so oversized strips
    fall back to the XLA two-pass path — the row variant shrinks its row
    block down to 8 (strip ≈ 7·K bytes), the column variant is pinned at
    128 lanes (strip ≈ 900·K bytes, so K caps much lower).
    """
    if _use_fused_quantize():
        from llm_fp8_tpu.kernels.quantize import quantize_fused

        if contract_axis == t.ndim - 1 and t.shape[-1] <= 65536:
            t2 = t.reshape(-1, t.shape[-1])
            q = quantize_fused(t2, fmt, axis=-1, margin=margin)
            return QTensor(
                qvalue=q.qvalue.reshape(t.shape),
                scale=q.scale.reshape(t.shape[:-1] + (1,)),
                fmt=fmt,
            )
        if t.ndim == 2 and contract_axis == 0 and t.shape[0] <= 4096:
            return quantize_fused(t, fmt, axis=0, margin=margin)
        # Fall through for layouts/sizes the kernel doesn't cover.
    return quantize(t, fmt, axes=(contract_axis,), margin=margin)


def _q_fwd(t: jax.Array, recipe: Recipe, scale, contract_axis: int) -> QTensor:
    """Quantize a forward operand according to the recipe granularity."""
    if recipe.granularity == "block32":
        return quantize_mx(t, recipe.fmt_fwd, block_axis=contract_axis,
                           block_size=MX_BLOCK)
    if recipe.granularity == "channel":
        # Per-channel is always just-in-time: the per-slice amaxes are one
        # VPU reduction (cheap on TPU), strictly tighter than a delayed
        # scalar, and keep the scale constant along the contraction so it
        # post-applies after the dot (required by the native int8 path).
        return _quantize_channel(t, recipe.fmt_fwd, contract_axis,
                                 recipe.margin)
    return quantize(t, recipe.fmt_fwd, axes=None, scale=scale,
                    margin=recipe.margin)


def _q_bwd(g: jax.Array, recipe: Recipe, contract_axis: int) -> QTensor:
    """Quantize a gradient: just-in-time scale in the backward format."""
    if (recipe.granularity == "block32"
            and g.shape[contract_axis] % MX_BLOCK == 0):
        return quantize_mx(g, recipe.fmt_bwd, block_axis=contract_axis,
                           block_size=MX_BLOCK)
    # Non-block recipes, and the block recipe on axes not divisible by the
    # block size (e.g. a ragged batch axis in dw), use per-tensor scaling.
    if recipe.granularity == "channel":
        return _quantize_channel(g, recipe.fmt_bwd, contract_axis,
                                 recipe.margin)
    return quantize(g, recipe.fmt_bwd, axes=None, margin=recipe.margin)


def _mx_or_tensor(t: jax.Array, fmt, block_axis: int) -> QTensor:
    if t.shape[block_axis] % MX_BLOCK == 0:
        return quantize_mx(t, fmt, block_axis=block_axis, block_size=MX_BLOCK)
    return quantize(t, fmt)


_FP8_DTYPES = (jnp.float8_e4m3fn, jnp.float8_e5m2)


_FP8NATIVE_WARNED = False


def _warn_fp8native_autoselect() -> None:
    """One-time notice when qdot auto-selects the fp8-operand route.

    The route quantizes activations just-in-time to e4m3 (per-channel), so
    the same weights produce slightly different logits than the dequant-to-
    bf16 route (bounded ~3% rel per matmul in tests). Auto-selection only
    happens on fp8-MXU backends; this notice makes the switch visible so a
    serving deployment can pin ``LLM_FP8_QDOT=xla`` if it wants bit-stable
    cross-chip logits.
    """
    global _FP8NATIVE_WARNED
    if _FP8NATIVE_WARNED:
        return
    _FP8NATIVE_WARNED = True
    import logging

    logging.getLogger("llm_fp8_tpu").warning(
        "qdot: auto-selected the fp8-operand MXU route (backend reports "
        "native fp8 matmul). Activations are quantized to e4m3 just-in-time;"
        " logits differ slightly from the dequant route. Pin LLM_FP8_QDOT="
        "xla (or fp8native) to silence this notice and fix the route."
    )


def _native_fp8_enabled() -> bool:
    """fp8-operand ``dot_general`` route gate.

    Default: on when the backend's MXU multiplies fp8 natively
    (:func:`llm_fp8_tpu.utils.backend.native_fp8_matmul` — v6e-class+; on
    v5e the dequant-to-bf16 route is strictly faster because fp8 arithmetic
    would be VPU software). Override with ``LLM_FP8_NATIVE_DOT=1|0`` — read
    at trace time, like ``LLM_FP8_QDOT``.
    """
    import os

    env = os.environ.get("LLM_FP8_NATIVE_DOT")
    if env is not None:
        return env == "1"
    from llm_fp8_tpu.utils.backend import native_fp8_matmul

    return native_fp8_matmul()


def _native_mode(recipe: Recipe) -> Optional[str]:
    """Which narrow-operand MXU route the recipe's dots can take.

    ``"int"``: int8 x int8 -> int32. v5e's MXU executes this at ~2x its bf16
    FLOP rate (394 TOPS vs 197 TFLOP/s) — the TPU's native narrow-precision
    compute path, playing the role of the reference hardware's fp8 tensor
    cores (``paper/conference_101719.tex:247``).

    ``"fp8"``: e4m3/e5m2 x e4m3/e5m2 -> f32 via ``lax.dot_general`` with
    fp8 operands and ``preferred_element_type=f32`` — the TPU equivalent of
    the reference's cuBLASLt FP8 GEMM (TE inside ``fp8_autocast``,
    ``te_llama.py:76-81``), selected only where fp8 MXU exists (see
    :func:`_native_fp8_enabled`).

    ``None``: the semantics route (quantize -> dequantize -> bf16 dot).

    Both narrow routes require scales constant along the contraction
    (tensor/channel granularity), so they post-apply exactly after the
    wide-accumulator dot, and quantized activations on both passes.
    """
    if not (recipe.quantize_activations
            and recipe.granularity in ("tensor", "channel")):
        return None
    if (jnp.issubdtype(recipe.fmt_fwd.dtype, jnp.integer)
            and jnp.issubdtype(recipe.fmt_bwd.dtype, jnp.integer)):
        return "int"
    if (recipe.fmt_fwd.dtype in _FP8_DTYPES
            and recipe.fmt_bwd.dtype in _FP8_DTYPES
            and _native_fp8_enabled()):
        return "fp8"
    return None


def _native_int(recipe: Recipe) -> bool:
    return _native_mode(recipe) == "int"


def _acc_dtype(mode: str):
    return jnp.int32 if mode == "int" else jnp.float32


def _narrow_dot(aq: QTensor, bq: QTensor, out_dtype, mode: str) -> jax.Array:
    """``a [..., K] @ b [K, N]`` with narrow MXU operands, scales after.

    Both scales are constant along the contraction (enforced by the callers'
    quantization axes), so ``(a*sa) @ (b*sb) == (a@b) * sa * sb`` exactly —
    the wide accumulation (int32 / f32) makes this *more* precise than the
    semantics path's dequantize-to-bf16 dot.
    """
    acc = jax.lax.dot_general(
        aq.qvalue, bq.qvalue,
        dimension_numbers=(((aq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=_acc_dtype(mode),
    )
    # aq.scale has a trailing 1 on the contraction axis -> broadcasts over
    # [..., N]; bq.scale is [1, N] (or all-1s) -> flatten to align trailing.
    y = (acc.astype(jnp.float32)
         * aq.scale.astype(jnp.float32)
         * bq.scale.astype(jnp.float32).reshape(-1))
    return y.astype(out_dtype)


def _int_dot(aq: QTensor, bq: QTensor, out_dtype) -> jax.Array:
    return _narrow_dot(aq, bq, out_dtype, "int")


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def fp8_dot(x, w, x_scale, w_scale, amax_sink, recipe: Recipe):
    """FP8 training matmul: ``x [B, K] @ w [K, N] -> ([B, N], DotAmaxes)``.

    ``x_scale`` / ``w_scale`` are delayed scales (scalars) from
    :class:`~llm_fp8_tpu.quant.delayed.ScaleState`; pass ``None`` for
    just-in-time scaling. ``amax_sink`` must be a zero scalar with
    ``jnp.zeros(())``; its *gradient* after ``jax.grad`` equals the backward
    amax observed for this dot.
    """
    y, amaxes = _fp8_dot_fwd_impl(x, w, x_scale, w_scale, recipe)
    del amax_sink
    return y, amaxes


def _amax_of(t):
    return jnp.max(jnp.abs(t.astype(jnp.float32)))


def _fp8_dot_fwd_impl(x, w, x_scale, w_scale, recipe):
    x_amax, w_amax = _amax_of(x), _amax_of(w)
    wq = _q_fwd(w, recipe, w_scale, contract_axis=0)
    mode = _native_mode(recipe)
    if mode:
        xq = _q_fwd(x, recipe, x_scale, contract_axis=x.ndim - 1)
        y = _narrow_dot(xq, wq, x.dtype, mode)
    elif recipe.quantize_activations:
        xq = _q_fwd(x, recipe, x_scale, contract_axis=x.ndim - 1)
        xv = xq.dequantize(jnp.bfloat16)
        y = jnp.dot(xv, wq.dequantize(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        y = jnp.dot(x.astype(jnp.bfloat16), wq.dequantize(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    return y, DotAmaxes(x=x_amax, w=w_amax, g=jnp.zeros((), jnp.float32))


def _fp8_dot_fwd(x, w, x_scale, w_scale, amax_sink, recipe):
    del amax_sink
    x_amax, w_amax = _amax_of(x), _amax_of(w)
    wq = _q_fwd(w, recipe, w_scale, contract_axis=0)
    if recipe.quantize_activations:
        xq = _q_fwd(x, recipe, x_scale, contract_axis=x.ndim - 1)
        x_res = xq
    else:
        x_res = x
    mode = _native_mode(recipe)
    if mode:
        # Name the quantized residuals so a jax.checkpoint policy can keep
        # them across the remat boundary (models.llama._remat_policy "dots"):
        # the saved payloads are 1-byte — HALF the activation memory a bf16
        # policy-saved operand would take — and the backward then reuses them
        # instead of re-running the quantize+dot forward.
        x_res = dataclasses.replace(
            x_res,
            qvalue=checkpoint_name(x_res.qvalue, "qdot_res"),
            scale=checkpoint_name(x_res.scale, "qdot_res"),
        )
        wq = dataclasses.replace(
            wq,
            qvalue=checkpoint_name(wq.qvalue, "qdot_res"),
            scale=checkpoint_name(wq.scale, "qdot_res"),
        )
        y = _narrow_dot(x_res, wq, x.dtype, mode)
        y = checkpoint_name(y, "qdot_out")
    else:
        y = jnp.dot(
            x_res.dequantize(jnp.bfloat16) if isinstance(x_res, QTensor)
            else x_res.astype(jnp.bfloat16),
            wq.dequantize(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    amaxes = DotAmaxes(x=x_amax, w=w_amax, g=jnp.zeros((), jnp.float32))
    # Residuals are the FP8 payloads, not the bf16 operands — same activation
    # memory saving TE realizes by saving quantized copies for backward.
    # Zero-size arrays carry the operand dtypes (residual pytrees must be
    # arrays, not dtype objects).
    return (y, amaxes), (x_res, wq, jnp.zeros((0,), x.dtype), jnp.zeros((0,), w.dtype))


def _fp8_dot_bwd(recipe: Recipe, res, cts):
    x_res, wq, x_proto, w_proto = res
    x_dtype, w_dtype = x_proto.dtype, w_proto.dtype
    gy, _ = cts  # cotangent of amaxes is zero/unused
    g_amax = _amax_of(gy)

    mode = _native_mode(recipe)
    if mode:
        # Both backward GEMMs with narrow MXU operands (int8 or fp8),
        # contracting the *stored* 1-byte residuals directly — no
        # dequantize, no transpose, no requantize.
        # The trick is scale folding: the residual's per-channel scale varies
        # along the backward contraction, so it cannot post-apply — but it
        # CAN fold into the gradient elementwise before the gradient is
        # quantized (g·s then absorbs it into g's own JIT scale):
        #   dx[..,k] = Σ_n g[..,n]·(w8[k,n]·s_w[n]) = Σ_n (g·s_w)[..,n]·w8[k,n]
        #   dw[k,n]  = Σ_b (x8[b,k]·s_x[b])·g[b,n] = Σ_b x8[b,k]·(g·s_x)[b,n]
        gy32 = gy.astype(jnp.float32)
        acc_t = _acc_dtype(mode)

        # dx = (g * s_w) @ w8^T, contraction over N with w8 in its stored
        # [K, N] layout (dot_general contracts n<->n; no transpose pass).
        g_dx = gy32 * wq.scale.astype(jnp.float32).reshape(-1)
        gq_dx = _quantize_channel(g_dx, recipe.fmt_bwd, g_dx.ndim - 1,
                                  recipe.margin)
        acc = jax.lax.dot_general(
            gq_dx.qvalue, wq.qvalue,
            dimension_numbers=(((gq_dx.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=acc_t,
        )
        dx = (acc.astype(jnp.float32) * gq_dx.scale).astype(x_dtype)

        # dw = x8^T @ (g * s_x), contraction over the batch rows with x8 in
        # its stored [..., K] layout.
        x8 = x_res.qvalue.reshape(-1, x_res.shape[-1])
        g_dw = (gy32 * x_res.scale.astype(jnp.float32)).reshape(
            -1, gy.shape[-1])
        gq_dw = _quantize_channel(g_dw, recipe.fmt_bwd, 0, recipe.margin)
        acc = jax.lax.dot_general(
            x8, gq_dw.qvalue,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        )
        dw = (acc.astype(jnp.float32)
              * gq_dw.scale.astype(jnp.float32).reshape(-1)).astype(w_dtype)

        zero = jnp.zeros((), jnp.float32)
        return dx, dw, zero, zero, g_amax

    xv = (x_res.dequantize(jnp.bfloat16) if isinstance(x_res, QTensor)
          else x_res.astype(jnp.bfloat16))
    wv = wq.dequantize(jnp.bfloat16)

    # dx = g @ w^T — contraction over N, so the gradient quantizes with its
    # blocks/channels along the last axis, and w is requantized transposed for
    # the block recipe (TE keeps both orientations of each MX tensor).
    gq_for_dx = _q_bwd(gy, recipe, contract_axis=gy.ndim - 1)
    if recipe.granularity == "block32":
        wT = _mx_or_tensor(wv.T.astype(jnp.float32), recipe.fmt_bwd,
                           block_axis=wv.T.ndim - 1).dequantize(jnp.bfloat16)
    else:
        wT = wv.T
    dx = jnp.dot(gq_for_dx.dequantize(jnp.bfloat16), wT,
                 preferred_element_type=jnp.float32).astype(x_dtype)

    # dw = x^T @ g — contraction over the batch axis.
    x2 = xv.reshape(-1, xv.shape[-1])
    g2 = gy.reshape(-1, gy.shape[-1]).astype(jnp.float32)
    gq_for_dw = _q_bwd(g2, recipe, contract_axis=0)
    if recipe.granularity == "block32":
        xT = _mx_or_tensor(x2.T.astype(jnp.float32), recipe.fmt_bwd,
                           block_axis=x2.T.ndim - 1).dequantize(jnp.bfloat16)
    else:
        xT = x2.T
    dw = jnp.dot(xT, gq_for_dw.dequantize(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(w_dtype)

    zero = jnp.zeros((), jnp.float32)
    # The amax-sink "gradient" carries the observed backward amax out to the
    # caller's delayed-scaling state.
    return dx, dw, zero, zero, g_amax


fp8_dot.defvjp(_fp8_dot_fwd, _fp8_dot_bwd)
