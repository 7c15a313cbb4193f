"""Fused residual-add + RMSNorm Pallas kernel.

TPU-native equivalent of the reference's ``csrc/layer_norm`` CUDA extension
(fused dropout-add-LayerNorm/RMSNorm, SURVEY.md §2c #44) and its Triton
rewrite (``flash_attn/ops/triton/layer_norm.py``). XLA already fuses the
plain rmsnorm composition well; this kernel exists for the residual-variant
fusion (add + reduce + rescale in one VMEM pass, residual sum written once)
and as the substrate for later quantized-output epilogues (norm → fp8 cast
for the QKV projection input).

Differentiable: custom VJP recomputes the (cheap) statistics in the backward
via the jnp reference — the memory win of the kernel is in the forward's
fused residual write.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rmsnorm_residual_fused"]


def _kernel(x_ref, res_ref, w_ref, y_ref, sum_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    r = res_ref[...].astype(jnp.float32)
    s = x + r
    var = jnp.mean(s * s, axis=-1, keepdims=True)
    y = s * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)
    sum_ref[...] = s.astype(sum_ref.dtype)
    y_ref[...] = y.astype(y_ref.dtype)


def _fwd_call(x, residual, weight, eps, block_rows, interpret):
    orig_shape = x.shape
    D = x.shape[-1]
    x2 = x.reshape(-1, D)
    r2 = residual.reshape(-1, D)
    n = x2.shape[0]
    rem = (-n) % block_rows
    if rem:
        x2 = jnp.pad(x2, ((0, rem), (0, 0)))
        r2 = jnp.pad(r2, ((0, rem), (0, 0)))
    grid = (x2.shape[0] // block_rows,)
    y, s = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, r2, weight.reshape(1, D))
    return y[:n].reshape(orig_shape), s[:n].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def rmsnorm_residual_fused(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused ``(norm(x + residual) * weight, x + residual)``.

    Same contract as :func:`llm_fp8_tpu.ops.rmsnorm.rmsnorm_residual`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fwd_call(x, residual, weight, eps, block_rows, interpret)


def _fwd_rule(x, residual, weight, eps, block_rows, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    y, s = _fwd_call(x, residual, weight, eps, block_rows, interpret)
    return (y, s), (s, weight)


def _bwd_rule(eps, block_rows, interpret, res, cts):
    s, weight = res
    dy, ds_out = cts

    # Recompute-statistics backward (cheap VPU work; XLA fuses it):
    # y = s * rstd * w;  rstd = (mean(s^2)+eps)^-1/2
    s32 = s.astype(jnp.float32)
    w32 = weight.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    var = jnp.mean(s32 * s32, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = s32 * rstd
    wdy = dy32 * w32
    D = s.shape[-1]
    dw = jnp.sum(dy32 * xhat, axis=tuple(range(s.ndim - 1))).astype(weight.dtype)
    d_s = (
        wdy - xhat * jnp.mean(wdy * xhat, axis=-1, keepdims=True)
    ) * rstd
    d_s = d_s + ds_out.astype(jnp.float32)  # gradient through the sum output
    d_s = d_s.astype(s.dtype)
    return d_s, d_s, dw


rmsnorm_residual_fused.defvjp(_fwd_rule, _bwd_rule)
