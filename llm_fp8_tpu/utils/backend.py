"""Backend capability detection: choose defaults by what the chip can do.

The reference hardcodes CUDA-generation dispatch in C++ (sm80 vs sm90 kernel
selection, ``csrc/flash_attn/flash_api.cpp``); the TPU equivalent is a couple
of host-side predicates on ``jax.devices()[0].device_kind``.

The one decision that matters today: **fp8 KV cache default**. v5e has no
native fp8 MXU path — every fp8 cache byte pays a software (VPU) dequant per
decode step, measured at 0.37x bf16 decode throughput
(``docs/PERF_NOTES.md``). On fp8-native parts (v6e-class and later) the
arithmetic flips and fp8 KV wins both capacity and latency. So the engine
default is bf16 KV on v5-class-and-older / CPU, fp8 KV where fp8 is native.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["device_kind", "native_fp8_matmul", "resolve_kv_dtype"]


@functools.lru_cache(maxsize=1)
def device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:  # noqa: BLE001 — no backend at all
        return "unknown"


@functools.lru_cache(maxsize=1)
def native_fp8_matmul() -> bool:
    """True when the MXU multiplies fp8 operands natively (v6e-class+).

    Conservative parse of ``device_kind`` strings ("TPU v5 lite", "TPU v4",
    "TPU v6e", ...): returns True only for a recognized generation >= 6.
    """
    kind = device_kind().lower()
    if "tpu" not in kind:
        return False
    for tok in kind.replace("v", " v").split():
        if tok.startswith("v") and tok[1:2].isdigit():
            return int(tok[1]) >= 6
    return False


def resolve_kv_dtype(kv_dtype: Any):
    """Map the engine-config ``kv_dtype`` field to a concrete dtype.

    ``"auto"`` → fp8 on fp8-native backends, bf16 elsewhere (per the
    measured v5e trade-off above). Strings ``"fp8"``/``"bf16"`` and concrete
    dtypes pass through.
    """
    if kv_dtype == "auto":
        return jnp.float8_e4m3fn if native_fp8_matmul() else jnp.bfloat16
    if kv_dtype == "fp8":
        return jnp.float8_e4m3fn
    if kv_dtype == "int8":
        # v5e-native 1-byte KV: int8→bf16 convert is hardware (fp8's is VPU
        # software). Scales are per-head, auto-calibrated at first prefill.
        return jnp.int8
    if kv_dtype == "bf16":
        return jnp.bfloat16
    return kv_dtype
