"""FP8 format definitions for TPU.

The reference framework expresses formats through NVIDIA Transformer Engine's
``Format.E4M3 / Format.HYBRID`` enums (reference: ``te_llama.py:39-40``,
``te_llama_mxfp8.py:28-29``). Here a format is plain data: the JAX dtype plus
its representable amax, so the quantization pass and kernels can be written
against values instead of framework enums.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = [
    "Format",
    "E4M3",
    "E5M2",
    "E8M0",
    "INT8",
    "INT4",
    "HYBRID_FWD",
    "HYBRID_BWD",
]


@dataclasses.dataclass(frozen=True)
class Format:
    """A low-precision storage format.

    Attributes:
      name: short identifier used in configs / checkpoint metadata.
      dtype: the JAX storage dtype.
      max: largest finite representable magnitude (used for scale computation).
    """

    name: str
    dtype: jnp.dtype
    max: float

    def __repr__(self) -> str:  # keep configs readable
        return f"Format({self.name})"


def _finfo_max(dtype) -> float:
    return float(jnp.finfo(dtype).max)


#: Standard FP8 "compute" format: 4 exponent bits, 3 mantissa bits, amax 448.
E4M3 = Format("e4m3", jnp.float8_e4m3fn, _finfo_max(jnp.float8_e4m3fn))

#: Wide-range FP8 format: 5 exponent bits, 2 mantissa bits, amax 57344.
E5M2 = Format("e5m2", jnp.float8_e5m2, _finfo_max(jnp.float8_e5m2))

#: Power-of-two scale format used by MXFP8 block scaling (8 exponent bits).
E8M0 = Format("e8m0", jnp.float8_e8m0fnu, _finfo_max(jnp.float8_e8m0fnu))

#: Symmetric int8 storage. Not an FP8 format — a v5e-native alternative: the
#: int8→bf16 convert is hardware (measured 1.35× bf16 decode-GEMM throughput
#: where fp8's software dequant manages 1.09×), and int8×int8 hits the MXU at
#: ~1.5× bf16 FLOPs (docs/PERF_NOTES.md). Plays the role of the reference
#: thesis's FP8-weight vLLM serving format on hardware without fp8 MXU paths.
INT8 = Format("int8", jnp.int8, 127.0)

#: Symmetric int4, nibble-packed two-per-int8-byte (the TPU compiler's s4
#: support is not reliable through every backend, so packing is explicit).
#: Halves weight bytes again vs int8: in the weight-read-bound decode regime
#: that is both less HBM traffic per step and more batch at equal footprint.
#: Unpack is two VPU shift ops feeding the hardware int8→bf16 convert, fused
#: by XLA into the dot's operand read. Range ±7 (symmetric, like int8's ±127).
INT4 = Format("int4", jnp.int8, 7.0)

# TE's HYBRID recipe means: e4m3 for forward-pass tensors (weights/activations),
# e5m2 for backward-pass tensors (gradients). We name both halves explicitly.
HYBRID_FWD = E4M3
HYBRID_BWD = E5M2

_BY_NAME = {f.name: f for f in (E4M3, E5M2, E8M0, INT8, INT4)}


def format_by_name(name: str) -> Format:
    try:
        return _BY_NAME[name]
    except KeyError:
        raise ValueError(f"unknown fp8 format {name!r}; known: {sorted(_BY_NAME)}")
