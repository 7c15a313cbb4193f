"""Paged-KV block tables: host-side allocator + per-sequence tables.

Host half of the paged KV-cache (the device half is
``llm_fp8_tpu.kernels.paged_attention``). Equivalent of the reference's
block-table machinery (``csrc/flash_attn/flash_api.cpp:557-581`` consumes
``block_table`` tensors; vLLM-style paging is the thesis's serving stack,
``thesis/chapters/c3/c3_methodology.tex:46-52``).

The allocator itself is native C++ (``csrc/block_allocator.cpp``: free list +
refcounts for copy-on-write prefix sharing) loaded via ctypes; a pure-Python
fallback keeps air-gapped / unbuilt environments working.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

__all__ = ["BlockAllocator", "SequenceTable", "native_available"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native",
                         "libblock_allocator.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ba_create.restype = ctypes.c_void_p
        lib.ba_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
        lib.ba_destroy.argtypes = [ctypes.c_void_p]
        lib.ba_num_free.restype = ctypes.c_int32
        lib.ba_num_free.argtypes = [ctypes.c_void_p]
        lib.ba_alloc.restype = ctypes.c_int32
        lib.ba_alloc.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                 ctypes.POINTER(ctypes.c_int32)]
        lib.ba_release.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                   ctypes.POINTER(ctypes.c_int32)]
        lib.ba_fork.restype = ctypes.c_int32
        lib.ba_fork.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                ctypes.POINTER(ctypes.c_int32)]
        lib.ba_refcount.restype = ctypes.c_int32
        lib.ba_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        _lib = lib
    else:
        _lib = False
    return _lib


def native_available() -> bool:
    return bool(_load())


class BlockAllocator:
    """Free-list block allocator; native C++ when built, Python otherwise."""

    def __init__(self, num_blocks: int, block_size: int, *,
                 force_python: bool = False):
        self.num_blocks = num_blocks
        self.block_size = block_size
        lib = None if force_python else _load()
        if lib:
            self._lib = lib
            self._h = lib.ba_create(num_blocks, block_size)
            if not self._h:
                raise ValueError("allocator create failed")
        else:
            self._lib = None
            self._free = list(range(num_blocks - 1, -1, -1))
            self._ref = [0] * num_blocks

    def __del__(self):
        if getattr(self, "_lib", None) and getattr(self, "_h", None):
            self._lib.ba_destroy(self._h)
            self._h = None

    @property
    def num_free(self) -> int:
        if self._lib:
            return int(self._lib.ba_num_free(self._h))
        return len(self._free)

    def alloc(self, n: int) -> Optional[np.ndarray]:
        """Allocate n blocks; None if not enough free (all-or-nothing)."""
        if self._lib:
            out = (ctypes.c_int32 * max(n, 1))()
            if self._lib.ba_alloc(self._h, n, out) != 0:
                return None
            return np.frombuffer(out, dtype=np.int32, count=n).copy()
        if n > len(self._free):
            return None
        blocks = [self._free.pop() for _ in range(n)]
        for b in blocks:
            self._ref[b] = 1
        return np.asarray(blocks, np.int32)

    def release(self, blocks: np.ndarray) -> None:
        blocks = np.asarray(blocks, np.int32)
        if self._lib:
            arr = (ctypes.c_int32 * len(blocks))(*blocks.tolist())
            self._lib.ba_release(self._h, len(blocks), arr)
            return
        for b in blocks.tolist():
            if 0 <= b < self.num_blocks and self._ref[b] > 0:
                self._ref[b] -= 1
                if self._ref[b] == 0:
                    self._free.append(b)

    def fork(self, blocks: np.ndarray) -> bool:
        """Share blocks (prefix caching): refcount++ on each. False if any
        block is unallocated."""
        blocks = np.asarray(blocks, np.int32)
        if self._lib:
            arr = (ctypes.c_int32 * len(blocks))(*blocks.tolist())
            return self._lib.ba_fork(self._h, len(blocks), arr) == 0
        if any(self._ref[b] == 0 for b in blocks.tolist()):
            return False
        for b in blocks.tolist():
            self._ref[b] += 1
        return True

    def refcount(self, block: int) -> int:
        if self._lib:
            return int(self._lib.ba_refcount(self._h, block))
        return self._ref[block]


class SequenceTable:
    """Per-sequence block table growing as the sequence decodes."""

    def __init__(self, allocator: BlockAllocator):
        self.allocator = allocator
        self.blocks: List[int] = []
        self.length = 0  # tokens

    def ensure_capacity(self, n_tokens: int) -> bool:
        """Grow the table to hold n_tokens; False if the pool is exhausted."""
        bs = self.allocator.block_size
        need = -(-n_tokens // bs) - len(self.blocks)
        if need > 0:
            got = self.allocator.alloc(need)
            if got is None:
                return False
            self.blocks.extend(got.tolist())
        self.length = max(self.length, n_tokens)
        return True

    def table(self, max_blocks: int) -> np.ndarray:
        """Fixed-width block table row (padded with 0) for the device kernel."""
        out = np.zeros((max_blocks,), np.int32)
        out[: len(self.blocks)] = self.blocks
        return out

    def free(self):
        if self.blocks:
            self.allocator.release(np.asarray(self.blocks, np.int32))
            self.blocks = []
            self.length = 0
