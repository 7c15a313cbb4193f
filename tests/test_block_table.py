"""Block allocator / sequence table tests — native C++ and Python fallback."""
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

import llm_fp8_tpu.serving.block_table as _bt

# The .so is a build artifact (not committed); build it here so a fresh
# checkout still exercises the native path whenever a compiler exists.
if not _bt.native_available() and shutil.which("make") and shutil.which("g++"):
    _csrc = pathlib.Path(__file__).resolve().parents[1] / "csrc"
    subprocess.run(["make", "-C", str(_csrc)], check=True, capture_output=True)
    _bt._lib = None  # drop the cached "missing" probe and re-load

from llm_fp8_tpu.serving.block_table import (  # noqa: E402
    BlockAllocator,
    SequenceTable,
    native_available,
)

MODES = ["python"] + (["native"] if native_available() else [])


@pytest.fixture(params=MODES)
def alloc(request):
    return BlockAllocator(16, 8, force_python=request.param == "python")


class TestAllocator:
    def test_alloc_release_roundtrip(self, alloc):
        assert alloc.num_free == 16
        a = alloc.alloc(4)
        assert a is not None and len(set(a.tolist())) == 4
        assert alloc.num_free == 12
        alloc.release(a)
        assert alloc.num_free == 16

    def test_all_or_nothing(self, alloc):
        assert alloc.alloc(16) is not None
        assert alloc.alloc(1) is None
        assert alloc.num_free == 0

    def test_fork_refcounting(self, alloc):
        a = alloc.alloc(3)
        assert alloc.fork(a)
        assert alloc.refcount(int(a[0])) == 2
        alloc.release(a)  # one ref drops, still held
        assert alloc.num_free == 16 - 3
        alloc.release(a)
        assert alloc.num_free == 16

    def test_fork_unallocated_fails(self, alloc):
        a = alloc.alloc(2)
        alloc.release(a)
        assert not alloc.fork(a)

    def test_double_release_idempotent(self, alloc):
        a = alloc.alloc(2)
        alloc.release(a)
        alloc.release(a)  # must not corrupt the free list
        assert alloc.num_free == 16
        b = alloc.alloc(16)
        assert b is not None and len(set(b.tolist())) == 16


class TestSequenceTable:
    def test_grow_and_table(self, alloc):
        seq = SequenceTable(alloc)
        assert seq.ensure_capacity(20)  # 20 tokens / 8 per block -> 3 blocks
        assert len(seq.blocks) == 3
        assert seq.ensure_capacity(24)  # still 3
        assert len(seq.blocks) == 3
        assert seq.ensure_capacity(25)  # -> 4
        assert len(seq.blocks) == 4
        t = seq.table(8)
        assert t.shape == (8,)
        assert list(t[:4]) == seq.blocks
        seq.free()
        assert alloc.num_free == 16

    def test_exhaustion(self, alloc):
        seqs = [SequenceTable(alloc) for _ in range(3)]
        assert seqs[0].ensure_capacity(64)  # 8 blocks
        assert seqs[1].ensure_capacity(64)  # 8 blocks
        assert not seqs[2].ensure_capacity(8)  # pool empty
        seqs[0].free()
        assert seqs[2].ensure_capacity(8)


def test_native_is_used_when_built():
    # The build step in csrc/Makefile must have produced the library.
    assert native_available()
