"""Qwen2.5-14B compile-level geometry proof (BASELINE config 5).

The one reference headline model that *requires* multi-chip
(``/root/reference/train_fp8.py:50-56``; 14B over 2 hosts in
``README.md:56-62``) gets AOT evidence: the full serving decode step and
the full sharded train step are lowered + compiled by XLA's SPMD
partitioner for a 16-virtual-device mesh, and the compiled per-device
memory analysis must fit the 16 GB v5e HBM budget. See ``aot14b_worker.py``
for the program definitions (int8 weights + 16x4096 bf16 KV serving on
fsdp2 x tp4; bf16 AdamW full-remat training on fsdp8 x tp2).

Runs in a subprocess: the 16-device topology differs from the suite's
8-device conftest default.
"""
import json
import os
import subprocess
import sys


def test_14b_aot_fits_v5e():
    worker = os.path.join(os.path.dirname(__file__), "aot14b_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, worker], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["serving_fits"], result["serving"]
    assert result["training_fits"], result["training"]
    # The split should be sane, not degenerate: weights actually sharded
    # (int8 14B 16-way would be ~0.9 GB/dev; with KV + bf16 leaves the
    # serving args must stay well under a whole-model 14 GB).
    assert result["serving"]["arg_gb_per_dev"] < 8.0, result["serving"]
    assert result["training"]["arg_gb_per_dev"] < 10.0, result["training"]
