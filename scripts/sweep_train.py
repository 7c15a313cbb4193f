"""One-process sweep of bf16 train-step configs on the real chip.

The tunneled v5e is time-shared, so absolute numbers swing between runs —
only same-run relative comparisons are meaningful (docs/PERF_NOTES.md).
This measures every config in one process and prints a table; use it to
pick the MFU-winning (batch, remat, ce_chunks) before running bench_train.py
for the shipped artifact.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_train.py
"""
import json
import sys

import jax

sys.path.insert(0, "/root/repo")

from bench_train import bench_one, model_flops_per_step, PEAK_FLOPS  # noqa: E402
from llm_fp8_tpu.models import get_config  # noqa: E402

CONFIGS = [
    # (batch, remat, ce_chunks, grad_accum, unroll, flash_block)
    (8, "dots", 0, 1, 1, None),   # round-3 anchor (54.1% MFU, 512 tiles)
    # r4 MFU push: layer-scan unroll — the scan dynamically slices each
    # layer's weights from the stacked [L, ...] arrays every iteration;
    # unrolling lets XLA overlap the next layer's weight fetch with the
    # current layer's compute (double-buffering the scan carry).
    (8, "dots", 0, 1, 2, None),
    (8, "dots", 0, 1, 4, None),
    (8, "dots", 0, 1, 16, None),  # fully unrolled
    # flash bwd block sweep at the 512-tile regime (VERDICT r3 #2): the
    # bwd kernel's VMEM working set per program is ~4x the forward's
    # (q, kT, v, vT, do tiles + 2 f32 accumulators) — 256-wide tiles may
    # trade grid overhead for better VMEM residency.
    (8, "dots", 0, 1, 1, 256),
    (8, "dots", 0, 1, 1, 384),
    # best-unroll x 256-block composition is run manually after reading
    # the table.
]


def main():
    cfg = get_config("llama-3.2-1b")
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 197e12)
    rows = []
    import os

    for batch, remat, ce, accum, unroll, flash_block in CONFIGS:
        flops = model_flops_per_step(cfg, batch, 512)
        if flash_block is None:
            os.environ.pop("LLM_FP8_FLASH_BLOCK", None)
        else:
            os.environ["LLM_FP8_FLASH_BLOCK"] = str(flash_block)
        try:
            dt = bench_one(cfg, "bf16", batch, remat=remat, ce_chunks=ce,
                           grad_accum=accum, unroll=unroll)
        except Exception as e:  # OOM on the 16 GB chip is expected for some
            print(json.dumps({"batch": batch, "remat": str(remat),
                              "ce_chunks": ce, "grad_accum": accum,
                              "unroll": unroll, "flash_block": flash_block,
                              "error": str(e)[:200]}),
                  flush=True)
            continue
        row = {
            "batch": batch, "remat": str(remat), "ce_chunks": ce,
            "grad_accum": accum, "unroll": unroll,
            "flash_block": flash_block,
            "step_s": round(dt, 4),
            "tokens_per_s": round(batch * 512 / dt, 1),
            "mfu": round(flops / dt / peak, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if rows:
        best = max(rows, key=lambda r: r["mfu"])
        print("BEST:", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
