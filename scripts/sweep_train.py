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
    # (batch, remat, ce_chunks, grad_accum)
    (8, "dots", 0, 1),   # round-3 anchor (54.1% MFU after 512-wide tiles)
    (8, "dots", 0, 4),   # amortize the ~34 ms AdamW pass over 4 microbatches
    (8, "dots", 0, 8),
    (12, "dots", 8, 1),  # bigger batch if ce_chunks frees enough
    (16, "dots", 8, 1),
    (8, "dots", 8, 4),   # + chunked CE frees the 2.1 GB logits
]


def main():
    cfg = get_config("llama-3.2-1b")
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 197e12)
    rows = []
    for batch, remat, ce, accum in CONFIGS:
        flops = model_flops_per_step(cfg, batch, 512)
        try:
            dt = bench_one(cfg, "bf16", batch, remat=remat, ce_chunks=ce,
                           grad_accum=accum)
        except Exception as e:  # OOM on the 16 GB chip is expected for some
            print(json.dumps({"batch": batch, "remat": str(remat),
                              "ce_chunks": ce, "grad_accum": accum,
                              "error": str(e)[:200]}),
                  flush=True)
            continue
        row = {
            "batch": batch, "remat": str(remat), "ce_chunks": ce,
            "grad_accum": accum,
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
