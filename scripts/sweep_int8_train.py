"""int8_train's win case: regimes where GEMMs dominate the step.

Round-2 measured int8_train at 1.076x bf16 only in the full-remat
batch-8x512 regime; the VERDICT asked for the recipe's win case (larger
batch / longer seq, where MXU GEMM work dominates) to be measured. One
process, same-run bf16-vs-int8 pairs.

Usage: python scripts/sweep_int8_train.py  (one JSON line per pair)
"""
import json
import sys

import jax

sys.path.insert(0, "/root/repo")

from bench_train import bench_one, model_flops_per_step, PEAK_FLOPS  # noqa: E402
from llm_fp8_tpu.models import get_config  # noqa: E402

# (batch, seq, remat) — full remat is the memory-constrained regime the
# recipe targets; bigger batch/longer seq raise the GEMM fraction.
CONFIGS = [
    (8, 512, "full"),    # round-2 anchor (1.076x)
    (16, 512, "full"),
    (8, 1024, "full"),
    (4, 2048, "full"),
]


def main():
    cfg = get_config("llama-3.2-1b")
    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, 197e12)
    for batch, seq, remat in CONFIGS:
        row = {"batch": batch, "seq": seq, "remat": remat}
        try:
            dt_b = bench_one(cfg, "bf16", batch, remat=remat, seq=seq)
            dt_i = bench_one(cfg, "int8_train", batch, remat=remat, seq=seq)
        except Exception as e:
            row["error"] = str(e)[:160]
            print(json.dumps(row), flush=True)
            continue
        flops = model_flops_per_step(cfg, batch, seq)
        row.update({
            "bf16_step_s": round(dt_b, 4),
            "bf16_mfu": round(flops / dt_b / peak, 4),
            "int8_step_s": round(dt_i, 4),
            "int8_x": round(dt_b / dt_i, 3),
        })
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
