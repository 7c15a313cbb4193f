"""One-off measurement: int4 (group-128, nibble-packed) weight-only decode.

Same methodology as bench.py (on-device scan loop, host-fetch sync, median of
warm trials). The question: does halving weight bytes again vs int8 convert
into throughput on v5e — per-step (less HBM weight traffic) and capacity
(bigger equal-HBM batch)? The unpack is two VPU shifts per byte feeding the
hardware int8->bf16 convert; group scales make the dot non-post-applicable,
so the dequant (unpack * scale) fuses into the XLA dot's operand read.

Equal-HBM batches at 1B / cache 1024 / bf16 KV (33.5 MB per seq):
  bf16@8 footprint ~= 2.74 GB; int4 weights ~= 0.66 GB (incl. f32 group
  scales) -> batch 62. With int8 KV (16.75 MB per seq) -> batch 124.

Prints one JSON line per config as it lands, so partials survive a timeout.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_decode, BATCH_BF16, BATCH_FP8  # noqa: E402
from llm_fp8_tpu.models import get_config, init_params, quantize_params  # noqa: E402
from llm_fp8_tpu.quant import recipe_set_by_name  # noqa: E402

BATCH_INT4 = 62


def run(name, params, cfg, batch, **kw):
    t0 = time.monotonic()
    tps = bench_decode(params, cfg, jnp.bfloat16, batch, **kw)
    print(json.dumps({"config": name, "batch": batch,
                      "tokens_per_s": round(tps, 1),
                      "wall_s": round(time.monotonic() - t0, 1)}), flush=True)
    return tps


def main():
    cfg = get_config("llama-3.2-1b")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    q_int8 = quantize_params(params, recipe_set_by_name("int8"))
    q_int4 = quantize_params(params, recipe_set_by_name("int4"))

    bf16 = run("bf16", params, cfg, BATCH_BF16)
    # Same batch as int8's equal-HBM point: isolates the per-step effect of
    # halved weight reads (+ unpack tax) from the capacity effect.
    int8 = run("int8@44", q_int8, cfg, BATCH_FP8)
    int4_same = run("int4@44", q_int4, cfg, BATCH_FP8)
    # Capacity point: the extra ~0.6 GB freed by int4 seats 18 more seqs.
    int4_cap = run("int4@62", q_int4, cfg, BATCH_INT4)
    print(json.dumps({
        "summary": "int4 weight-only vs bf16@8 (equal-HBM decode)",
        "int8_x": round(int8 / bf16, 3),
        "int4_same_batch_x": round(int4_same / bf16, 3),
        "int4_capacity_x": round(int4_cap / bf16, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
