"""One-off measurement: MLA (compressed-latent cache) serving capacity vs a
same-size GQA model at equal HBM footprint.

The reference benches MLA decode as a kernel microbenchmark
(``hopper/benchmark_mla_decode.py``); the production question is capacity:
the latent cache stores ``kv_lora_rank + qk_rope_head_dim`` floats per token
per layer instead of ``2 * Hk * Dh``, so at a fixed HBM budget an MLA server
seats a several-fold larger decode batch. In the 1B weight-read-dominated
regime, decode tokens/s scales nearly linearly with batch — the capacity win
IS the throughput win.

Setup: an all-dense MLA model built to match llama-3.2-1b (same hidden 2048
/ 16 layers / SwiGLU 8192 MLP, ~1.2B params) so the only architectural
difference is the attention/cache. Per-token cache at cache_len 1024:
  GQA  (llama-3.2-1b): 16 L x 8 Hk x 64 Dh x 2 (K+V) x 2 B = 32 KiB/token
  MLA  (r=256, dr=64): 16 L x (256 + 64) x 2 B             = 10 KiB/token
Equal-HBM batches below keep (weights + cache arena) within the bf16@8
reference footprint (~2.8 GB).

Same methodology as bench.py: on-device lax.scan decode loop, host-fetch
sync, median of 3 warm trials; one JSON line per config as it lands.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    bench_decode, bench_mla_decode, _mla_1b_config,
    BATCH_BF16, BATCH_MLA_INT8,
)
from llm_fp8_tpu.models import get_config, init_params  # noqa: E402
from llm_fp8_tpu.models.mla import init_mla_params  # noqa: E402
from llm_fp8_tpu.quant import recipe_set_by_name  # noqa: E402

MLA_1B = _mla_1b_config()

# weights bf16 ~2.44 GB (1.22B params) vs llama-1b's 2.47; llama bf16@8
# footprint ~2.73 GB leaves ~0.29 GB of cache budget -> MLA batch 28 at
# 10 KiB/token x 1024. int8 weights (1.22 GB) free ~1.5 GB -> batch 120.
BATCH_MLA_BF16 = 28


def main():
    out = []

    def emit(name, batch, tps, t0):
        out.append((name, tps))
        print(json.dumps({
            "config": name, "batch": batch, "tokens_per_s": round(tps, 1),
            "wall_s": round(time.monotonic() - t0, 1),
        }), flush=True)

    # Reference: GQA llama-3.2-1b bf16 at its equal-HBM batch.
    gcfg = get_config("llama-3.2-1b")
    gparams = init_params(gcfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    t0 = time.monotonic()
    gqa_tps = bench_decode(gparams, gcfg, jnp.bfloat16, BATCH_BF16)
    emit("gqa_1b_bf16", BATCH_BF16, gqa_tps, t0)
    del gparams

    cfg = MLA_1B
    params = init_mla_params(cfg, jax.random.PRNGKey(1), dtype=jnp.bfloat16)

    # MLA at the GQA batch: per-step parity check (same batch, ~1/3 cache).
    t0 = time.monotonic()
    tps = bench_mla_decode(params, cfg, BATCH_BF16)
    emit("mla_1b_bf16_b8", BATCH_BF16, tps, t0)

    # MLA bf16 at equal HBM: the capacity -> throughput win.
    t0 = time.monotonic()
    tps = bench_mla_decode(params, cfg, BATCH_MLA_BF16)
    emit("mla_1b_bf16_equal_hbm", BATCH_MLA_BF16, tps, t0)
    print(json.dumps({
        "metric": "mla_decode_throughput_vs_gqa_bf16_equal_hbm_1b",
        "value": round(tps / gqa_tps, 3), "unit": "x",
    }), flush=True)

    # MLA int8 weights at equal HBM: compounding the two capacity levers.
    from llm_fp8_tpu.models.mla import quantize_mla_params

    qparams = quantize_mla_params(params, recipe_set_by_name("int8"))
    del params
    t0 = time.monotonic()
    tps = bench_mla_decode(qparams, cfg, BATCH_MLA_INT8)
    emit("mla_1b_int8_equal_hbm", BATCH_MLA_INT8, tps, t0)
    print(json.dumps({
        "metric": "mla_int8_decode_throughput_vs_gqa_bf16_equal_hbm_1b",
        "value": round(tps / gqa_tps, 3), "unit": "x",
    }), flush=True)


if __name__ == "__main__":
    main()
