"""One-off measurement: int8 vs fp8 vs bf16 weight storage for 1B decode.

Same methodology as bench.py (on-device scan loop, host-fetch sync, median of
warm trials); measures the PERF_NOTES round-2 agenda item "int8-storage
serving mode" on the real chip. Prints one JSON line per config as it lands,
so partial results survive a timeout.
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
from llm_fp8_tpu.quant import LAYERWISE, recipe_set_by_name  # noqa: E402


def main():
    cfg = get_config("llama-3.2-1b")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    q_fp8 = quantize_params(params, LAYERWISE)
    q_int8 = quantize_params(params, recipe_set_by_name("int8"))

    def run(name, p, batch, impl):
        prev = os.environ.get("LLM_FP8_QDOT")
        os.environ["LLM_FP8_QDOT"] = impl
        try:
            t0 = time.monotonic()
            tps = bench_decode(p, cfg, jnp.bfloat16, batch)
            print(json.dumps({"config": name, "impl": impl, "batch": batch,
                              "tokens_per_s": round(tps, 1),
                              "wall_s": round(time.monotonic() - t0, 1)}),
                  flush=True)
            return tps
        finally:
            if prev is None:
                os.environ.pop("LLM_FP8_QDOT", None)
            else:
                os.environ["LLM_FP8_QDOT"] = prev

    bf16 = run("bf16", params, BATCH_BF16, "xla")
    fp8_xla = run("fp8", q_fp8, BATCH_FP8, "xla")
    int8_xla = run("int8", q_int8, BATCH_FP8, "xla")
    int8_fused = run("int8", q_int8, BATCH_FP8, "fused")
    fp8_fused = run("fp8", q_fp8, BATCH_FP8, "fused")
    print(json.dumps({
        "summary": "equal-HBM decode vs bf16@8",
        "fp8_xla_x": round(fp8_xla / bf16, 3),
        "int8_xla_x": round(int8_xla / bf16, 3),
        "int8_fused_x": round(int8_fused / bf16, 3),
        "fp8_fused_x": round(fp8_fused / bf16, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
