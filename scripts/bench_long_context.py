"""End-to-end long-context serving: paged pool + quantized KV at 8k-16k.

VERDICT r3 #6: the paged machinery exists for long-context serving but was
never demonstrated as a system. This drives the FULL engine (admission →
paged prefill scatter → paged flash decode → retire) at 8k/16k context and
reports tokens/s, TTFT, and peak HBM per config — the thesis inference
protocol's columns (``thesis/chapters/c3/c3_methodology.tex:46-52``) at the
context lengths vLLM-style paging exists for.

Configs (llama-3.2-1b, int8 weights — the measured-best v5e storage):
  * bf16 KV, batch B      — the baseline footprint
  * int8 KV, batch 2B     — equal-HBM: halved cache bytes seat twice the
                            concurrency in the same pool

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_long_context.py \
      --context 8192 --new 64 --batch 4
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models import get_config, init_params, quantize_params
from llm_fp8_tpu.quant import recipe_set_by_name
from llm_fp8_tpu.serving.engine import SamplingParams
from llm_fp8_tpu.serving.paged_engine import PagedEngine, PagedEngineConfig
from llm_fp8_tpu.utils.monitor import device_memory_stats


def drive(params, cfg, *, kv_dtype, kv_scale, batch, context, new,
          page_size):
    pages_per_seq = -(-(context + new) // page_size)
    ecfg = PagedEngineConfig(
        max_slots=batch,
        num_pages=batch * pages_per_seq + 8,
        page_size=page_size,
        max_pages_per_seq=pages_per_seq,
        kv_dtype=kv_dtype,
        kv_scale=kv_scale,
        prefill_buckets=(context,),
    )
    eng = PagedEngine(params, cfg, ecfg)
    rng = np.random.RandomState(0)
    prompt_len = context - 8
    sp = SamplingParams(max_new_tokens=new)

    def one_round():
        for _ in range(batch):
            eng.add_request(
                rng.randint(1, cfg.vocab_size, prompt_len).astype(np.int32),
                sp)
        t0 = time.perf_counter()
        done = eng.run()
        dt = time.perf_counter() - t0
        toks = sum(len(r.output) for r in done)
        ttfts = sorted(r.ttft for r in done if r.ttft is not None)
        return toks, dt, ttfts

    one_round()  # compile (prefill bucket + decode step)
    toks, dt, ttfts = one_round()
    mem = device_memory_stats()
    return {
        "kv_dtype": str(jnp.dtype(kv_dtype).name),
        "batch": batch,
        "context": context,
        "new_tokens": new,
        "tokens_per_s": round(toks / dt, 1),
        "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3) if ttfts else None,
        "ttft_max_s": round(ttfts[-1], 3) if ttfts else None,
        "peak_hbm_gb": round(mem["peak_gb"], 2),
        "pool_pages": ecfg.num_pages,
        "page_size": page_size,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3.2-1b")
    ap.add_argument("--context", type=int, default=8192)
    ap.add_argument("--new", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4,
                    help="bf16-KV batch; the int8-KV config runs 2x")
    ap.add_argument("--page_size", type=int, default=128)
    ap.add_argument("--weights", choices=["int8", "bf16"], default="int8")
    args = ap.parse_args()

    cfg = get_config(args.model)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if args.weights == "int8":
        params = quantize_params(params, recipe_set_by_name("int8"))

    for kv_dtype, kv_scale, batch in (
        (jnp.bfloat16, 1.0, args.batch),
        (jnp.int8, 0.05, args.batch * 2),
    ):
        row = drive(params, cfg, kv_dtype=kv_dtype, kv_scale=kv_scale,
                    batch=batch, context=args.context, new=args.new,
                    page_size=args.page_size)
        row["weights"] = args.weights
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
