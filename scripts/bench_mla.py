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

from bench import _sync, bench_decode, BATCH_BF16, CTX, CACHE_LEN, ITERS  # noqa: E402
from llm_fp8_tpu.models import get_config, init_params  # noqa: E402
from llm_fp8_tpu.models.llama import init_kv_cache  # noqa: E402
from llm_fp8_tpu.models.mla import MLAConfig, init_mla_params, mla_forward  # noqa: E402
from llm_fp8_tpu.quant import recipe_set_by_name  # noqa: E402

# llama-3.2-1b's shape with MLA attention; all layers dense (num_experts
# fields unused when first_k_dense_replace == num_layers).
MLA_1B = MLAConfig(
    name="mla-1b-dense", vocab_size=128256, hidden_size=2048,
    intermediate_size=8192, num_layers=16, num_heads=16, num_kv_heads=1,
    head_dim=192, rope_theta=500000.0, tie_word_embeddings=True,
    q_lora_rank=None, kv_lora_rank=256, qk_nope_head_dim=128,
    qk_rope_head_dim=64, v_head_dim=128,
    num_experts=1, num_experts_per_tok=1, n_shared_experts=1,
    moe_intermediate_size=64, first_k_dense_replace=16,
)

# weights bf16 ~2.44 GB (1.22B params) vs llama-1b's 2.47; llama bf16@8
# footprint ~2.73 GB leaves ~0.29 GB of cache budget -> MLA batch 28 at
# 10 KiB/token x 1024. int8 weights (1.22 GB) free ~1.5 GB -> batch 120.
BATCH_MLA_BF16 = 28
BATCH_MLA_INT8 = 120


def bench_mla_decode(params, cfg, batch):
    cache = init_kv_cache(cfg, batch, CACHE_LEN, dtype=jnp.bfloat16)
    lens = jnp.full((batch,), CTX, jnp.int32)
    toks = jnp.ones((batch, 1), jnp.int32)

    @jax.jit
    def loop(params, cache, toks, lens):
        def body(carry, _):
            cache, toks, lens = carry
            logits, cache = mla_forward(
                params, toks, cfg, cache=cache, start_pos=lens,
                kv_lens=lens + 1,
            )
            toks = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None]
            return (cache, toks, lens + 1), None

        (cache, toks, lens), _ = jax.lax.scan(
            body, (cache, toks, lens), None, length=ITERS
        )
        return toks

    _sync(loop(params, cache, toks, lens))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(loop(params, cache, toks, lens))
        times.append(time.perf_counter() - t0)
    return batch * ITERS / sorted(times)[1]


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
