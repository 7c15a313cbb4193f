"""Headline benchmark: FP8 vs BF16 decode throughput on one TPU chip.

Reproduces the reference's deployment claim on TPU terms: FP8 weights (+FP8
KV cache) should beat BF16 decode tokens/s (BASELINE.json north star: ≥2×,
since single-token decode is HBM-bandwidth-bound and fp8 halves weight
bytes). Model: Llama-3.2-1B architecture, random weights (weights' values
don't affect throughput), batch-8 continuous-decode steady state.

Prints ONE JSON line:
  {"metric": "fp8_decode_speedup_vs_bf16_llama1b", "value": <x>, "unit": "x",
   "vs_baseline": <x / 2.0>, ...extras}
"""
import json
import time

import jax
import jax.numpy as jnp

from llm_fp8_tpu.models import (
    get_config,
    init_params,
    quantize_params,
    init_kv_cache,
)
from llm_fp8_tpu.models.llama import forward
from llm_fp8_tpu.quant import LAYERWISE

BATCH = 8
CTX = 512  # cache fill at steady state
CACHE_LEN = 1024
WARMUP = 3
ITERS = 256


def make_decode_loop(cfg, attn_impl, n_steps):
    """N decode steps as ONE on-device lax.scan: a single dispatch, so the
    wall time is honest device time (per-step host dispatch over the axon
    remote tunnel is noisy and can overlap asynchronously)."""

    @jax.jit
    def loop(params, cache, toks, lens):
        def body(carry, _):
            cache, toks, lens = carry
            logits, cache = forward(
                params, toks, cfg, cache=cache, start_pos=lens,
                kv_lens=lens + 1, attn_impl=attn_impl,
            )
            toks = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None]
            return (cache, toks, lens + 1), toks

        (cache, toks, lens), out = jax.lax.scan(
            body, (cache, toks, lens), None, length=n_steps
        )
        return out

    return loop


def _sync(x):
    """True device sync: fetch one element. Over the axon remote tunnel,
    block_until_ready can return before execution completes on a cold
    pipeline; a host fetch cannot lie."""
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])


def bench_decode(params, cfg, kv_dtype, attn_impl="auto"):
    cache = init_kv_cache(cfg, BATCH, CACHE_LEN, dtype=kv_dtype)
    lens = jnp.full((BATCH,), CTX, jnp.int32)
    toks = jnp.ones((BATCH, 1), jnp.int32)
    loop = make_decode_loop(cfg, attn_impl, ITERS)
    # warmup = compile + one full loop, with a real host fetch as the barrier
    _sync(loop(params, cache, toks, lens))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        _sync(loop(params, cache, toks, lens))
        times.append(time.perf_counter() - t0)
    times = sorted(times[1:])  # drop the first (cold-pipeline artifacts)
    dt = times[len(times) // 2]  # median of warm trials
    return BATCH * ITERS / dt  # tokens/s


def main():
    cfg = get_config("llama-3.2-1b")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = quantize_params(params, LAYERWISE)

    bf16_tps = bench_decode(params, cfg, jnp.bfloat16)
    fp8_tps = bench_decode(qparams, cfg, jnp.float8_e4m3fn)

    speedup = fp8_tps / bf16_tps
    print(
        json.dumps(
            {
                "metric": "fp8_decode_speedup_vs_bf16_llama1b",
                "value": round(speedup, 3),
                "unit": "x",
                "vs_baseline": round(speedup / 2.0, 3),
                "fp8_tokens_per_s": round(fp8_tps, 1),
                "bf16_tokens_per_s": round(bf16_tps, 1),
                "batch": BATCH,
                "context": CTX,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
