"""Measure int8-KV decode: the v5e-native 1-byte KV cache at equal HBM.

Extends the equal-HBM protocol (bench.py / docs/PERF_NOTES.md) one step:
int8 weights already freed ~1.2 GB for batch 44; int8 KV halves the
per-sequence cache (33.5 -> 16.75 MB at cache 1024), so the same footprint
seats batch ~88. Unlike fp8 KV (software VPU dequant, measured 0.37x), the
int8->bf16 convert is hardware — the fused arena kernel streams int8 bytes
and converts in VMEM.

Configs measured in ONE process (time-shared chip: same-run ratios only):
  1. bf16 weights + bf16 KV, B=8           (baseline footprint ~2.74 GB)
  2. int8 weights + bf16 KV, B=44          (the shipped 2.24x config)
  3. int8 weights + int8 arena KV, B=88    (this change)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_kv.py
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from llm_fp8_tpu.models import (  # noqa: E402
    get_config, init_params, quantize_params, init_kv_cache,
)
from llm_fp8_tpu.models.llama import forward, forward_decode_arena  # noqa: E402
from llm_fp8_tpu.quant import recipe_set_by_name  # noqa: E402

CTX = 512
CACHE_LEN = 1024
ITERS = 128


def _sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])


def _time(loop, *args):
    _sync(loop(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(loop(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[1]


def bench_cache(params, cfg, batch):
    """Steady-state decode via the generic KVCache path (bench.py protocol)."""
    cache = init_kv_cache(cfg, batch, CACHE_LEN, dtype=jnp.bfloat16)
    lens = jnp.full((batch,), CTX, jnp.int32)
    toks = jnp.ones((batch, 1), jnp.int32)

    @jax.jit
    def loop(params, cache, toks, lens):
        def body(carry, _):
            cache, toks, lens = carry
            logits, cache = forward(params, toks, cfg, cache=cache,
                                    start_pos=lens, kv_lens=lens + 1)
            toks = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None]
            return (cache, toks, lens + 1), toks

        (cache, toks, lens), out = jax.lax.scan(
            body, (cache, toks, lens), None, length=ITERS)
        return out

    dt = _time(loop, params, cache, toks, lens)
    return batch * ITERS / dt


def bench_arena(params, cfg, batch, kv_dtype):
    """Steady-state decode via the fused arena kernel (engine fast path)."""
    L, Hk, Dh = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    ka = jnp.zeros((L, batch, Hk, Dh, CACHE_LEN), kv_dtype)
    va = jnp.zeros((L, batch, Hk, Dh, CACHE_LEN), kv_dtype)
    lens = jnp.full((batch,), CTX, jnp.int32)
    toks = jnp.ones((batch, 1), jnp.int32)
    ks = jnp.full((Hk,), 0.05, jnp.float32)  # calibrated-scale stand-in
    vs = jnp.full((Hk,), 0.05, jnp.float32)

    @jax.jit
    def loop(params, ka, va, toks, lens):
        def body(carry, _):
            ka, va, toks, lens = carry
            logits, ka, va = forward_decode_arena(
                params, toks, cfg, ka, va, lens, kv_scale=(ks, vs))
            toks = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)[:, None]
            return (ka, va, toks, lens + 1), None

        (ka, va, toks, lens), _ = jax.lax.scan(
            body, (ka, va, toks, lens), None, length=ITERS)
        return toks

    dt = _time(loop, params, ka, va, toks, lens)
    return batch * ITERS / dt


def main():
    cfg = get_config("llama-3.2-1b")
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    q_int8 = quantize_params(params, recipe_set_by_name("int8"))

    bf16_tps = bench_cache(params, cfg, 8)
    del params
    print(json.dumps({"config": "bf16 w + bf16 KV", "batch": 8,
                      "tokens_per_s": round(bf16_tps, 1)}), flush=True)

    int8w_tps = bench_cache(q_int8, cfg, 44)
    print(json.dumps({"config": "int8 w + bf16 KV", "batch": 44,
                      "tokens_per_s": round(int8w_tps, 1),
                      "x": round(int8w_tps / bf16_tps, 3)}), flush=True)

    for batch in (88,):
        tps = bench_arena(q_int8, cfg, batch, jnp.int8)
        print(json.dumps({"config": "int8 w + int8 arena KV", "batch": batch,
                          "tokens_per_s": round(tps, 1),
                          "x": round(tps / bf16_tps, 3)}), flush=True)

    # Cross-check: the arena path at batch 44 with bf16 arena — isolates the
    # kernel-vs-XLA-path difference from the int8-KV capacity win.
    tps44 = bench_arena(q_int8, cfg, 44, jnp.bfloat16)
    print(json.dumps({"config": "int8 w + bf16 arena KV", "batch": 44,
                      "tokens_per_s": round(tps44, 1),
                      "x": round(tps44 / bf16_tps, 3)}), flush=True)


if __name__ == "__main__":
    main()
