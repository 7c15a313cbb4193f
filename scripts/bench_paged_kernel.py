"""Paged-attention kernel micro-bench: where do the microseconds go?

The r5 end-to-end long-context run measures the paged decode step at
~6 ms/layer (1B geometry, 8k context, batch 8) — ~10 GB/s effective KV
read against a ~600 GB/s chip. This sweeps the kernel's fetch-shape knobs
to find the bound:

  * pages_per_fetch (nf): iterations per sequence = pages / nf; each
    iteration issues 2*nf slab DMAs and runs Hk dots of nf*page lanes.
  * page_size: fewer/bigger pages trade allocator granularity for DMA
    width (the destination lane-slice of a page write is page_size wide).

Usage (TPU): python scripts/bench_paged_kernel.py --context 8192 --batch 8
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.kernels.paged_attention import paged_attention


def bench(B, Hq, Hk, D, L, context, page_size, nf, dtype, iters=32):
    P = B * (context // page_size) + 8
    max_pages = context // page_size
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hq, D), jnp.float32).astype(jnp.bfloat16)
    if dtype == jnp.int8:
        k_pages = jax.random.randint(
            key, (P, L, Hk, D, page_size), -127, 127, jnp.int8)
        v_pages = k_pages
    else:
        k_pages = jax.random.normal(
            key, (P, L, Hk, D, page_size), jnp.float32).astype(dtype)
        v_pages = k_pages
    lengths = jnp.full((B,), context, jnp.int32)
    tables = jnp.arange(B * max_pages, dtype=jnp.int32).reshape(B, max_pages)

    @jax.jit
    def step(q, k_pages, v_pages, lengths, tables):
        # One full decode attention step: all L layers, like the model loop.
        def body(carry, layer):
            acc = carry
            o = paged_attention(
                q, k_pages, v_pages, lengths, tables, layer,
                kv_scale=1.0 if dtype == jnp.bfloat16 else 0.05,
                pages_per_fetch=nf,
            )
            return acc + o.astype(jnp.float32), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((B, Hq, D), jnp.float32),
            jnp.arange(L, dtype=jnp.int32))
        return acc

    out = step(q, k_pages, v_pages, lengths, tables)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(q, k_pages, v_pages, lengths, tables)
        jax.block_until_ready(out)
        np.asarray(out[0, 0, :1])
        times.append((time.perf_counter() - t0) / iters)
    dt = sorted(times)[1]
    kv_bytes = 2 * B * L * Hk * D * context * jnp.dtype(dtype).itemsize
    return dt, kv_bytes / dt / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--context", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--kv_dtype", default="int8", choices=["int8", "bf16", "fp8"])
    ap.add_argument("--page_sizes", type=int, nargs="+", default=[128, 256])
    ap.add_argument("--nfs", type=int, nargs="+", default=[4, 8, 16, 32])
    args = ap.parse_args()

    dtype = {"int8": jnp.int8, "bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn}[args.kv_dtype]
    for ps in args.page_sizes:
        for nf in args.nfs:
            if nf * ps > args.context:
                continue
            try:
                dt, gbps = bench(
                    args.batch, 16, 8, 64, args.layers, args.context,
                    ps, nf, dtype)
                print(json.dumps({
                    "page_size": ps, "nf": nf,
                    "step_ms": round(dt * 1e3, 3),
                    "ms_per_layer": round(dt * 1e3 / args.layers, 3),
                    "kv_read_gbps": round(gbps, 1),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "page_size": ps, "nf": nf, "error": str(e)[:200],
                }), flush=True)


if __name__ == "__main__":
    main()
