"""In-graph decomposition of decode-step time: weights vs cache vs head.

VERDICT r3 asked where the paper-scale decode numbers go: 3B fp8 serves at
~234 GB/s effective and 8B fp8 at ~160 GB/s on a chip whose bf16 decode
streams at ~670 GB/s (llama-3.2-3b bf16@8). Decode is HBM-bound, so the
step decomposes into three independent byte streams:

  gemms_<fmt>  - ONLY the four per-layer weight GEMMs (x[B,1,D] through the
                 stacked-layer scan), per weight format: bf16, fp8 via the
                 fused Pallas dequant-matmul, fp8 via the XLA convert+dot,
                 int8 via the hardware convert+dot. Isolates the
                 weight-streaming rate of each storage format.
  attend       - decode attention over the full [B,S] cache per layer.
                 Isolates the cache-read rate.
  head         - final norm + lm_head (+argmax) — the tied-embedding read.
  full_<fmt>   - the real forward() for cross-checking the sum.

Each part runs as ITERS steps of one on-device lax.scan (single dispatch —
per-step host dispatch over the axon tunnel would swamp ms-scale parts).
Prints ms/step and effective GB/s per part.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_decode_parts.py \
      --model llama-3.2-3b --batch 36 --formats bf16 fp8_fused int8
"""
import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from llm_fp8_tpu.models import get_config
from llm_fp8_tpu.ops.attention import decode_attention
from llm_fp8_tpu.quant import QTensor, E4M3
from llm_fp8_tpu.quant.formats import INT8
from llm_fp8_tpu.quant.dot import qdot

ITERS = 64
TRIALS = 3
CACHE_LEN = 1024


def _sync(x):
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.reshape(leaf, (-1,))[:1])


def _time_loop(run):
    _sync(run())
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        _sync(run())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[TRIALS // 2] / ITERS * 1000.0  # ms/step


@functools.partial(jax.jit, static_argnames=("shape",))
def _random_fp8(k, shape):
    bits = jax.random.bits(k, shape, dtype=jnp.uint8) & jnp.uint8(0x7F)
    bits = jnp.where(bits == jnp.uint8(0x7F), jnp.uint8(0), bits)
    return jax.lax.bitcast_convert_type(bits, jnp.float8_e4m3fn)


def _gemm_weights(cfg, fmt, key):
    """Stacked [L, ...] decode-GEMM weights in the requested storage."""
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    shapes = {
        "wqkv": (L, D, cfg.qkv_dim),
        "wo": (L, cfg.q_dim, D),
        "w_gate_up": (L, D, 2 * I),
        "w_down": (L, I, D),
    }
    ks = iter(jax.random.split(key, len(shapes)))
    out = {}
    for name, shape in shapes.items():
        k = next(ks)
        if fmt == "bf16":
            out[name] = (jax.random.normal(k, shape, jnp.float32) * 0.02
                         ).astype(jnp.bfloat16)
        elif fmt.startswith("fp8"):
            out[name] = QTensor(
                qvalue=_random_fp8(k, shape),
                scale=jnp.full((shape[0], 1, shape[-1]), 1e-2, jnp.float32),
                fmt=E4M3,
            )
        elif fmt == "int8":
            qv = jax.random.randint(k, shape, -127, 128, jnp.int8)
            out[name] = QTensor(
                qvalue=qv,
                scale=jnp.full((shape[0], 1, shape[-1]), 1e-4, jnp.float32),
                fmt=INT8,
            )
        else:
            raise ValueError(fmt)
    return out


def _weight_bytes(cfg, fmt):
    per_layer = (cfg.hidden_size * cfg.qkv_dim + cfg.q_dim * cfg.hidden_size
                 + cfg.hidden_size * 2 * cfg.intermediate_size
                 + cfg.intermediate_size * cfg.hidden_size)
    return cfg.num_layers * per_layer * (2 if fmt == "bf16" else 1)


def bench_gemms(cfg, fmt, batch, impl):
    w = _gemm_weights(cfg, fmt, jax.random.PRNGKey(0))
    x = jnp.ones((batch, 1, cfg.hidden_size), jnp.bfloat16)

    def one_dot(x, wl, out_dim_to_hidden):
        if isinstance(wl, QTensor):
            y = qdot(x, wl, impl=impl)
        else:
            y = jnp.dot(x, wl, preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    @jax.jit
    def loop(w, x):
        def step(x, _):
            def layer(h, lw):
                qkv = one_dot(h, lw["wqkv"], False)
                # keep realistic dataflow: feed q-slice into wo, h into mlp
                o = one_dot(qkv[..., : cfg.q_dim], lw["wo"], True)
                h = h + o
                gu = one_dot(h, lw["w_gate_up"], False)
                gate, up = jnp.split(gu, 2, axis=-1)
                dn = one_dot(jax.nn.silu(gate) * up, lw["w_down"], True)
                return h + dn, None

            x, _ = jax.lax.scan(layer, x, w)
            # re-center so values stay finite over ITERS iterations
            x = x / (jnp.abs(x).max() + 1e-3)
            return x, None

        x, _ = jax.lax.scan(step, x, None, length=ITERS)
        return x

    ms = _time_loop(lambda: loop(w, x))
    gbs = _weight_bytes(cfg, fmt) / 1e9 / (ms / 1e3)
    return ms, gbs


def bench_attend(cfg, batch, kv_dtype=jnp.bfloat16):
    L, Hk, Hq, Dh = (cfg.num_layers, cfg.num_kv_heads, cfg.num_heads,
                     cfg.head_dim)
    k = jnp.zeros((L, batch, CACHE_LEN, Hk, Dh), kv_dtype)
    v = jnp.zeros((L, batch, CACHE_LEN, Hk, Dh), kv_dtype)
    q = jnp.ones((batch, 1, Hq, Dh), jnp.bfloat16)
    lens = jnp.full((batch,), 512, jnp.int32)

    @jax.jit
    def loop(k, v, q, lens):
        def step(carry, _):
            q, lens = carry

            def layer(h, kv):
                kl, vl = kv
                o = decode_attention(h, kl, vl, kv_lens=lens, q_offset=lens)
                return o.astype(jnp.bfloat16), None

            q, _ = jax.lax.scan(layer, q, (k, v))
            return (q, lens), None

        (q, lens), _ = jax.lax.scan(step, (q, lens), None, length=ITERS)
        return q

    ms = _time_loop(lambda: loop(k, v, q, lens))
    nbytes = 2 * L * batch * CACHE_LEN * Hk * Dh * k.dtype.itemsize
    return ms, nbytes / 1e9 / (ms / 1e3)


def bench_head(cfg, batch):
    V, D = cfg.vocab_size, cfg.hidden_size
    emb = jnp.ones((V, D), jnp.bfloat16) * 0.02
    x = jnp.ones((batch, 1, D), jnp.bfloat16)

    @jax.jit
    def loop(emb, x):
        def step(x, _):
            logits = jnp.dot(x, emb.T, preferred_element_type=jnp.float32)
            nxt = jnp.argmax(logits, -1)
            return x + (nxt[..., None] % 7).astype(jnp.bfloat16) * 1e-6, None

        x, _ = jax.lax.scan(step, x, None, length=ITERS)
        return x

    ms = _time_loop(lambda: loop(emb, x))
    return ms, V * D * 2 / 1e9 / (ms / 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3.2-3b")
    ap.add_argument("--batch", type=int, default=36)
    ap.add_argument("--formats", nargs="+",
                    default=["bf16", "fp8_fused", "fp8_xla", "int8"])
    ap.add_argument("--skip_attend", action="store_true")
    args = ap.parse_args()
    cfg = get_config(args.model)
    out = {"model": args.model, "batch": args.batch, "cache_len": CACHE_LEN}
    for fmt in args.formats:
        impl = {"fp8_fused": "fused", "fp8_xla": "xla",
                "int8": None, "bf16": None}[fmt]
        ms, gbs = bench_gemms(cfg, fmt.split("_")[0] if "_" in fmt else fmt,
                              args.batch, impl)
        out[f"gemms_{fmt}_ms"] = round(ms, 3)
        out[f"gemms_{fmt}_gbs"] = round(gbs, 1)
        print(json.dumps(out), flush=True)
    if not args.skip_attend:
        ms, gbs = bench_attend(cfg, args.batch)
        out["attend_ms"] = round(ms, 3)
        out["attend_gbs"] = round(gbs, 1)
        ms, gbs = bench_head(cfg, args.batch)
        out["head_ms"] = round(ms, 3)
        out["head_gbs"] = round(gbs, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
