"""Same-run decomposition of the 1B forward: where do the non-MXU ms live?

fwd_only measured ~112 ms at 8x512 (dots remat) vs a 51.5 ms matmul-ideal
(2PT at 197 TF/s) -- ~46% efficiency uniformly in fwd AND bwd
(scripts/profile_train.py). This probe times, in one process:

  gemms   - the exact per-layer GEMM chain (qkv, wo, gate|up, down) as bare
            jnp.dot over a 16-layer scan, same shapes/dtypes as the model
  flash   - 16x the flash-attention forward at the model's shapes
  norms   - 32x fused residual-RMSNorm + rope apply at model shapes
  embed_head - embed lookup + final norm + lm_head
  model   - the real forward() for reference

If gemms alone is >> ideal, the MXU shapes themselves are the ceiling (XLA
GEMM efficiency at hidden 2048) and the fix is shape-level (fused wider
projections). If model >> gemms+flash+norms, the scan/layout glue is eating
time. Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fwd_parts.py
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from llm_fp8_tpu.models import get_config, init_params
from llm_fp8_tpu.models.llama import forward
from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.kernels.rmsnorm import rmsnorm_residual_fused as rmsnorm_residual

B, S = 8, 512
STEPS = 8
TRIALS = 3


def _sync(x):
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.reshape(leaf, (-1,))[:1])


def _time(fn, *args):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[TRIALS // 2] / STEPS * 1000.0  # ms per step


def main():
    cfg = get_config("llama-3.2-1b")
    key = jax.random.PRNGKey(0)
    params = init_params(cfg, key)
    L, D, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    T = B * S
    x = jax.random.normal(key, (T, D), jnp.bfloat16)
    lay = params["layers"]

    ws = (lay["wqkv"], lay["wo"], lay["w_gate_up"], lay["w_down"])

    @jax.jit
    def gemms(x0, ws):
        def body(c, w):
            wqkv, wo, wgu, wdn = w
            qkv = jnp.dot(c, wqkv)
            att = jnp.dot(qkv[:, : Hq * Dh], wo)
            gu = jnp.dot(c + att, wgu)
            out = jnp.dot(gu[:, :I] * gu[:, I:], wdn)
            return c + out, None

        def loop(c, _):
            c, _ = jax.lax.scan(body, c, ws)
            return c, None

        c, _ = jax.lax.scan(loop, x0, None, length=STEPS)
        return c

    q = jax.random.normal(key, (B, S, Hq, Dh), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hk, Dh), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hk, Dh), jnp.bfloat16)

    @jax.jit
    def flash(q, k, v):
        def body(c, _):
            o = attention(q + c, k, v, causal=True)
            return c + o[0, 0, 0, 0].astype(jnp.float32), None

        def loop(c, _):
            c, _ = jax.lax.scan(body, c, None, length=L)
            return c, None

        c, _ = jax.lax.scan(loop, jnp.float32(0), None, length=STEPS)
        return c

    g = jnp.ones((D,), jnp.bfloat16)

    @jax.jit
    def norms(x0):
        def body(c, _):
            h, r = rmsnorm_residual(c, c, g, cfg.rms_eps)
            return h + r * 1e-6, None

        def loop(c, _):
            c, _ = jax.lax.scan(body, c, None, length=2 * L)
            return c, None

        c, _ = jax.lax.scan(loop, x0, None, length=STEPS)
        return c

    tokens = jax.random.randint(key, (B, S), 0, cfg.vocab_size)

    @jax.jit
    def model(tokens, params):
        def body(c, _):
            # params passed as arg, not constant; the carry keeps a LIVE
            # float dependency on the output (an integer multiply-by-zero
            # would be constant-folded and the whole forward DCE'd).
            lo = forward(params, tokens + c.astype(jnp.int32), cfg)
            return lo[0, 0, 0].astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return c

    res = {}
    # Print incrementally: over the tunnel each 1B-scale compile is slow and
    # a timeout should still leave partial evidence on stdout.
    for name, fn, arg in (
        ("gemms_ms", gemms, (x, ws)),
        ("flash_ms", flash, (q, k, v)),
        ("norms_ms", norms, (x,)),
    ):
        res[name] = round(_time(fn, *arg), 2)
        print(json.dumps({name: res[name]}), flush=True)
    if os.environ.get("PROFILE_MODEL", "0") == "1":
        res["model_ms"] = round(_time(model, tokens, params), 2)
    gemm_flops = 2 * T * (D * (Hq + 2 * Hk) * Dh + Hq * Dh * D + D * 2 * I + I * D) * L
    res["gemm_ideal_ms"] = round(gemm_flops / 197e12 * 1000, 2)
    res["device"] = jax.devices()[0].device_kind
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
