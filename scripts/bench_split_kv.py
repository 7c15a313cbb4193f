"""Long-context decode: num_splits crossover table on the real chip.

The reference picks ``num_splits`` in C++ from occupancy
(``csrc/flash_attn/flash_api.cpp`` ``num_splits_heuristic``,
``hopper/heuristics.h``). This measures the TPU reality the auto-heuristic
(`ops/split_kv.py::auto_num_splits`) encodes: forced splits 1/2/4/8 over
8k/16k caches at small and moderate batch, one process, same-run ratios.

Usage: python scripts/bench_split_kv.py   (prints one JSON line per row)
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from llm_fp8_tpu.ops.attention import decode_attention  # noqa: E402
from llm_fp8_tpu.ops.split_kv import auto_num_splits  # noqa: E402

STEPS = 64
TRIALS = 3


def _sync(x):
    # Over the axon tunnel block_until_ready returns before execution
    # completes; a host fetch is the reliable barrier (bench_train.py).
    import numpy as np

    np.asarray(x)


def _time(fn, *args):
    out = fn(*args)  # compile + warm
    _sync(out)
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[TRIALS // 2] / STEPS


def main():
    Hq, Hk, D = 32, 8, 64  # 1B-class GQA geometry
    rows = []
    for S in (8192, 16384):
        for B in (1, 4):
            kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
            q = jax.random.normal(kq, (B, 1, Hq, D), jnp.bfloat16)
            k = jax.random.normal(kk, (B, S, Hk, D), jnp.bfloat16)
            v = jax.random.normal(kv, (B, S, Hk, D), jnp.bfloat16)
            lens = jnp.full((B,), S, jnp.int32)

            for ns in (1, 2, 4, 8):
                @jax.jit
                def step(q, k, v, lens, ns=ns):
                    def body(c, _):
                        o = decode_attention(
                            q + c, k, v, q_offset=lens - 1, kv_lens=lens,
                            num_splits=ns,
                        )
                        # Full-output dependence: a single-element carry lets
                        # XLA dead-code-eliminate every other (batch, head).
                        return jnp.sum(o.astype(jnp.float32)) * 1e-6, None

                    return jax.lax.scan(
                        body, jnp.float32(0), None, length=STEPS)[0]

                dt = _time(step, q, k, v, lens)
                row = {"cache": S, "batch": B, "num_splits": ns,
                       "us_per_call": round(dt * 1e6, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)
            print(json.dumps({
                "cache": S, "batch": B,
                "auto_choice": auto_num_splits(B, Hk, S),
            }), flush=True)


if __name__ == "__main__":
    main()
