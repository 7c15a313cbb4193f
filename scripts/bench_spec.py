"""Speculative-engine throughput on the real chip.

The reference's ``decode_speculative`` is benchmarked with trained
(target, draft) pairs; air-gapped random weights give near-zero acceptance,
so this measures the two quantities that ARE weight-independent:

* plain greedy engine tokens/s (baseline),
* SpecEngine tokens/s at the two acceptance extremes — a self-draft
  (target == draft → every proposal accepted; measures pure mechanism
  overhead at 100% acceptance with a maximally EXPENSIVE draft) and a
  4-layer prefix draft (cheap draft, ~0% acceptance on random weights —
  the floor).

Together with the measured per-round cost these bound real-pair speedup:
tokens/round = 1 + accept_rate·gamma; round cost = gamma·draft_step +
target_verify(gamma+1). A trained draft 4× smaller with the reference's
typical ~70% acceptance sits between the two measured lines.

Usage: python scripts/bench_spec.py  (prints one JSON line per row)
"""
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from llm_fp8_tpu.models import get_config, init_params  # noqa: E402
from llm_fp8_tpu.serving import (  # noqa: E402
    Engine, EngineConfig, SamplingParams, SpecEngine,
)

MODEL = "llama-3.2-1b"
SLOTS = 8
PROMPT = 128
NEW = 64
GAMMA = 4


def run(eng, cfg, n_requests=SLOTS):
    rng = np.random.RandomState(0)
    sp = SamplingParams(max_new_tokens=NEW)
    for _ in range(n_requests):
        eng.add_request(
            rng.randint(1, cfg.vocab_size, PROMPT).astype(np.int32), sp)
    t0 = time.perf_counter()
    done = eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.output) for r in done)
    return toks, dt


def main():
    cfg = get_config(MODEL)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    dcfg = dataclasses.replace(cfg, name="draft-prefix", num_layers=4)
    dparams = {
        "embed": params["embed"],
        "final_norm": params["final_norm"],
        "layers": jax.tree_util.tree_map(lambda x: x[:4], params["layers"]),
    }
    ecfg = EngineConfig(max_slots=SLOTS, max_seq_len=512,
                        kv_dtype=jnp.bfloat16)

    eng = Engine(params, cfg, ecfg)
    toks, dt = run(eng, cfg)  # compile
    toks, dt = run(eng, cfg)
    base = toks / dt
    print(json.dumps({"config": "plain_greedy",
                      "tokens_per_s": round(base, 1)}), flush=True)
    del eng

    for name, dp, dc in (("spec_prefix_draft", dparams, dcfg),
                         ("spec_self_draft", params, cfg)):
        spec = SpecEngine(params, cfg, dp, dc, ecfg, gamma=GAMMA)
        toks, dt = run(spec, cfg)  # compile
        spec.accepted_histogram.clear()
        toks, dt = run(spec, cfg)
        hist = spec.accepted_histogram
        print(json.dumps({
            "config": name, "gamma": GAMMA,
            "tokens_per_s": round(toks / dt, 1),
            "vs_plain_x": round(toks / dt / base, 3),
            "mean_accepted": round(float(np.mean(hist)), 3) if hist else None,
        }), flush=True)
        del spec


if __name__ == "__main__":
    main()
