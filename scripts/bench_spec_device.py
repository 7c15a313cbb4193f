"""On-device speculative round cost, isolated from engine host economics.

bench_spec.py measures the ENGINE (host scheduling + tunnel dispatch +
device compute). This times the jitted speculative burst itself — the same
discipline as bench.py's scan-loop decode — so the mechanism's device cost
is separated from the serving loop's:

  plain floor:  bench_decode-style scan, ms/step, tokens/s
  spec burst:   _spec_step(steps=R) timed alone, ms/round, committed
                tokens/s at the measured acceptance

If the spec burst's committed tokens/s beats the plain scan's, the
mechanism wins on-device and any end-to-end deficit is host-side; if not,
the draft+verify compute itself is the bound.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models import get_config, load_hf_checkpoint
from llm_fp8_tpu.serving import Engine, EngineConfig, SamplingParams, SpecEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="llama-1b-32k")
    ap.add_argument("--target_path", default="/tmp/spec_pair/target")
    ap.add_argument("--draft", default="llama-150m-32k")
    ap.add_argument("--draft_path", default="/tmp/spec_pair/draft")
    ap.add_argument("--corpus", default="/tmp/llm_fp8_corpus")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    args = ap.parse_args()

    cfg = get_config(args.target)
    params = load_hf_checkpoint(args.target_path, cfg, dtype=jnp.bfloat16)
    dcfg = get_config(args.draft)
    dparams = load_hf_checkpoint(args.draft_path, dcfg, dtype=jnp.bfloat16)

    from scripts.bench_spec import corpus_prompts  # noqa: E402

    prompts = corpus_prompts(args.corpus, 512, n=args.slots)

    ecfg = EngineConfig(max_slots=args.slots, max_seq_len=2048,
                        kv_dtype=jnp.bfloat16, prefill_buckets=(128, 256))
    spec = SpecEngine(params, cfg, dparams, dcfg, ecfg, gamma=args.gamma)
    # Admit every prompt (prefill both arenas) without running any rounds.
    for p in prompts:
        spec.add_request(p[:120], SamplingParams(max_new_tokens=1500))
    for slot in range(args.slots):
        pass
    # One engine step does admission + a first burst; do it via step() once.
    spec.step()

    lens = jnp.asarray(spec.slot_lens)
    toks = jnp.asarray(spec.slot_last_tok)
    key = jax.random.PRNGKey(7)
    R = args.rounds

    def run_burst():
        return spec._spec_step(
            spec.params, spec.dparams, spec.cache, spec.dcache,
            toks, lens, key, steps=R,
        )

    # Warmup/compile. NOTE: donation of (tcache, dcache) — rebuild refs
    # from the outputs each call so repeated timing is legal.
    out = run_burst()
    jax.block_until_ready(out[0])
    spec.cache, spec.dcache = out[4], out[5]
    times, accepted = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        committed, n_commit, new_last, new_lens, tc, dc = spec._spec_step(
            spec.params, spec.dparams, spec.cache, spec.dcache,
            toks, lens, key, steps=R,
        )
        spec.cache, spec.dcache = tc, dc
        jax.block_until_ready(n_commit)
        np.asarray(n_commit)[0]
        times.append(time.perf_counter() - t0)
        accepted.append(float(np.mean(np.asarray(n_commit))) - 1.0)
    dt = sorted(times)[1]
    mean_acc = float(np.mean(accepted))
    per_round_ms = dt / R * 1e3
    committed_tps = args.slots * (mean_acc + 1.0) * R / dt

    # Plain floor: same-cadence greedy scan on the target (bench.py loop).
    import bench

    plain_tps = bench.bench_decode(params, cfg, jnp.bfloat16, args.slots)

    print(json.dumps({
        "gamma": args.gamma, "rounds_per_dispatch": R, "slots": args.slots,
        "spec_round_ms": round(per_round_ms, 2),
        "mean_accepted": round(mean_acc, 3),
        "spec_committed_tokens_per_s": round(committed_tps, 1),
        "plain_scan_tokens_per_s": round(plain_tps, 1),
        "device_level_x": round(committed_tps / plain_tps, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
