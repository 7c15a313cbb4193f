"""Speculative-engine throughput on the real chip.

The reference's ``decode_speculative`` is benchmarked with trained
(target, draft) pairs (``flash_attn/utils/generation.py:269-565``). Two
modes here:

* default (air-gapped random weights): measures the weight-independent
  bounds — plain greedy engine tokens/s, SpecEngine at a self-draft (100%
  acceptance, maximally expensive draft → pure mechanism overhead) and a
  4-layer prefix draft (cheap draft, ~0% acceptance floor).
* ``--target_path/--draft_path`` (trained pair, scripts/train_spec_pair.py):
  the real measurement — prompts drawn from the held-out corpus rows, so
  acceptance reflects two models trained on the same text distribution.

Usage:
  python scripts/bench_spec.py                       # random-weight bounds
  python scripts/bench_spec.py \
      --target llama-1b-32k  --target_path /tmp/spec_pair/target \
      --draft llama-150m-32k --draft_path /tmp/spec_pair/draft \
      --corpus /tmp/llm_fp8_corpus --gammas 2 4 6
"""
import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from llm_fp8_tpu.models import (  # noqa: E402
    get_config, init_params, load_hf_checkpoint,
)
from llm_fp8_tpu.serving import (  # noqa: E402
    Engine, EngineConfig, SamplingParams, SpecEngine,
)

SLOTS = 8
PROMPT = 128
NEW = 64
GAMMA = 4


def run(eng, prompts, n_requests=SLOTS, max_new=NEW):
    sp = SamplingParams(max_new_tokens=max_new)
    for i in range(n_requests):
        eng.add_request(prompts[i % len(prompts)], sp)
    t0 = time.perf_counter()
    done = eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(r.output) for r in done)
    return toks, dt


def random_prompts(vocab, n=SLOTS, length=PROMPT):
    rng = np.random.RandomState(0)
    return [rng.randint(1, vocab, length).astype(np.int32)
            for _ in range(n)]


def corpus_prompts(corpus_dir, seq_len, n=SLOTS, length=PROMPT):
    """Held-out rows from the packed corpus — real-text prompts, so the
    draft's acceptance rate is the production quantity."""
    from llm_fp8_tpu.training.data import load_packed_corpus

    _, eval_rows = load_packed_corpus(
        f"{corpus_dir}/corpus.txt", f"{corpus_dir}/tokenizer.json", seq_len)
    return [np.asarray(eval_rows[i][:length], np.int32) for i in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="llama-3.2-1b")
    ap.add_argument("--draft", default=None)
    ap.add_argument("--target_path", default=None)
    ap.add_argument("--draft_path", default=None)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--gammas", type=int, nargs="+", default=[GAMMA])
    ap.add_argument("--max_new", type=int, default=NEW)
    # Committed-token budget per dispatch for BOTH engines: the plain
    # engine chains decode_burst greedy steps; the SpecEngine chains
    # decode_burst // 2 speculative rounds (r5: rounds scan on-device, and
    # the round budget matches plain's dispatch amortization).
    ap.add_argument("--decode_burst", type=int, default=32)
    ap.add_argument("--max_seq_len", type=int, default=512,
                    help="arena length; long-generation configs (e.g. 2048 "
                    "with --max_new 1500) are where speculation's economics "
                    "improve: the target step slows with cache length while "
                    "the draft lane's cost is nearly flat")
    args = ap.parse_args()

    cfg = get_config(args.target)
    if args.target_path:
        params = load_hf_checkpoint(args.target_path, cfg,
                                    dtype=jnp.bfloat16)
    else:
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    if args.corpus:
        prompts = corpus_prompts(args.corpus, 512)
    else:
        prompts = random_prompts(cfg.vocab_size)

    ecfg = EngineConfig(max_slots=SLOTS, max_seq_len=args.max_seq_len,
                        kv_dtype=jnp.bfloat16,
                        decode_burst=args.decode_burst)

    eng = Engine(params, cfg, ecfg)
    toks, dt = run(eng, prompts, max_new=args.max_new)  # compile
    toks, dt = run(eng, prompts, max_new=args.max_new)
    base = toks / dt
    print(json.dumps({"config": "plain_greedy",
                      "tokens_per_s": round(base, 1)}), flush=True)
    del eng

    if args.draft_path:
        dcfg = get_config(args.draft)
        dparams = load_hf_checkpoint(args.draft_path, dcfg,
                                     dtype=jnp.bfloat16)
        pairs = [("spec_trained_draft", dparams, dcfg)]
    else:
        dcfg = dataclasses.replace(cfg, name="draft-prefix", num_layers=4)
        dparams = {
            "embed": params["embed"],
            "final_norm": params["final_norm"],
            "layers": jax.tree_util.tree_map(
                lambda x: x[:4], params["layers"]),
        }
        pairs = [("spec_prefix_draft", dparams, dcfg),
                 ("spec_self_draft", params, cfg)]

    for name, dp, dc in pairs:
        for gamma in args.gammas:
            spec = SpecEngine(params, cfg, dp, dc, ecfg, gamma=gamma)
            toks, dt = run(spec, prompts, max_new=args.max_new)  # compile
            spec.accepted_histogram.clear()
            toks, dt = run(spec, prompts, max_new=args.max_new)
            hist = list(spec.accepted_histogram)
            print(json.dumps({
                "config": name, "gamma": gamma,
                "tokens_per_s": round(toks / dt, 1),
                "vs_plain_x": round(toks / dt / base, 3),
                "mean_accepted": (round(float(np.mean(hist)), 3)
                                  if hist else None),
            }), flush=True)
            del spec


if __name__ == "__main__":
    main()
