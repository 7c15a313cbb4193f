"""Train a (target, draft) pair on the real-text corpus for speculative
decoding measurement (VERDICT r3 #4).

The reference benchmarks ``decode_speculative`` with trained pairs
(``flash_attn/utils/generation.py:269-565``); random weights give ~0
acceptance (measured floor 0.31x, docs/PERF_NOTES.md). This trains, in-env:

* target: llama-1b-32k (1.1B params, the round-2 precision-study model)
* draft:  llama-150m-32k (~8x fewer params, same 32k BPE vocab)

both on the same packed real-text corpus (scripts/build_corpus.py), then
exports HF-layout checkpoints for scripts/bench_spec.py --target_path/
--draft_path. Acceptance comes from the two models having learned the same
text distribution — exactly the production setup.

Usage (TPU, ~20 min for the defaults):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_spec_pair.py \
      --corpus /tmp/llm_fp8_corpus --out /tmp/spec_pair \
      --target_steps 3000 --draft_steps 3000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def train_one(model_name, train_seqs, steps, seq_len, batch, out_dir,
              *, remat, adam_mu_dtype, lr, eval_seqs=None,
              param_dtype="float32"):
    from llm_fp8_tpu.models import get_config, init_params
    from llm_fp8_tpu.training import TrainConfig, Trainer
    from llm_fp8_tpu.training.checkpoint import export_hf
    from llm_fp8_tpu.training.data import make_batches

    cfg = get_config(model_name)
    trainer = Trainer(cfg, TrainConfig(
        learning_rate=lr, warmup_steps=min(100, steps // 10),
        total_steps=steps, schedule="cosine", recipes="bf16",
        remat=remat, adam_mu_dtype=adam_mu_dtype,
    ))
    params = init_params(cfg, jax.random.PRNGKey(0),
                         dtype=jnp.dtype(param_dtype))
    state = trainer.init_state(params)
    n = 0
    t0 = time.perf_counter()
    epoch = 0
    last_loss = None
    while n < steps:
        for b in make_batches(train_seqs, batch, max_len=seq_len,
                              shuffle=True, seed=epoch):
            if n >= steps:
                break
            state, m = trainer.train_step(
                state, {k: jnp.asarray(v) for k, v in b.items()})
            n += 1
            if n % 200 == 0:
                last_loss = float(m["loss"])
                print(f"[{model_name}] step {n}/{steps} loss={last_loss:.4f}"
                      f" ({(time.perf_counter() - t0) / n:.3f}s/step)",
                      flush=True)
        epoch += 1
    jax.block_until_ready(state.params["final_norm"])
    wall = time.perf_counter() - t0
    result = {"model": model_name, "steps": steps, "wall_s": round(wall, 1),
              "final_loss": last_loss}
    if eval_seqs:
        ev = trainer.evaluate(
            state.params,
            ({k: jnp.asarray(v) for k, v in b.items()}
             for b in make_batches(eval_seqs[:400], batch, max_len=seq_len,
                                   shuffle=False, drop_last=False)),
        )
        result["eval_ppl"] = round(ev["perplexity"], 3)
    os.makedirs(out_dir, exist_ok=True)
    export_hf(state.params, cfg, out_dir)
    print(json.dumps(result), flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/llm_fp8_corpus")
    ap.add_argument("--out", default="/tmp/spec_pair")
    ap.add_argument("--target", default="llama-1b-32k")
    ap.add_argument("--draft", default="llama-150m-32k")
    ap.add_argument("--target_steps", type=int, default=3000)
    ap.add_argument("--draft_steps", type=int, default=3000)
    ap.add_argument("--seq_len", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--only", choices=["target", "draft"], default=None)
    args = ap.parse_args()

    from llm_fp8_tpu.training.data import load_packed_corpus

    train_seqs, eval_seqs = load_packed_corpus(
        f"{args.corpus}/corpus.txt", f"{args.corpus}/tokenizer.json",
        args.seq_len,
    )
    print(f"packed corpus: {len(train_seqs)} train rows of {args.seq_len}",
          flush=True)
    results = {}
    if args.only in (None, "draft"):
        results["draft"] = train_one(
            args.draft, train_seqs, args.draft_steps, args.seq_len,
            args.batch, f"{args.out}/draft", remat=False,
            adam_mu_dtype=None, lr=3e-4, eval_seqs=eval_seqs)
    if args.only in (None, "target"):
        # 1B on one 16 GB chip: dots remat + bf16 mu + bf16 master weights
        # (f32 params put the AdamW state at 19.6 GB — measured compile-OOM;
        # BENCH_TRAIN.json trains the same model in bf16).
        results["target"] = train_one(
            args.target, train_seqs, args.target_steps, args.seq_len,
            args.batch, f"{args.out}/target", remat="dots",
            adam_mu_dtype="bfloat16", lr=1e-4, eval_seqs=eval_seqs,
            param_dtype="bfloat16")
    with open(f"{args.out}/train_summary.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
