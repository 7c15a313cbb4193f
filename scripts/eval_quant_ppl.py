"""Post-training-quantization quality: eval ppl per weight storage format.

VERDICT r3 #7 asked for an int4 Δppl on a real checkpoint (speed without
quality is half a result). This loads a trained checkpoint, quantizes the
weights under each serving storage format, and evaluates perplexity on the
held-out corpus split — no training, pure PTQ quality, the reference's
inference-eval protocol column (thesis c3 methodology: same weights, FP8 vs
FP16 vs FP32 storages).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_quant_ppl.py \
      --model debug-small --weights /tmp/vo \
      --corpus /tmp/llm_fp8_corpus_2k --seq_len 256 \
      --formats bf16 fp8 int8 int4 --out docs/eval_quant_ppl.json
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="debug-small")
    ap.add_argument("--weights", default="/tmp/vo")
    ap.add_argument("--corpus", default="/tmp/llm_fp8_corpus_2k")
    ap.add_argument("--seq_len", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max_eval_batches", type=int, default=80)
    ap.add_argument("--formats", nargs="+",
                    default=["bf16", "fp8", "int8", "int4"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from llm_fp8_tpu.models import (
        get_config, load_hf_checkpoint, quantize_params,
    )
    from llm_fp8_tpu.quant import LAYERWISE, recipe_set_by_name
    from llm_fp8_tpu.training import TrainConfig, Trainer
    from llm_fp8_tpu.training.data import load_packed_corpus, make_batches

    cfg = get_config(args.model)
    base = load_hf_checkpoint(args.weights, cfg, dtype=jnp.float32)
    _, eval_rows = load_packed_corpus(
        f"{args.corpus}/corpus.txt", f"{args.corpus}/tokenizer.json",
        args.seq_len)
    trainer = Trainer(cfg, TrainConfig(total_steps=1))

    def batches():
        it = make_batches(eval_rows, args.batch, max_len=args.seq_len,
                          shuffle=False, drop_last=False)
        for i, b in enumerate(it):
            if i >= args.max_eval_batches:
                break
            yield {k: jnp.asarray(v) for k, v in b.items()}

    results = {}
    for fmt in args.formats:
        if fmt == "bf16":
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), base)
        elif fmt == "fp8":
            params = quantize_params(base, LAYERWISE)
        else:
            params = quantize_params(base, recipe_set_by_name(fmt))
        ev = trainer.evaluate(params, batches())
        row = {"perplexity": round(ev["perplexity"], 4),
               "eval_loss": round(ev["eval_loss"], 6)}
        results[fmt] = row
        if "bf16" in results:
            b = results["bf16"]["perplexity"]
            row["delta_ppl_vs_bf16_pct"] = round(
                100.0 * (row["perplexity"] - b) / b, 4)
        print(json.dumps({fmt: row}), flush=True)
        del params
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
