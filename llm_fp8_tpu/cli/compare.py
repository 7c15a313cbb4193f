"""Precision-comparison experiment: the paper's FP8-vs-BF16 study as a command.

Reproduces the reference's experimental protocol
(``paper/conference_101719.tex:205-296``; driven by ``StabilityExperiment``,
``train_fp8.py:408-654``): train the SAME model on the SAME data under each
precision config {bf16, fp8-default(layer-wise), fp8-hybrid, fp8-mxfp8},
then compare wall-time, final eval perplexity, and loss-variance statistics.

  python -m llm_fp8_tpu.cli.compare --model_name debug-small --random_init \\
      --synthetic_samples 200 --configs bf16 default hybrid --num_epochs 1

Emits one JSON report (per-config time / Δppl vs bf16 / stability stats).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="FP8 vs BF16 comparison study")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--weights_path", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--synthetic_samples", type=int, default=None)
    p.add_argument("--dataset_name", type=str, default="nvidia/OpenMathInstruct-2")
    p.add_argument("--split_name", type=str, default="train_1M")
    p.add_argument("--num_of_samples", type=int, default=None)
    # Air-gapped real-data path: a raw-text corpus + locally-trained BPE
    # tokenizer (scripts/build_corpus.py), packed into full seq_len rows.
    p.add_argument("--corpus_file", type=str, default=None)
    p.add_argument("--tokenizer_file", type=str, default=None)
    p.add_argument("--max_tokens", type=int, default=None,
                   help="cap the packed-corpus token count")
    p.add_argument("--max_steps", type=int, default=None,
                   help="cap train steps per config")
    p.add_argument("--max_eval_batches", type=int, default=None)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--adam_mu_dtype", type=str, default=None)
    # Master-weight dtype. The reference trains bf16 params under torch
    # AdamW (train_fp8.py:115,200) whose state tensors inherit bf16 —
    # `bfloat16` reproduces that memory model exactly (optax's nu inherits
    # the param dtype) and is what fits a 1B study on one 16GB chip.
    p.add_argument("--param_dtype", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip configs already present in --out, merge results")
    p.add_argument("--ramp_steps", type=int, default=0,
                   help="training steps excluded from the steady step_s "
                   "timing (they still train). Over a remote-dispatch "
                   "tunnel the per-step round-trip throughput ramps for "
                   "O(100) steps; 300 is a good value there")
    p.add_argument("--configs", nargs="+",
                   default=["bf16", "default", "hybrid", "mxfp8"],
                   choices=["bf16", "default", "hybrid", "mxfp8",
                            "int8_train"])
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_seq_length", type=int, default=512)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--num_warmup_steps", type=int, default=10)
    p.add_argument("--out", type=str, default="precision_comparison.json")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from llm_fp8_tpu.models import get_config, init_params, load_hf_checkpoint
    from llm_fp8_tpu.training import (
        TrainConfig, Trainer, DataConfig, DataManager, StabilityTracker,
    )
    from llm_fp8_tpu.training.data import synthetic_examples

    cfg = get_config(args.model_name)

    if args.corpus_file:
        from llm_fp8_tpu.training.data import load_packed_corpus

        train_seqs, eval_seqs = load_packed_corpus(
            args.corpus_file, args.tokenizer_file, args.max_seq_length,
            max_tokens=args.max_tokens,
        )
        dm = DataManager(
            DataConfig(max_seq_length=args.max_seq_length,
                       batch_size=args.batch_size),
            type("_T", (), {"pad_token_id": 0, "eos_token_id": 0})(),
        )
        print(f"packed corpus: {len(train_seqs)} train / {len(eval_seqs)} "
              f"eval rows of {args.max_seq_length}")
    else:
        if args.synthetic_samples:
            class _Tok:
                pad_token_id = 0
                eos_token_id = 0

                def __call__(self, text, truncation=True, max_length=None):
                    return {"input_ids": [ord(c) % (cfg.vocab_size - 3) + 3
                                          for c in text][:max_length]}

            tok, examples = _Tok(), synthetic_examples(args.synthetic_samples)
        else:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model_name)
            examples = None
        dm = DataManager(
            DataConfig(dataset_name=args.dataset_name,
                       split_name=args.split_name,
                       max_seq_length=args.max_seq_length,
                       num_of_samples=args.num_of_samples,
                       batch_size=args.batch_size),
            tok,
        )
        train_seqs, eval_seqs = dm.build(examples)
    steps_per_epoch = len(train_seqs) // args.batch_size
    total_steps = max(steps_per_epoch * args.num_epochs, 1)
    if args.max_steps is not None:
        total_steps = min(total_steps, args.max_steps)

    # Identical initial weights for every config — the controlled variable is
    # precision only (the reference reloads the pretrained checkpoint per run).
    if args.random_init or args.weights_path is None:
        base_params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    else:
        base_params = load_hf_checkpoint(args.weights_path, cfg, dtype=jnp.float32)

    results = {}
    if args.resume and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
        print(f"resume: found {sorted(results)} in {args.out}")

    for recipes in args.configs:
        if recipes in results:
            continue
        trainer = Trainer(
            cfg,
            TrainConfig(learning_rate=args.learning_rate,
                        warmup_steps=args.num_warmup_steps,
                        total_steps=total_steps, recipes=recipes,
                        remat=args.remat, adam_mu_dtype=args.adam_mu_dtype),
        )
        arm_params = jax.tree_util.tree_map(jnp.copy, base_params)
        if args.param_dtype is not None:
            dt = jnp.dtype(args.param_dtype)
            arm_params = jax.tree_util.tree_map(
                lambda p: p.astype(dt), arm_params
            )
        state = trainer.init_state(arm_params)
        tracker = StabilityTracker(precision_name=recipes)
        # Metric pulls are DEFERRED: a per-step float(m["loss"]) forces a
        # device→host sync every step, which over a remote-compile tunnel
        # dominates wall time (round-3 artifact measured 1.0–1.8 s/step
        # where the step-time bench says ~0.3 s — the anomaly was host
        # round-trips + chip contention, not fp8 math). Pack the 4 scalars
        # into one device array per step and pull them once after the loop
        # so dispatch pipelines and wall ≈ steps × device step time.
        pack = jax.jit(lambda m: jnp.stack([
            m["loss"], m["grad_norm"],
            m["activation_mean"], m["activation_std"],
        ]).astype(jnp.float32))
        packed = []
        steps = 0
        compile_s = None
        ramp_s = None
        t0 = time.perf_counter()
        for epoch in range(args.num_epochs):
            if steps >= total_steps:
                break
            for batch in dm.batches(train_seqs, args.batch_size,
                                    shuffle=True, seed=epoch):
                if steps >= total_steps:
                    break
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                state, m = trainer.train_step(state, batch)
                packed.append(pack(m))
                steps += 1
                if steps == 1:
                    # First step = compile + one execution; report it apart
                    # so wall-time and steady step-time agree.
                    jax.block_until_ready(packed[0])
                    compile_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                elif steps == 1 + args.ramp_steps and args.ramp_steps:
                    # Untimed dispatch-ramp window (still real training
                    # steps): steady step_s starts here.
                    jax.block_until_ready(packed[-1])
                    ramp_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                elif steps % 200 == 0:
                    timed = steps - 1 - (args.ramp_steps
                                         if steps > args.ramp_steps + 1
                                         else 0)
                    print(f"[{recipes}] step {steps}/{total_steps} "
                          f"loss={float(packed[-1][0]):.4f} "
                          f"({(time.perf_counter()-t0)/max(timed, 1):.3f}"
                          f"s/step)", flush=True)
        jax.block_until_ready(state.params["final_norm"])
        wall = time.perf_counter() - t0
        timed_ramp = args.ramp_steps if steps > args.ramp_steps + 1 else 0
        steady_steps = max(steps - 1 - timed_ramp, 1)
        for row in np.asarray(jax.device_get(jnp.stack(packed))):
            tracker.track_step(
                float(row[0]), grad_norm=float(row[1]),
                activation_mean=float(row[2]), activation_std=float(row[3]))
        eval_iter = dm.batches(eval_seqs, args.batch_size, shuffle=False,
                               drop_last=False)
        if args.max_eval_batches is not None:
            import itertools

            eval_iter = itertools.islice(eval_iter, args.max_eval_batches)
        ev = trainer.evaluate(
            state.params,
            ({k: jnp.asarray(v) for k, v in b.items()} for b in eval_iter),
        )
        results[recipes] = {
            "train_wall_s": round(wall, 2),
            "compile_s": round(compile_s, 2) if compile_s else None,
            "ramp_s": round(ramp_s, 2) if ramp_s else None,
            "step_s": round(wall / steady_steps, 4),
            "steps_per_s": round(steady_steps / wall, 3),
            "steps": steps,
            "eval_loss": ev["eval_loss"],
            "perplexity": ev["perplexity"],
            "stability": tracker.report(),
        }
        var = results[recipes]["stability"]["loss_stats"].get("variance")
        print(f"[{recipes}] wall={wall:.1f}s ppl={ev['perplexity']:.4f} "
              f"loss_var={var if var is None else round(var, 5)}")
        # Persist after every config — a crash mid-study keeps finished arms
        # (combine later runs with --resume).
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2, default=str)

    if "bf16" in results:
        base_ppl = results["bf16"]["perplexity"]
        for name, r in results.items():
            r["delta_ppl_vs_bf16_pct"] = round(
                100.0 * (r["perplexity"] - base_ppl) / base_ppl, 3
            )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(json.dumps({k: {kk: v[kk] for kk in
                          ("train_wall_s", "perplexity",
                           "delta_ppl_vs_bf16_pct") if kk in v}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
