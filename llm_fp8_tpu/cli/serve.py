"""Serving CLI: load → quantize → continuous-batching benchmark/REPL.

The deployment half of the reference study (vLLM FP8-vs-FP16 serving eval,
``thesis/chapters/c3/c3_methodology.tex:46-52``) as a native command:

  python -m llm_fp8_tpu.cli.serve --model_name llama-3.2-1b --random_init \\
      --precision fp8 --num_requests 16 --max_new_tokens 64

Reports tokens/s, p50/p99 TTFT, and peak device memory.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="FP8 TPU serving benchmark")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--weights_path", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--precision", type=str, default="fp8",
                   choices=["fp8", "int8", "int4", "bf16"],
                   help="int8 = weight-only symmetric int8, the v5e-native "
                        "serving format (hardware int8→bf16 convert; "
                        "docs/PERF_NOTES.md)")
    p.add_argument("--fp8_scenario", type=str, default="default",
                   choices=["default", "mxfp8", "hybrid"])
    p.add_argument("--kv_dtype", type=str, default="auto",
                   choices=["auto", "fp8", "bf16", "int8"],
                   help="auto = fp8 on fp8-native backends (v6e+), bf16 on "
                        "v5e/CPU (measured trade-off in docs/PERF_NOTES.md); "
                        "int8 = v5e-native 1-byte KV, per-head scales auto-"
                        "calibrated at first prefill (arena engine only)")
    p.add_argument("--max_slots", type=int, default=8)
    p.add_argument("--max_seq_len", type=int, default=2048)
    p.add_argument("--paged", action="store_true",
                   help="Use the paged-KV engine (block tables + paged "
                        "flash kernel) instead of the contiguous arena")
    p.add_argument("--page_size", type=int, default=128)
    p.add_argument("--num_pages", type=int, default=512)
    p.add_argument("--decode_burst", type=int, default=32,
                   help="Max greedy decode steps fused into one dispatch "
                        "(lax.scan burst; amortizes per-token host "
                        "round-trips). 1 = per-step decode; sampled "
                        "requests always decode per-step")
    p.add_argument("--num_requests", type=int, default=16)
    p.add_argument("--prompt_len", type=int, default=128)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    # Speculative decoding (the reference's decode_speculative inside the
    # batching runtime, flash_attn/utils/generation.py:269-565): a draft
    # model proposes --gamma tokens per slot per step; the target verifies
    # them in one forward. temperature==0 → committed tokens bit-match
    # plain greedy serving.
    p.add_argument("--draft_model", type=str, default=None,
                   help="Enable speculative decoding with this zoo model as "
                        "the draft (random-init unless --draft_weights)")
    p.add_argument("--draft_weights", type=str, default=None)
    p.add_argument("--gamma", type=int, default=4,
                   help="Speculative proposal length per round")
    p.add_argument("--spec_top_k", type=int, default=0)
    p.add_argument("--spec_top_p", type=float, default=0.0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from llm_fp8_tpu.models import (
        MODEL_REGISTRY, load_hf_checkpoint, resolve_model,
    )
    from llm_fp8_tpu.models.llama import forward as llama_forward
    from llm_fp8_tpu.quant import recipe_set_by_name
    from llm_fp8_tpu.serving import Engine, EngineConfig, SamplingParams
    from llm_fp8_tpu.utils.monitor import device_memory_stats

    # Any zoo decoder serves through the same engine (the reference's shared
    # generate() contract); llama-family names additionally support real
    # checkpoints and the paged/fused-arena fast paths.
    entry = resolve_model(args.model_name)
    cfg = entry.cfg
    dtype = jnp.bfloat16
    if args.random_init or args.weights_path is None:
        params = entry.init_fn(cfg, jax.random.PRNGKey(0), dtype=dtype)
    else:
        from llm_fp8_tpu.models import load_zoo_checkpoint

        params = load_zoo_checkpoint(args.model_name, args.weights_path,
                                     dtype=dtype)
    if args.precision == "fp8":
        params = entry.quantize_fn(params, recipe_set_by_name(args.fp8_scenario))
    elif args.precision in ("int8", "int4"):
        params = entry.quantize_fn(params, recipe_set_by_name(args.precision))

    from llm_fp8_tpu.utils.backend import resolve_kv_dtype

    kv_dtype = resolve_kv_dtype(args.kv_dtype)
    if args.paged and args.draft_model is not None:
        raise SystemExit(
            "--paged and --draft_model are mutually exclusive: speculative "
            "decoding runs on the slot-arena engine (SpecEngine), not the "
            "paged pool — see docs/PERF_NOTES.md (speculative serving path)"
        )
    if args.paged:
        from llm_fp8_tpu.serving.paged_engine import PagedEngine, PagedEngineConfig

        if entry.forward_fn is not llama_forward:
            raise SystemExit(
                "--paged uses the Llama-family paged decode path; serve "
                f"{args.model_name} through the default (arena) engine"
            )
        eng = PagedEngine(
            params, cfg,
            PagedEngineConfig(
                max_slots=args.max_slots, num_pages=args.num_pages,
                page_size=args.page_size,
                max_pages_per_seq=-(-args.max_seq_len // args.page_size),
                kv_dtype=kv_dtype, decode_burst=args.decode_burst,
            ),
        )
    elif args.draft_model is not None:
        from llm_fp8_tpu.serving import SpecEngine

        dentry = resolve_model(args.draft_model)
        if args.draft_weights is not None:
            from llm_fp8_tpu.models import load_zoo_checkpoint

            dparams = load_zoo_checkpoint(
                args.draft_model, args.draft_weights, dtype=dtype)
        else:
            dparams = dentry.init_fn(dentry.cfg, jax.random.PRNGKey(1),
                                     dtype=dtype)
        eng = SpecEngine(
            params, cfg, dparams, dentry.cfg,
            EngineConfig(
                max_slots=args.max_slots, max_seq_len=args.max_seq_len,
                kv_dtype=kv_dtype,
            ),
            gamma=args.gamma, temperature=args.temperature,
            top_k=args.spec_top_k, top_p=args.spec_top_p,
            forward_fn=entry.forward_fn, draft_forward_fn=dentry.forward_fn,
        )
    else:
        eng = Engine(
            params, cfg,
            EngineConfig(
                max_slots=args.max_slots, max_seq_len=args.max_seq_len,
                kv_dtype=kv_dtype, decode_burst=args.decode_burst,
            ),
            forward_fn=entry.forward_fn,
        )
    rng = np.random.RandomState(0)
    sp = SamplingParams(
        temperature=args.temperature, max_new_tokens=args.max_new_tokens
    )
    t0 = time.perf_counter()
    for _ in range(args.num_requests):
        eng.add_request(
            rng.randint(1, cfg.vocab_size, args.prompt_len).astype(np.int32), sp
        )
    done = eng.run()
    dt = time.perf_counter() - t0

    new_tokens = sum(len(r.output) for r in done)
    ttfts = sorted(r.ttft for r in done if r.ttft is not None)
    mem = device_memory_stats()
    spec_stats = {}
    if args.draft_model is not None and getattr(
            eng, "accepted_histogram", None):
        hist = eng.accepted_histogram
        spec_stats = {
            "spec_gamma": args.gamma,
            "spec_mean_accepted": round(float(np.mean(hist)), 3),
            "spec_tokens_per_round": round(float(np.mean(hist)) + 1, 3),
        }
    print(json.dumps({
        "requests": len(done),
        "generated_tokens": new_tokens,
        "wall_s": round(dt, 3),
        "tokens_per_s": round(new_tokens / dt, 2),
        "ttft_p50_s": round(ttfts[len(ttfts) // 2], 4) if ttfts else None,
        "ttft_p99_s": round(ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.99))], 4)
        if ttfts else None,
        "peak_memory_gb": round(mem["peak_gb"], 3),
        "precision": args.precision,
        "kv_dtype": jnp.dtype(kv_dtype).name,
        **spec_stats,
        # int8-KV calibration health (saturation EWMA vs threshold;
        # see EngineConfig.kv_sat_threshold / kv_recalibrate).
        **({"kv_drift": eng.kv_drift_stats()}
           if getattr(eng, "_int8_kv", False) else {}),
    }))


if __name__ == "__main__":
    main()
