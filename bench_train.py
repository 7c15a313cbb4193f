"""Training benchmark: FP8 vs BF16 train-step time, tokens/s, and MFU.

The reference's training headlines are 1.3-1.7x FP8 wall-clock speedup over
BF16 (``paper/conference_101719.tex:247``) and a 60.6%-MFU GPT harness
(``flash-attention-2.8.0/training/README.md:6-8``). This measures the same
two quantities on the TPU:

  * bf16 train step vs LAYERWISE-FP8 train step (the paper's "our method"
    recipe) on the same model/batch — full step: fwd + bwd + AdamW + delayed
    scale update.
  * MFU = model FLOPs per step / wall clock / chip peak. Model FLOPs use the
    standard 6*N*T estimate (+ exact attention term); remat recompute is NOT
    counted (MFU convention: useful model FLOPs only).

Hardware context recorded in the artifact: v5e has no native fp8 MXU, so the
FP8 path pays quantize/dequant VPU work against the same bf16 MXU dot — the
honest expectation here is fp8 <= 1.0x on v5e, flipping >1x only on
fp8-native parts (v6e+). The reference's 1.7x rides H100/Blackwell fp8
tensor cores; this artifact documents where that term does and doesn't
exist on TPU (docs/PERF_NOTES.md).

Timing discipline: the N-step loop is ONE on-device lax.scan dispatch (the
axon tunnel adds ~2 ms/dispatch); warm trials, median; 1-element host fetch
as the sync barrier.

Memory fit (16 GB v5e): Llama-3.2-1B with AdamW is 14.9 GB in the reference
layout (fp32 moments). ``adam_mu_dtype=bfloat16`` (documented deviation)
brings the state to ~12.4 GB; remat keeps activations flat; batch 2 x seq
512 matches the reference's per-GPU token budget order.

Usage: python bench_train.py [--model llama-3.2-1b] [--out docs/BENCH_TRAIN.json]
Prints one JSON line; also writes the artifact file.
"""
import argparse
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from llm_fp8_tpu.models import get_config, init_params
from llm_fp8_tpu.training import TrainConfig, Trainer

BATCH = 8  # fits with bf16 params + bf16 mu + remat (measured 38% MFU)
SEQ = 512
STEPS = 8  # per timed scan dispatch
TRIALS = 3

# Peak dense bf16 matmul throughput per chip. v5e: 197 TFLOP/s
# (public spec: 394 TOPS int8 / 197 TFLOP/s bf16).
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v6 lite": 918e12}


def model_flops_per_step(cfg, batch, seq):
    """Useful model FLOPs for one fwd+bwd step (6*N*T + exact attention)."""
    n_params = (
        cfg.vocab_size * cfg.hidden_size  # embed
        + cfg.num_layers * (
            cfg.hidden_size * cfg.qkv_dim
            + cfg.q_dim * cfg.hidden_size
            + cfg.hidden_size * 2 * cfg.intermediate_size
            + cfg.intermediate_size * cfg.hidden_size
        )
        + (0 if cfg.tie_word_embeddings else cfg.hidden_size * cfg.vocab_size)
    )
    t = batch * seq
    # 6*N*T covers every matmul fwd(2NT)+bwd(4NT); attention QK^T+PV adds
    # 12 * L * Hq * Dh * T * seq (fwd 4, bwd 8) with the causal 1/2 factor.
    attn = 6 * cfg.num_layers * cfg.num_heads * cfg.head_dim * t * seq
    return 6 * n_params * t + attn


def _sync(x):
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.reshape(-1)[:1])


def bench_one(cfg, recipes, batch, remat=True, seq=SEQ, ce_chunks=0,
              grad_accum=1, unroll=1):
    """Median seconds per train step for the given recipe set.

    ``grad_accum > 1`` measures the amortized-optimizer regime: the AdamW
    update (a fixed ~34 ms at 1B — one read+write pass over params, mu, nu;
    scripts/profile_train.py) applies once per ``grad_accum`` microbatches,
    so its cost per token shrinks accordingly. The timed scan still runs one
    microbatch per iteration; MFU uses the same per-microbatch model FLOPs.
    """
    # The per-step time is (median scan time) / STEPS, so the scan must
    # cover whole accumulation cycles — otherwise the fraction of AdamW
    # applies timed depends on the MultiSteps phase carried in from warmup.
    assert STEPS % grad_accum == 0, (
        f"grad_accum={grad_accum} must divide STEPS={STEPS}")
    trainer = Trainer(
        cfg,
        TrainConfig(
            recipes=recipes, warmup_steps=1, total_steps=1000, remat=remat,
            adam_mu_dtype="bfloat16", ce_chunks=ce_chunks,
            grad_accum=grad_accum, unroll=unroll,
        ),
    )
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    state = trainer.init_state(params)
    del params
    batch_data = {
        "input_ids": jnp.ones((batch, seq), jnp.int32),
        "attention_mask": jnp.ones((batch, seq), jnp.int32),
    }

    # Donate the carried state: without it the old and new TrainState (incl.
    # the full AdamW moments) are both live across the dispatch — 2x the
    # optimizer footprint, instant OOM at 1B on a 16 GB chip.
    @partial(jax.jit, donate_argnums=(0,))
    def loop(state, batch):
        def body(state, _):
            state, m = trainer._train_step_impl(state, batch)
            return state, m["loss"]

        return jax.lax.scan(body, state, None, length=STEPS)

    state, losses = loop(state, batch_data)  # compile + warmup
    _sync(losses)
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        state, losses = loop(state, batch_data)
        _sync(losses)
        times.append(time.perf_counter() - t0)
    del state
    return sorted(times)[TRIALS // 2] / STEPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-3.2-1b")
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--seq", type=int, default=SEQ)
    ap.add_argument("--remat", default="full", choices=["full", "dots", "none"],
                    help="'dots' saves matmul outputs (near-zero recompute "
                         "tax); 'full' saves nothing (max memory headroom)")
    ap.add_argument("--ce_chunks", type=int, default=0,
                    help=">1: chunked lm_head+cross-entropy fusion — the "
                         "[B,S,128k] fp32 logits never materialize")
    ap.add_argument("--unroll", type=int, default=1,
                    help="layer-scan unroll factor; 16 (full) lets XLA "
                         "software-pipeline the next layer's weight fetch "
                         "(measured 54.4 -> 56.9% MFU at 1B/8x512)")
    ap.add_argument("--recipes", default="default,int8_train",
                    help="comma list of quantized recipes to compare against "
                         "bf16 in the same run: 'default' (LAYERWISE fp8), "
                         "'int8_train' (native int8-MXU GEMMs — the v5e "
                         "fast path)")
    ap.add_argument("--out", default="docs/BENCH_TRAIN.json")
    args = ap.parse_args()

    cfg = get_config(args.model)
    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, 197e12)
    flops = model_flops_per_step(cfg, args.batch, args.seq)

    remat = {"full": True, "dots": "dots", "none": False}[args.remat]
    dt_bf16 = bench_one(cfg, "bf16", args.batch, remat=remat, seq=args.seq,
                        ce_chunks=args.ce_chunks, unroll=args.unroll)

    tokens = args.batch * args.seq
    result = {
        "metric": "fp8_train_step_vs_bf16_" + args.model.replace("-", "_"),
        "value": None,  # filled from the 'default' (LAYERWISE fp8) leg
        "unit": "x",
        "bf16_step_s": round(dt_bf16, 4),
        "bf16_tokens_per_s": round(tokens / dt_bf16, 1),
        "bf16_mfu": round(flops / dt_bf16 / peak, 4),
        "model_flops_per_step": flops,
        "peak_flops_assumed": peak,
        "device_kind": kind,
        "batch": args.batch,
        "seq": args.seq,
        "remat": args.remat,
        "ce_chunks": args.ce_chunks,
        "unroll": args.unroll,
        "note": (
            "v5e has no native fp8 MXU: the fp8 path quantizes/dequantizes "
            "on the VPU against the same bf16 MXU dot, so <=1.0x there is "
            "expected (the reference's 1.3-1.7x uses H100-class fp8 tensor "
            "cores); int8_train rides the MXU's native int8 path (~1.4x "
            "bf16 dots measured) and is the >1x recipe on this chip in the "
            "memory-constrained (full-remat) regime. MFU counts model FLOPs "
            "only (remat recompute excluded); adam_mu_dtype=bf16 to fit 1B "
            "AdamW in 16 GB."
        ),
    }
    for name in [r for r in args.recipes.split(",") if r]:
        try:
            dt = bench_one(cfg, name, args.batch, remat=remat,
                           seq=args.seq, ce_chunks=args.ce_chunks,
                           unroll=args.unroll)
        except Exception as e:  # noqa: BLE001 — a recipe leg OOMing (e.g.
            # fp8 residuals at remat=none) must not lose the bf16 number
            result[f"{name}_error"] = str(e)[:200]
            # Diagnostics to stderr: stdout carries exactly ONE JSON line
            # per run (a partial-superset echo here made parsers that read
            # the first line pick up the wrong object).
            print(json.dumps(result), file=sys.stderr, flush=True)
            continue
        tag = {"default": "fp8", "layerwise": "fp8"}.get(name, name)
        result[f"{tag}_step_s"] = round(dt, 4)
        result[f"{tag}_tokens_per_s"] = round(tokens / dt, 1)
        result[f"{tag}_mfu"] = round(flops / dt / peak, 4)
        result[f"{tag}_x"] = round(dt_bf16 / dt, 3)
        if tag == "fp8":
            result["value"] = result["fp8_x"]
        # Evidence survives partial runs (a kill mid-sweep): per-leg
        # supersets go to stderr; the single stdout JSON prints at the end.
        print(json.dumps(result), file=sys.stderr, flush=True)
    if result["value"] is None:  # int8-only invocation
        result["value"] = next(v for k, v in result.items()
                               if k.endswith("_x"))
    line = json.dumps(result)
    print(line, flush=True)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
