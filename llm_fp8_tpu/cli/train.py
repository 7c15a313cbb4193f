"""Fine-tuning CLI — the ``train_fp8.py`` entry point rebuilt for TPU.

Flag surface mirrors the reference's argparse groups
(``train_fp8.py:684-788``) plus mesh flags replacing torchrun
(``train_multi_gpu.py:1195-1315`` / ``run_multigpu.sh`` presets):

  python -m llm_fp8_tpu.cli.train \\
      --model_name meta-llama/Llama-3.2-3B --dataset_name nvidia/OpenMathInstruct-2 \\
      --mixed_precision fp8 --fp8_scenario default \\
      --batch_size 16 --max_seq_length 512 --num_of_samples 100000 \\
      --dp 1 --fsdp 4 --tp 1

Air-gapped usage: ``--synthetic_samples N --random_init`` trains the debug
configs with the built-in corpus and random weights (the reference's
debug-100-sample presets, run_multigpu.sh:104-126).
"""
from __future__ import annotations

import argparse
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Fine-tune Llama/Qwen with FP8 on TPU",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    g = p.add_argument_group("Model and Data")
    g.add_argument("--model_name", type=str, required=True)
    g.add_argument("--dataset_name", type=str, default="nvidia/OpenMathInstruct-2")
    g.add_argument("--split_name", type=str, default="train_1M")
    g.add_argument("--num_of_samples", type=int, default=None)
    g.add_argument("--weights_path", type=str, default=None,
                   help="Local HF checkpoint dir (safetensors)")
    g.add_argument("--random_init", action="store_true",
                   help="Random weights (debug / air-gapped)")
    g.add_argument("--synthetic_samples", type=int, default=None,
                   help="Use the built-in synthetic corpus with N samples")

    t = p.add_argument_group("Training Hyperparameters")
    t.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["bf16", "fp8"])
    t.add_argument("--fp8_scenario", type=str, default="default",
                   choices=["default", "mxfp8", "hybrid", "int8_train"],
                   help="'int8_train': per-channel int8 GEMMs on the native "
                        "int8 MXU path (~2x bf16 FLOPs on v5e) — the "
                        "TPU-native analogue of the reference's fp8 tensor-"
                        "core speedup")
    t.add_argument("--batch_size", type=int, default=8)
    t.add_argument("--eval_batch_size", type=int, default=None)
    t.add_argument("--max_seq_length", type=int, default=512)
    t.add_argument("--gradient_accumulation_steps", type=int, default=1)
    t.add_argument("--num_epochs", type=int, default=3)
    t.add_argument("--learning_rate", type=float, default=1.41e-5)
    t.add_argument("--num_warmup_steps", type=int, default=100)
    t.add_argument("--schedule", type=str, default="linear",
                   choices=["linear", "cosine", "constant"])
    t.add_argument("--grad_clip", type=float, default=1.0)
    t.add_argument("--remat", type=str, default="none",
                   choices=["none", "full", "dots"],
                   help="Per-layer gradient checkpointing: 'full' saves "
                        "nothing (max memory headroom), 'dots' saves matmul "
                        "outputs (near-zero recompute tax; measured MFU win)")
    t.add_argument("--ce_chunks", type=int, default=0,
                   help=">1: fuse lm_head into a chunked cross-entropy so "
                        "the [B,S,vocab] fp32 logits never materialize "
                        "(Llama family; big memory win at 128k vocab)")
    t.add_argument("--unroll", type=int, default=1,
                   help="layer-scan unroll factor; full unroll lets XLA "
                        "software-pipeline the next layer's weight fetch "
                        "(1B/8x512: 54.4 -> 60.4% MFU with --remat none)")

    m = p.add_argument_group("Mesh (replaces torchrun/DDP/FSDP flags)")
    m.add_argument("--dp", type=int, default=1)
    m.add_argument("--fsdp", type=int, default=-1)
    m.add_argument("--tp", type=int, default=1)
    m.add_argument("--cp", type=int, default=1,
                   help="context-parallel degree (ring attention over the "
                        "sequence; long-context training)")
    m.add_argument("--ep", type=int, default=1,
                   help="expert-parallel degree (MoE family: experts "
                        "sharded over the mesh ep axis)")
    m.add_argument("--multihost", action="store_true",
                   help="Call jax.distributed.initialize() (multi-host slice;"
                        " replaces the reference's torchrun/NCCL bootstrap,"
                        " train_multi_gpu.py:969-1006)")

    l = p.add_argument_group("Logging and Saving")
    l.add_argument("--log_dir", type=str, default="./runs")
    l.add_argument("--output_dir", type=str, default="./saved_model")
    l.add_argument("--checkpoint_dir", type=str, default=None)
    l.add_argument("--save_every", type=int, default=0,
                   help="Checkpoint every N steps (0 = per epoch)")
    l.add_argument("--use_wandb", action="store_true")
    l.add_argument("--wandb_project", type=str, default="llm-fp8-tpu")
    l.add_argument("--wandb_run_name", type=str, default=None)
    l.add_argument("--log_every", type=int, default=10)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.multihost:
        jax.distributed.initialize()

    from llm_fp8_tpu.models import (
        MODEL_REGISTRY, load_hf_checkpoint, resolve_model,
    )
    from llm_fp8_tpu.models.llama import forward as llama_forward
    from llm_fp8_tpu.parallel import MeshConfig, make_mesh, shard_params, batch_spec
    from llm_fp8_tpu.training import (
        TrainConfig, Trainer, DataConfig, DataManager, StabilityTracker,
    )
    from llm_fp8_tpu.training.data import synthetic_examples, make_batches
    from llm_fp8_tpu.training.checkpoint import CheckpointManager, export_hf
    from llm_fp8_tpu.utils.metrics import MetricLogger
    from llm_fp8_tpu.utils.monitor import StepTimer, device_memory_stats
    from jax.sharding import NamedSharding

    # Any zoo decoder trains through the same harness (the reference's one
    # training dir for the zoo); FP8 recipes implement the Llama/Qwen stack.
    entry = resolve_model(args.model_name)
    cfg = entry.cfg
    is_llama_family = args.model_name in MODEL_REGISTRY
    recipes = args.fp8_scenario if args.mixed_precision == "fp8" else "bf16"
    if recipes != "bf16" and not is_llama_family:
        raise SystemExit(
            "--mixed_precision fp8 implements the Llama/Qwen stack; train "
            f"{args.model_name} with --mixed_precision bf16"
        )

    # --- data ---
    if args.synthetic_samples:
        class _Tok:
            pad_token_id = 0
            eos_token_id = 0

            def __call__(self, text, truncation=True, max_length=None):
                return {"input_ids": [ord(c) % (cfg.vocab_size - 3) + 3
                                      for c in text][:max_length]}

        tok = _Tok()
        examples = synthetic_examples(args.synthetic_samples)
    else:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.model_name)
        examples = None
    dm = DataManager(
        DataConfig(
            dataset_name=args.dataset_name, split_name=args.split_name,
            max_seq_length=args.max_seq_length,
            num_of_samples=args.num_of_samples, batch_size=args.batch_size,
            eval_batch_size=args.eval_batch_size,
        ),
        tok,
    )
    train_seqs, eval_seqs = dm.build(examples)
    steps_per_epoch = len(train_seqs) // args.batch_size
    total_steps = max(steps_per_epoch * args.num_epochs, 1)

    # --- model + mesh ---
    if args.random_init or args.weights_path is None:
        params = entry.init_fn(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    else:
        from llm_fp8_tpu.models import load_zoo_checkpoint

        params = load_zoo_checkpoint(args.model_name, args.weights_path,
                                     dtype=jnp.float32)
    mesh = make_mesh(
        MeshConfig(dp=args.dp, fsdp=args.fsdp, cp=args.cp, ep=args.ep,
                   tp=args.tp)
    )
    params = shard_params(params, mesh)

    trainer = Trainer(
        cfg,
        TrainConfig(
            learning_rate=args.learning_rate,
            warmup_steps=args.num_warmup_steps,
            total_steps=total_steps,
            schedule=args.schedule,
            grad_clip=args.grad_clip,
            grad_accum=args.gradient_accumulation_steps,
            recipes=recipes,
            remat={"none": False, "full": True, "dots": "dots"}[args.remat],
            unroll=args.unroll,
            ce_chunks=args.ce_chunks,
        ),
        cp_mesh=mesh if args.cp > 1 else None,
        forward_fn=None if is_llama_family else entry.forward_fn,
    )
    state = trainer.init_state(params)

    logger = MetricLogger(
        args.log_dir, use_wandb=args.use_wandb,
        wandb_project=args.wandb_project, wandb_run_name=args.wandb_run_name,
        config=vars(args),
    )
    stability = StabilityTracker(
        precision_name=f"fp8-{args.fp8_scenario}"
        if args.mixed_precision == "fp8" else "bf16"
    )
    ckpt = CheckpointManager(args.checkpoint_dir) if args.checkpoint_dir else None
    timer = StepTimer()
    bspec = NamedSharding(mesh, batch_spec())

    def put(batch):
        return {k: jax.device_put(jnp.asarray(v), bspec) for k, v in batch.items()}

    print(f"devices={len(jax.devices())} mesh={dict(mesh.shape)} "
          f"steps/epoch={steps_per_epoch} total={total_steps} recipes={recipes}")

    step = 0
    with jax.sharding.set_mesh(mesh):
        for epoch in range(args.num_epochs):
            for batch in dm.batches(train_seqs, args.batch_size,
                                    shuffle=True, seed=epoch):
                state, metrics = trainer.train_step(state, put(batch))
                step += 1
                loss = float(metrics["loss"])
                timer.step(int(metrics["tokens"]))
                inst = stability.track_step(
                    loss, grad_norm=float(metrics["grad_norm"]),
                    activation_mean=float(metrics["activation_mean"]),
                    activation_std=float(metrics["activation_std"]),
                )
                if step % args.log_every == 0:
                    mem = device_memory_stats()
                    logger.log(
                        {**inst, "perplexity": math.exp(min(loss, 20.0)),
                         **timer.rates(), "memory_gb": mem["in_use_gb"],
                         "epoch": epoch},
                        step, prefix="train",
                    )
                if args.save_every and ckpt and step % args.save_every == 0:
                    ckpt.save(state, step)
            ev = trainer.evaluate(
                state.params,
                (put(b) for b in dm.batches(eval_seqs, dm.config.eval_bs,
                                            shuffle=False,
                                            drop_last=False)),
            )
            logger.log(ev, step, prefix="eval")
            print(f"epoch {epoch}: eval {ev}")
            if ckpt:
                ckpt.save(state, step, eval_loss=ev["eval_loss"])

    report = stability.report()
    logger.log_summary(report)
    logger.close()
    os.makedirs(args.output_dir, exist_ok=True)
    if is_llama_family or hasattr(cfg, "num_experts"):
        export_hf(jax.device_get(state.params), cfg, args.output_dir)
    else:
        # Zoo families: save the raw param pytree (HF-layout export is
        # implemented for the Llama/Qwen family).
        import pickle

        with open(os.path.join(args.output_dir, "params.pkl"), "wb") as f:
            pickle.dump(jax.device_get(state.params), f)
    with open(os.path.join(args.output_dir, "stability_report.json"), "w") as f:
        json.dump(report, f, default=str, indent=2)
    print(f"saved model to {args.output_dir}")


if __name__ == "__main__":
    main()
