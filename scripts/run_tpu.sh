#!/bin/bash
# Launch presets for FP8 training/serving on TPU.
#
# TPU-native counterpart of the reference's run_multigpu.sh (its DDP/FSDP
# torchrun presets, run_multigpu.sh:132-216): no process launcher is needed —
# JAX is single-controller, the mesh flags replace NUM_GPUS/MASTER_PORT, and
# the same presets (llama-1b/3b/8b, qwen-14b, debug) map onto dp/fsdp/tp.
#
# Usage:
#   ./scripts/run_tpu.sh train-3b-fp8        # the paper's headline config
#   ./scripts/run_tpu.sh train-8b-fp8
#   ./scripts/run_tpu.sh train-debug         # 100-sample air-gapped debug run
#   ./scripts/run_tpu.sh serve-1b-fp8
#   ./scripts/run_tpu.sh bench

set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:-$PWD}"

MODE="${1:-help}"
shift || true

# Paper config: 100K OpenMathInstruct-2 samples, seq 512, 3 epochs,
# AdamW lr 1e-5 (paper/conference_101719.tex:205-226; README.md:29).
COMMON_TRAIN=(--dataset_name nvidia/OpenMathInstruct-2
              --num_of_samples 100000 --max_seq_length 512 --num_epochs 3
              --learning_rate 1e-5 --gradient_accumulation_steps 4)

case "$MODE" in
  train-3b-fp8)
    python -m llm_fp8_tpu.cli.train --model_name meta-llama/Llama-3.2-3B \
      --mixed_precision fp8 --fp8_scenario default --batch_size 16 \
      "${COMMON_TRAIN[@]}" "$@" ;;
  train-3b-bf16)
    python -m llm_fp8_tpu.cli.train --model_name meta-llama/Llama-3.2-3B \
      --mixed_precision bf16 --batch_size 16 "${COMMON_TRAIN[@]}" "$@" ;;
  train-3b-mxfp8)
    python -m llm_fp8_tpu.cli.train --model_name meta-llama/Llama-3.2-3B \
      --mixed_precision fp8 --fp8_scenario mxfp8 --batch_size 16 \
      "${COMMON_TRAIN[@]}" "$@" ;;
  train-3b-hybrid)
    python -m llm_fp8_tpu.cli.train --model_name meta-llama/Llama-3.2-3B \
      --mixed_precision fp8 --fp8_scenario hybrid --batch_size 16 \
      "${COMMON_TRAIN[@]}" "$@" ;;
  train-8b-fp8)
    python -m llm_fp8_tpu.cli.train --model_name meta-llama/Llama-3.1-8B \
      --mixed_precision fp8 --fp8_scenario default --batch_size 12 \
      --fsdp -1 "${COMMON_TRAIN[@]}" "$@" ;;
  train-qwen-14b-fp8)
    python -m llm_fp8_tpu.cli.train --model_name Qwen/Qwen2.5-14B \
      --mixed_precision fp8 --fp8_scenario default --batch_size 8 \
      --fsdp -1 --tp 1 "${COMMON_TRAIN[@]}" "$@" ;;
  train-debug)
    # 100-sample debug preset (reference run_multigpu.sh:104-126), synthetic
    # corpus + random weights so it runs air-gapped.
    python -m llm_fp8_tpu.cli.train --model_name debug-small --random_init \
      --synthetic_samples 100 --mixed_precision fp8 --fp8_scenario default \
      --batch_size 4 --max_seq_length 128 --num_epochs 1 \
      --num_warmup_steps 5 "$@" ;;
  train-mixtral-debug)
    # MoE family (beyond-ref): routed experts + load-balance aux loss;
    # scale expert parallelism with --ep N on a multi-chip mesh.
    python -m llm_fp8_tpu.cli.train --model_name debug-mixtral --random_init \
      --synthetic_samples 100 --mixed_precision bf16 \
      --batch_size 4 --max_seq_length 128 --num_epochs 1 \
      --num_warmup_steps 5 "$@" ;;
  serve-1b-fp8)
    python -m llm_fp8_tpu.cli.serve --model_name llama-3.2-1b \
      --precision fp8 --kv_dtype fp8 "$@" ;;
  serve-mixtral-debug)
    python -m llm_fp8_tpu.cli.serve --model_name debug-mixtral --random_init \
      --precision int8 --num_requests 4 --prompt_len 16 --max_new_tokens 8 \
      --max_slots 2 --max_seq_len 128 "$@" ;;
  serve-debug)
    python -m llm_fp8_tpu.cli.serve --model_name debug-tiny --random_init \
      --precision fp8 --num_requests 4 --prompt_len 16 --max_new_tokens 8 \
      --max_slots 2 --max_seq_len 128 "$@" ;;
  bench)
    python bench.py "$@" ;;
  *)
    grep -E '^  [a-z0-9-]+\)' "$0" | tr -d ')' ; exit 1 ;;
esac
