"""llm_fp8_tpu: a TPU-native FP8 LLM training + serving framework.

Built from scratch in JAX/XLA/Pallas with the capability set of the reference
``xuanvinh1997/llm-fp8`` repo (see SURVEY.md): three FP8 recipes (layer-wise
delayed-scaling E4M3/HYBRID, uniform HYBRID, MXFP8 block scaling), the
Llama-3.x / Qwen2.5 model families, flash attention with FP8 paged KV-cache,
GSPMD distribution (DP/FSDP/TP/SP), a continuous-batching serving engine, and
an FP8 fine-tuning harness with stability analytics.
"""

__version__ = "0.1.0"
