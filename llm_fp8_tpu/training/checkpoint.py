"""Checkpointing: train-state persistence, best-k retention, HF export.

Parity with the reference's three mechanisms (SURVEY.md §5):
  1. ``save_pretrained`` of the final model (+ tokenizer) — here
     :func:`export_hf` writes HF-layout safetensors via the inverse remap,
     so reference-side tooling can consume the result
     (``train_fp8.py:657-681``).
  2. FSDP FULL_STATE_DICT train-state checkpoints with best-loss retention
     and old-checkpoint cleanup (``train_multi_gpu.py:882-962``) — here
     Orbax handles the sharded pytree natively (no rank0 gather needed;
     every host writes its shard).
  3. FP8 scale baking: quantized params (QTensor leaves) round-trip with
     their scales — the "bake scales into checkpoints" design from
     BASELINE.json.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["CheckpointManager", "export_hf"]


class CheckpointManager:
    """Step-tagged Orbax checkpoints with best-loss tracking + cleanup."""

    def __init__(self, directory: str, *, keep: int = 2):
        self.dir = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.dir, exist_ok=True)
        self._best_loss = float("inf")
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag) -> str:
        return os.path.join(self.dir, f"ckpt_{tag}")

    def save(self, state, step: int, *, eval_loss: Optional[float] = None):
        path = self._path(step)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        meta = {"step": step, "eval_loss": eval_loss}
        with open(os.path.join(self.dir, f"meta_{step}.json"), "w") as f:
            json.dump(meta, f)
        if eval_loss is not None and eval_loss < self._best_loss:
            self._best_loss = eval_loss
            best = self._path("best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)
        self._cleanup()
        return path

    def restore(self, state_template, tag="latest"):
        if tag == "latest":
            steps = self._steps()
            if not steps:
                raise FileNotFoundError(f"no checkpoints under {self.dir}")
            tag = steps[-1]
        return self._ckptr.restore(self._path(tag), state_template)

    def _steps(self):
        out = []
        for name in os.listdir(self.dir):
            if name.startswith("ckpt_") and name[5:].isdigit():
                out.append(int(name[5:]))
        return sorted(out)

    def _cleanup(self):
        steps = self._steps()
        for old in steps[: -self.keep]:
            shutil.rmtree(self._path(old), ignore_errors=True)
            try:
                os.remove(os.path.join(self.dir, f"meta_{old}.json"))
            except OSError:
                pass


def export_hf(params: Dict[str, Any], cfg, out_dir: str, *, dequantize=True):
    """Write HF-layout safetensors (the ``ModelSaver`` equivalent).

    QTensor leaves are dequantized to f32 (HF layout has no scale sidecar);
    pass ``dequantize=False`` to refuse quantized leaves instead.
    """
    from llm_fp8_tpu.quant import QTensor
    from llm_fp8_tpu.models.hf_loader import export_hf_state_dict
    from safetensors.numpy import save_file

    def deq(tree):
        if isinstance(tree, dict):
            return {k: deq(v) for k, v in tree.items()}
        if isinstance(tree, QTensor):
            if not dequantize:
                raise ValueError("quantized leaf in export with dequantize=False")
            return tree.dequantize()
        return tree

    os.makedirs(out_dir, exist_ok=True)
    is_moe = hasattr(cfg, "num_experts")
    if is_moe and cfg.qk_norm:
        from llm_fp8_tpu.models.moe import export_qwen3_moe_state_dict

        sd = export_qwen3_moe_state_dict(deq(params), cfg)
    elif is_moe:
        from llm_fp8_tpu.models.moe import export_mixtral_state_dict

        sd = export_mixtral_state_dict(deq(params), cfg)
    else:
        sd = export_hf_state_dict(deq(params), cfg)
    save_file(
        {k: np.ascontiguousarray(v) for k, v in sd.items()},
        os.path.join(out_dir, "model.safetensors"),
    )
    # Derive model_type from the architectural features so transformers
    # reloads with the right class: qk_norm -> Qwen3, qkv_bias -> Qwen2
    # (a Llama reload would silently drop q/k/v biases and QK-norm weights).
    if is_moe and cfg.qk_norm:
        model_type, arch = "qwen3_moe", "Qwen3MoeForCausalLM"
    elif is_moe:
        model_type, arch = "mixtral", "MixtralForCausalLM"
    elif cfg.qk_norm:
        model_type, arch = "qwen3", "Qwen3ForCausalLM"
    elif cfg.qkv_bias:
        model_type, arch = "qwen2", "Qwen2ForCausalLM"
    else:
        model_type, arch = "llama", "LlamaForCausalLM"
    hf_cfg = {
        "architectures": [arch],
        "model_type": model_type,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "max_position_embeddings": cfg.max_position_embeddings,
    }
    if is_moe and cfg.qk_norm:
        # Qwen3MoeConfig field names; expert width is our intermediate_size.
        hf_cfg["num_experts"] = cfg.num_experts
        hf_cfg["num_experts_per_tok"] = cfg.num_experts_per_tok
        hf_cfg["moe_intermediate_size"] = cfg.intermediate_size
        hf_cfg["norm_topk_prob"] = cfg.norm_topk_prob
        hf_cfg["decoder_sparse_step"] = 1
        hf_cfg["mlp_only_layers"] = []
        hf_cfg["attention_bias"] = False
    elif is_moe:
        hf_cfg["num_local_experts"] = cfg.num_experts
        hf_cfg["num_experts_per_tok"] = cfg.num_experts_per_tok
        hf_cfg["sliding_window"] = None
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
    return out_dir
