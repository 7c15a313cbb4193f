"""Model families: Llama-3.x / Qwen2.5 decoder, configs, HF checkpoint IO."""
from .config import ModelConfig, MODEL_REGISTRY, get_config, SUPPORTED_MODELS
from .llama import init_params, forward, quantize_params, KVCache, init_kv_cache
from .hf_loader import load_hf_checkpoint, pack_hf_state_dict, export_hf_state_dict

__all__ = [
    "ModelConfig", "MODEL_REGISTRY", "get_config", "SUPPORTED_MODELS",
    "init_params", "forward", "quantize_params", "KVCache", "init_kv_cache",
    "load_hf_checkpoint", "pack_hf_state_dict", "export_hf_state_dict",
]
