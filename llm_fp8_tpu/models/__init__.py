"""Model families: 13-arch zoo (Llama/Qwen, GPT-2-class, NeoX-class, BERT,
ViT), configs, HF checkpoint IO, and the unified zoo registry."""
from .config import ModelConfig, MODEL_REGISTRY, get_config, SUPPORTED_MODELS
from .llama import init_params, forward, quantize_params, KVCache, init_kv_cache
from .hf_loader import load_hf_checkpoint, pack_hf_state_dict, export_hf_state_dict
from .registry import ZooEntry, resolve_model, zoo_model_names, quantize_zoo_params, load_zoo_checkpoint

__all__ = [
    "ModelConfig", "MODEL_REGISTRY", "get_config", "SUPPORTED_MODELS",
    "init_params", "forward", "quantize_params", "KVCache", "init_kv_cache",
    "load_hf_checkpoint", "pack_hf_state_dict", "export_hf_state_dict",
    "ZooEntry", "resolve_model", "zoo_model_names", "quantize_zoo_params",
    "load_zoo_checkpoint",
]
