"""Unified zoo resolver: one name -> (config, init, forward, quantize).

The reference dispatches every architecture through one ``GPTLMHeadModel``
plus per-family config translators (``flash_attn/models/gpt.py`` +
``gpt_neox.py``/``opt.py``/...); here each family is its own module and this
registry is the single entry point the CLIs and the serving Engine use to
drive any of them.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax.numpy as jnp

from llm_fp8_tpu.quant import RecipeSet, quantize

__all__ = ["ZooEntry", "resolve_model", "zoo_model_names",
           "quantize_zoo_params", "load_zoo_checkpoint"]


class ZooEntry(NamedTuple):
    cfg: Any
    init_fn: Callable
    forward_fn: Callable
    quantize_fn: Callable  # (params, RecipeSet) -> params


#: Both the GPT-2 and NeoX family modules use the same stacked layer leaf
#: names for their four GEMM sites; map them to recipe-set roles (the same
#: role split the Llama family's quantize_params uses).
_ZOO_SITES = {
    "w_qkv": "attn_qkv",
    "w_out": "attn_out",
    "w_fc": "mlp",
    "w_proj": "mlp",
}


def quantize_zoo_params(params: Dict[str, Any], recipes: RecipeSet,
                        sites: Dict[str, str] = _ZOO_SITES) -> Dict[str, Any]:
    """Prequantize a GPT-2/NeoX-family param tree's GEMM weights.

    Same scale-baking pass as ``models.llama.quantize_params`` (per-output-
    channel scales on the stacked ``[L, K, N]`` weights; norms, embeddings
    and biases stay high precision).
    """
    from llm_fp8_tpu.quant import quantize_mx

    out = dict(params)
    layers = dict(params["layers"])
    for name, role in sites.items():
        recipe = recipes.for_role(role)
        if recipe is None or name not in layers:
            continue
        wv = layers[name]
        if recipe.granularity == "block32":
            layers[name] = quantize_mx(
                wv.astype(jnp.float32), recipe.fmt_fwd, block_axis=1,
                flush_subnormal=True,
            )
        else:
            layers[name] = quantize(
                wv.astype(jnp.float32), recipe.fmt_fwd, axes=(1,),
                margin=recipe.margin, group_size=recipe.group_size,
                flush_subnormal=True,
            )
    out["layers"] = layers
    return out


def resolve_model(name: str) -> ZooEntry:
    """Look ``name`` up across every family registry."""
    from llm_fp8_tpu.models.config import MODEL_REGISTRY, get_config

    if name in MODEL_REGISTRY:
        from llm_fp8_tpu.models.llama import (
            init_params, forward, quantize_params,
        )

        return ZooEntry(get_config(name), init_params, forward,
                        quantize_params)

    from llm_fp8_tpu.models.gpt2 import (
        GPT2_REGISTRY, init_gpt2_params, gpt2_forward,
    )

    if name in GPT2_REGISTRY:
        return ZooEntry(GPT2_REGISTRY[name], init_gpt2_params, gpt2_forward,
                        quantize_zoo_params)

    from llm_fp8_tpu.models.neox import (
        NEOX_REGISTRY, init_neox_params, neox_forward,
    )

    if name in NEOX_REGISTRY:
        return ZooEntry(NEOX_REGISTRY[name], init_neox_params, neox_forward,
                        quantize_zoo_params)

    from llm_fp8_tpu.models.moe import (
        MOE_REGISTRY, init_moe_params, moe_forward, quantize_moe_params,
    )

    if name in MOE_REGISTRY:
        return ZooEntry(MOE_REGISTRY[name], init_moe_params, moe_forward,
                        quantize_moe_params)

    from llm_fp8_tpu.models.mla import (
        MLA_REGISTRY, init_mla_params, mla_forward, quantize_mla_params,
    )

    if name in MLA_REGISTRY:
        return ZooEntry(MLA_REGISTRY[name], init_mla_params, mla_forward,
                        quantize_mla_params)

    from llm_fp8_tpu.models.gemma import (
        GEMMA_REGISTRY, init_gemma_params, gemma_forward,
    )

    if name in GEMMA_REGISTRY:
        # Same GEMM-site leaf names as the Llama family → its scale-baking
        # pass applies unchanged.
        from llm_fp8_tpu.models.llama import quantize_params

        return ZooEntry(GEMMA_REGISTRY[name], init_gemma_params,
                        gemma_forward, quantize_params)

    raise ValueError(
        f"unknown model {name!r}; known: {sorted(zoo_model_names())}"
    )


def zoo_model_names() -> list:
    from llm_fp8_tpu.models.config import MODEL_REGISTRY
    from llm_fp8_tpu.models.gemma import GEMMA_REGISTRY
    from llm_fp8_tpu.models.gpt2 import GPT2_REGISTRY
    from llm_fp8_tpu.models.mla import MLA_REGISTRY
    from llm_fp8_tpu.models.neox import NEOX_REGISTRY
    from llm_fp8_tpu.models.moe import MOE_REGISTRY

    return [*MODEL_REGISTRY, *GPT2_REGISTRY, *NEOX_REGISTRY, *MOE_REGISTRY,
            *GEMMA_REGISTRY, *MLA_REGISTRY]


def load_zoo_checkpoint(name: str, path: str, dtype=jnp.bfloat16):
    """Unified HF-checkpoint ingestion for any zoo decoder by name.

    The reference reaches every architecture through one
    ``from_pretrained``-style remap entry point
    (``flash_attn/models/gpt.py`` + per-family ``remap_state_dict_hf_*``);
    this is that entry point: read the safetensors directory, pick the
    family's pack function, return stacked params.
    """
    from llm_fp8_tpu.models.hf_loader import _load_all

    entry = resolve_model(name)
    sd = _load_all(path)
    return _pack_fn_for(name)(sd, entry.cfg, dtype)


def _pack_fn_for(name: str):
    from llm_fp8_tpu.models.config import MODEL_REGISTRY

    if name in MODEL_REGISTRY:
        from llm_fp8_tpu.models.hf_loader import pack_hf_state_dict

        return pack_hf_state_dict

    from llm_fp8_tpu.models.moe import (
        MOE_REGISTRY, pack_mixtral_state_dict, pack_qwen3_moe_state_dict,
    )

    if name in MOE_REGISTRY:
        # Qwen3-MoE entries carry qk_norm; Mixtral-class ones don't.
        return (pack_qwen3_moe_state_dict if MOE_REGISTRY[name].qk_norm
                else pack_mixtral_state_dict)

    from llm_fp8_tpu.models.mla import MLA_REGISTRY, pack_deepseek_state_dict

    if name in MLA_REGISTRY:
        return pack_deepseek_state_dict

    from llm_fp8_tpu.models.gemma import (
        GEMMA_REGISTRY, pack_gemma2_state_dict,
    )

    if name in GEMMA_REGISTRY:
        return pack_gemma2_state_dict

    # GPT-2/NeoX families: flavor is encoded in the registry name.
    from llm_fp8_tpu.models import gpt2, neox

    by_prefix = [
        ("gpt2", gpt2.pack_gpt2_state_dict),
        ("opt-", gpt2.pack_opt_state_dict),
        ("santacoder", gpt2.pack_bigcode_state_dict),
        ("btlm", gpt2.pack_btlm_state_dict),
        ("pythia", neox.pack_neox_state_dict),
        ("debug-neox", neox.pack_neox_state_dict),
        ("falcon", neox.pack_falcon_state_dict),
        ("debug-falcon", neox.pack_falcon_state_dict),
        ("gptj", neox.pack_gptj_state_dict),
        ("debug-gptj", neox.pack_gptj_state_dict),
        ("debug-gpt2", gpt2.pack_gpt2_state_dict),
        ("debug-opt", gpt2.pack_opt_state_dict),
        ("debug-santacoder", gpt2.pack_bigcode_state_dict),
        ("debug-btlm", gpt2.pack_btlm_state_dict),
    ]
    for prefix, fn in by_prefix:
        if name.startswith(prefix):
            return fn
    raise ValueError(f"no checkpoint packer known for {name!r}")
