"""HuggingFace safetensors ingestion → stacked fused-layout params.

The TPU-native equivalent of the reference's ``from_pretrained_local`` +
``replace_params`` remap (``te_llama.py:101-178, 181-239``): read (possibly
sharded) safetensors, remap HF names to the framework layout, fuse QKV into
one projection and gate|up into one MLP input projection, and stack all layers
along a leading axis for the scan-compiled forward.

Remap table (HF name → ours), per layer ``i``:
  model.layers.i.self_attn.{q,k,v}_proj.weight  → layers.wqkv[i]  (transposed,
      concatenated along the output axis — TE's ``layernorm_qkv`` fusion)
  model.layers.i.self_attn.{q,k,v}_proj.bias    → layers.bqkv[i]  (Qwen2.5)
  model.layers.i.self_attn.o_proj.weight        → layers.wo[i]
  model.layers.i.mlp.{gate,up}_proj.weight      → layers.w_gate_up[i]
      (the reference's gate|up concat into ``fc1_weight``, te_llama.py:223-238)
  model.layers.i.mlp.down_proj.weight           → layers.w_down[i]
  model.layers.i.input_layernorm.weight         → layers.norm_attn[i]
  model.layers.i.post_attention_layernorm.weight→ layers.norm_mlp[i]
  model.embed_tokens.weight                     → embed
  model.norm.weight                             → final_norm
  lm_head.weight                                → lm_head (absent when tied)

HF linear weights are stored ``[out, in]``; ours are ``[in, out]`` so the
forward is a plain ``x @ w`` with no transposes in the hot path.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig

__all__ = ["load_hf_checkpoint", "export_hf_state_dict"]


def _iter_shards(path: str) -> Iterable[str]:
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
        for fn in files:
            yield os.path.join(path, fn)
    else:
        single = os.path.join(path, "model.safetensors")
        if not os.path.exists(single):
            raise FileNotFoundError(f"no safetensors found under {path}")
        yield single


def _load_all(path: str) -> Dict[str, jax.Array]:
    from safetensors import safe_open

    out = {}
    for shard in _iter_shards(path):
        with safe_open(shard, framework="flax") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
    return out


def load_hf_checkpoint(
    path: str, cfg: ModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Load an HF Llama/Qwen checkpoint directory into stacked params."""
    sd = _load_all(path)
    return pack_hf_state_dict(sd, cfg, dtype)


def pack_hf_state_dict(
    sd: Dict[str, jax.Array], cfg: ModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Remap + fuse + stack an HF state dict (already in memory)."""

    def get(name):
        if name not in sd:
            raise KeyError(
                f"missing {name!r} in checkpoint; have e.g. {sorted(sd)[:5]}"
            )
        return sd[name]

    def linear(name):
        # HF [out, in] -> ours [in, out]
        return jnp.asarray(get(name)).astype(dtype).T

    L = cfg.num_layers
    wqkv, bqkv, wo, w_gate_up, w_down, n_attn, n_mlp = [], [], [], [], [], [], []
    qn, kn = [], []
    for i in range(L):
        p = f"model.layers.{i}."
        if cfg.fused_wpack:
            # Baichuan: one fused q|k|v projection [3D, D] — transposed it
            # is already our fused column layout (baichuan.py:97-108).
            wqkv.append(linear(p + "self_attn.W_pack.weight"))
        else:
            q = linear(p + "self_attn.q_proj.weight")
            k = linear(p + "self_attn.k_proj.weight")
            v = linear(p + "self_attn.v_proj.weight")
            wqkv.append(jnp.concatenate([q, k, v], axis=1))
        if cfg.qkv_bias:
            bqkv.append(
                jnp.concatenate(
                    [
                        jnp.asarray(get(p + f"self_attn.{t}_proj.bias")).astype(dtype)
                        for t in ("q", "k", "v")
                    ]
                )
            )
        if cfg.qk_norm:
            qn.append(jnp.asarray(get(p + "self_attn.q_norm.weight")).astype(dtype))
            kn.append(jnp.asarray(get(p + "self_attn.k_norm.weight")).astype(dtype))
        wo.append(linear(p + "self_attn.o_proj.weight"))
        gate = linear(p + "mlp.gate_proj.weight")
        up = linear(p + "mlp.up_proj.weight")
        w_gate_up.append(jnp.concatenate([gate, up], axis=1))
        w_down.append(linear(p + "mlp.down_proj.weight"))
        n_attn.append(jnp.asarray(get(p + "input_layernorm.weight")).astype(dtype))
        n_mlp.append(
            jnp.asarray(get(p + "post_attention_layernorm.weight")).astype(dtype)
        )

    layers = {
        "wqkv": jnp.stack(wqkv),
        "wo": jnp.stack(wo),
        "w_gate_up": jnp.stack(w_gate_up),
        "w_down": jnp.stack(w_down),
        "norm_attn": jnp.stack(n_attn),
        "norm_mlp": jnp.stack(n_mlp),
    }
    if cfg.qkv_bias:
        layers["bqkv"] = jnp.stack(bqkv)
    if cfg.qk_norm:
        layers["q_norm"] = jnp.stack(qn)
        layers["k_norm"] = jnp.stack(kn)

    params: Dict[str, Any] = {
        "embed": jnp.asarray(get("model.embed_tokens.weight")).astype(dtype),
        "layers": layers,
        "final_norm": jnp.asarray(get("model.norm.weight")).astype(dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = linear("lm_head.weight")
    return params


def export_hf_state_dict(
    params: Dict[str, Any], cfg: ModelConfig
) -> Dict[str, np.ndarray]:
    """Inverse remap: stacked fused params → HF names (for save_pretrained
    parity with the reference's ``ModelSaver``, ``train_fp8.py:657-681``).

    Quantized leaves must be dequantized by the caller first.
    """
    lp = params["layers"]
    out: Dict[str, np.ndarray] = {}

    def put(name, arr):
        out[name] = np.asarray(jax.device_get(arr.astype(jnp.float32)))

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"].T)
    qd, kvd = cfg.q_dim, cfg.kv_dim
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        wqkv = lp["wqkv"][i]
        if cfg.fused_wpack:
            put(p + "self_attn.W_pack.weight", wqkv.T)
        else:
            put(p + "self_attn.q_proj.weight", wqkv[:, :qd].T)
            put(p + "self_attn.k_proj.weight", wqkv[:, qd : qd + kvd].T)
            put(p + "self_attn.v_proj.weight", wqkv[:, qd + kvd :].T)
        if "bqkv" in lp:
            b = lp["bqkv"][i]
            put(p + "self_attn.q_proj.bias", b[:qd])
            put(p + "self_attn.k_proj.bias", b[qd : qd + kvd])
            put(p + "self_attn.v_proj.bias", b[qd + kvd :])
        if "q_norm" in lp:
            put(p + "self_attn.q_norm.weight", lp["q_norm"][i])
            put(p + "self_attn.k_norm.weight", lp["k_norm"][i])
        put(p + "self_attn.o_proj.weight", lp["wo"][i].T)
        gu = lp["w_gate_up"][i]
        I = cfg.intermediate_size
        put(p + "mlp.gate_proj.weight", gu[:, :I].T)
        put(p + "mlp.up_proj.weight", gu[:, I:].T)
        put(p + "mlp.down_proj.weight", lp["w_down"][i].T)
        put(p + "input_layernorm.weight", lp["norm_attn"][i])
        put(p + "post_attention_layernorm.weight", lp["norm_mlp"][i])
    return out
