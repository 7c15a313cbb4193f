"""Parallel-residual decoder family: GPT-NeoX / Pythia and Falcon.

The reference folds both architectures onto its GPT block via config flags
(``flash_attn/models/gpt_neox.py:103-124`` sets ``parallel_block`` +
``rotary_emb_fraction``; ``flash_attn/models/falcon.py:102-143`` adds
``parallel_block_tied_norm`` + multi-query). This module is the TPU-native
equivalent: one scan-compiled block whose config covers

  * parallel residual   — ``x + attn(ln1(x)) + mlp(ln2(x))`` in one step
    (NeoX ``use_parallel_residual``), vs the sequential pre-LN block;
  * tied parallel norm  — Falcon-7B shares ONE LayerNorm between the two
    parallel branches (``parallel_block_tied_norm=True``);
  * partial rotary      — NeoX rotates only ``rotary_pct`` of each head's
    dims (``rotary_emb_fraction``); Falcon rotates all of them;
  * multi-query / GQA   — Falcon's single shared KV head
    (``num_kv_heads=1``), broadcast in the attention op;
  * biasless linears    — Falcon sets ``bias=False`` everywhere.

Same functional conventions as the rest of the zoo (``models/llama.py``,
``models/gpt2.py``): stacked layer params, ``lax.scan`` forward, weights
usable as plain arrays or prequantized fp8 ``QTensor``s.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.ops.layernorm import layernorm
from llm_fp8_tpu.ops.rotary import rope_frequencies, rope_cos_sin, apply_rope
from llm_fp8_tpu.quant import QTensor, qdot

__all__ = [
    "NeoXConfig", "NEOX_REGISTRY", "init_neox_params", "neox_forward",
    "pack_neox_state_dict", "pack_falcon_state_dict",
]


@dataclasses.dataclass(frozen=True)
class NeoXConfig:
    name: str
    vocab_size: int = 50432
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    num_kv_heads: int = -1  # -1 = num_heads; 1 = Falcon-style multi-query
    rotary_pct: float = 0.25  # fraction of head_dim rotated (Falcon: 1.0)
    rotary_base: float = 10000.0
    parallel_residual: bool = True
    tied_norm: bool = False  # Falcon-7B: one LN feeds both branches
    use_bias: bool = True  # Falcon: False
    ln_eps: float = 1e-5
    tie_word_embeddings: bool = False

    def __post_init__(self):
        if self.num_kv_heads < 0:
            object.__setattr__(self, "num_kv_heads", self.num_heads)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        # HF GPTNeoX truncates (int), e.g. 0.25 * 64 = 16.
        return int(self.head_dim * self.rotary_pct)


NEOX_REGISTRY = {
    # Pythia suite dims (EleutherAI/pythia-*; rotary_pct=0.25).
    "pythia-160m": NeoXConfig(name="pythia-160m", hidden_size=768,
                              num_layers=12, num_heads=12),
    "pythia-410m": NeoXConfig(name="pythia-410m", hidden_size=1024,
                              intermediate_size=4096, num_layers=24,
                              num_heads=16),
    "pythia-1.4b": NeoXConfig(name="pythia-1.4b", hidden_size=2048,
                              intermediate_size=8192, num_layers=24,
                              num_heads=16),
    # Falcon-7B: MQA, full rotary, tied parallel norm, no biases.
    "falcon-7b": NeoXConfig(name="falcon-7b", vocab_size=65024,
                            hidden_size=4544, intermediate_size=18176,
                            num_layers=32, num_heads=71, num_kv_heads=1,
                            rotary_pct=1.0, parallel_residual=True,
                            tied_norm=True, use_bias=False,
                            tie_word_embeddings=True),
    "debug-neox": NeoXConfig(name="debug-neox", vocab_size=512,
                             hidden_size=128, intermediate_size=512,
                             num_layers=2, num_heads=4),
    "debug-falcon": NeoXConfig(name="debug-falcon", vocab_size=512,
                               hidden_size=128, intermediate_size=512,
                               num_layers=2, num_heads=4, num_kv_heads=1,
                               rotary_pct=1.0, tied_norm=True,
                               use_bias=False, tie_word_embeddings=True),
    "debug-neox-seq": NeoXConfig(name="debug-neox-seq", vocab_size=512,
                                 hidden_size=128, intermediate_size=512,
                                 num_layers=2, num_heads=4,
                                 parallel_residual=False),
}


def init_neox_params(cfg: NeoXConfig, key: jax.Array, dtype=jnp.float32):
    k = iter(jax.random.split(key, 8))
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    layers: Dict[str, jax.Array] = {
        "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
        "w_qkv": w(next(k), (L, D, qkv_out)),
        "w_out": w(next(k), (L, D, D)),
        "w_fc": w(next(k), (L, D, I)),
        "w_proj": w(next(k), (L, I, D)),
    }
    if not cfg.tied_norm:
        layers["ln2_w"] = jnp.ones((L, D), dtype)
        layers["ln2_b"] = jnp.zeros((L, D), dtype)
    if cfg.use_bias:
        layers["b_qkv"] = jnp.zeros((L, qkv_out), dtype)
        layers["b_out"] = jnp.zeros((L, D), dtype)
        layers["b_fc"] = jnp.zeros((L, I), dtype)
        layers["b_proj"] = jnp.zeros((L, D), dtype)
    params = {
        "wte": w(next(k), (cfg.vocab_size, D)),
        "layers": layers,
        "lnf_w": jnp.ones((D,), dtype),
        "lnf_b": jnp.zeros((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(next(k), (cfg.vocab_size, D))
    return params


def pack_neox_state_dict(sd: Dict[str, jax.Array], cfg: NeoXConfig,
                         dtype=jnp.float32):
    """HF ``GPTNeoXForCausalLM`` state dict → stacked params.

    HF stores the fused qkv as ``[(nheads, 3, headdim), D]`` row blocks
    (the remap the reference undoes at ``gpt_neox.py:76-88``); we split it
    to ``[D, (3, nheads, headdim)]`` columns.
    """
    import numpy as np

    def g(name):
        return jnp.asarray(np.asarray(sd[name])).astype(dtype)

    L, H, Dh, D = cfg.num_layers, cfg.num_heads, cfg.head_dim, cfg.hidden_size

    def qkv_w(i):
        wq = np.asarray(sd[f"gpt_neox.layers.{i}.attention.query_key_value.weight"])
        wq = wq.reshape(H, 3, Dh, D).transpose(1, 0, 2, 3).reshape(3 * H * Dh, D)
        return jnp.asarray(wq.T).astype(dtype)  # [D, 3*H*Dh]

    def qkv_b(i):
        b = np.asarray(sd[f"gpt_neox.layers.{i}.attention.query_key_value.bias"])
        return jnp.asarray(
            b.reshape(H, 3, Dh).transpose(1, 0, 2).reshape(3 * H * Dh)
        ).astype(dtype)

    stack = lambda fmt, tr=False: jnp.stack(  # noqa: E731
        [g(fmt.format(i)).T if tr else g(fmt.format(i)) for i in range(L)]
    )
    params = {
        "wte": g("gpt_neox.embed_in.weight"),
        "layers": {
            "ln1_w": stack("gpt_neox.layers.{}.input_layernorm.weight"),
            "ln1_b": stack("gpt_neox.layers.{}.input_layernorm.bias"),
            "ln2_w": stack("gpt_neox.layers.{}.post_attention_layernorm.weight"),
            "ln2_b": stack("gpt_neox.layers.{}.post_attention_layernorm.bias"),
            "w_qkv": jnp.stack([qkv_w(i) for i in range(L)]),
            "b_qkv": jnp.stack([qkv_b(i) for i in range(L)]),
            "w_out": stack("gpt_neox.layers.{}.attention.dense.weight", tr=True),
            "b_out": stack("gpt_neox.layers.{}.attention.dense.bias"),
            "w_fc": stack("gpt_neox.layers.{}.mlp.dense_h_to_4h.weight", tr=True),
            "b_fc": stack("gpt_neox.layers.{}.mlp.dense_h_to_4h.bias"),
            "w_proj": stack("gpt_neox.layers.{}.mlp.dense_4h_to_h.weight", tr=True),
            "b_proj": stack("gpt_neox.layers.{}.mlp.dense_4h_to_h.bias"),
        },
        "lnf_w": g("gpt_neox.final_layer_norm.weight"),
        "lnf_b": g("gpt_neox.final_layer_norm.bias"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = g("embed_out.weight")
    return params


def pack_falcon_state_dict(sd: Dict[str, jax.Array], cfg: NeoXConfig,
                           dtype=jnp.float32):
    """HF ``FalconForCausalLM`` (7B layout: MQA, parallel tied norm) →
    stacked params. Falcon fuses qkv as ``[H*Dh + 2*Dh, D]`` rows (q heads
    then the single shared k and v head) — already our column order after
    transpose."""
    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    L = cfg.num_layers
    stack = lambda fmt, tr=False: jnp.stack(  # noqa: E731
        [g(fmt.format(i)).T if tr else g(fmt.format(i)) for i in range(L)]
    )
    return {
        "wte": g("transformer.word_embeddings.weight"),
        "layers": {
            "ln1_w": stack("transformer.h.{}.input_layernorm.weight"),
            "ln1_b": stack("transformer.h.{}.input_layernorm.bias"),
            "w_qkv": stack(
                "transformer.h.{}.self_attention.query_key_value.weight",
                tr=True),
            "w_out": stack("transformer.h.{}.self_attention.dense.weight",
                           tr=True),
            "w_fc": stack("transformer.h.{}.mlp.dense_h_to_4h.weight", tr=True),
            "w_proj": stack("transformer.h.{}.mlp.dense_4h_to_h.weight",
                            tr=True),
        },
        "lnf_w": g("transformer.ln_f.weight"),
        "lnf_b": g("transformer.ln_f.bias"),
    }


def _dot(x, w):
    if isinstance(w, QTensor):
        return qdot(x, w)
    return jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _partial_rope(x, cos, sin, rotary_dim):
    """Rotate the first ``rotary_dim`` dims of each head, pass the rest."""
    if rotary_dim == x.shape[-1]:
        return apply_rope(x, cos, sin)
    rot, keep = x[..., :rotary_dim], x[..., rotary_dim:]
    return jnp.concatenate([apply_rope(rot, cos, sin), keep], axis=-1)


def neox_forward(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: NeoXConfig,
    *,
    attn_impl: str = "auto",
    compute_dtype=jnp.float32,
) -> jax.Array:
    """``tokens [B, S] -> logits [B, S, V]`` (training/eval forward)."""
    B, S = tokens.shape
    D, Hq, Hk, Dh = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = jnp.take(params["wte"], tokens, axis=0).astype(compute_dtype)

    inv_freq = rope_frequencies(cfg.rotary_dim, cfg.rotary_base)
    cos, sin = rope_cos_sin(jnp.arange(S)[None], inv_freq)

    def bias(lp, name, like):
        return lp[name].astype(like.dtype) if name in lp else 0.0

    def attn_branch(h, lp):
        qkv = _dot(h, lp["w_qkv"]) + bias(lp, "b_qkv", h)
        q, k, v = jnp.split(
            qkv, [Hq * Dh, Hq * Dh + Hk * Dh], axis=-1
        )
        q = q.reshape(B, S, Hq, Dh)
        k = k.reshape(B, S, Hk, Dh)
        v = v.reshape(B, S, Hk, Dh)
        q = _partial_rope(q, cos, sin, cfg.rotary_dim)
        k = _partial_rope(k, cos, sin, cfg.rotary_dim)
        a = attention(q, k, v, causal=True, impl=attn_impl)
        return _dot(a.reshape(B, S, Hq * Dh), lp["w_out"]) + bias(lp, "b_out", h)

    def mlp_branch(h, lp):
        h = _dot(h, lp["w_fc"]) + bias(lp, "b_fc", h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
            compute_dtype
        )
        return _dot(h, lp["w_proj"]) + bias(lp, "b_proj", h)

    def body(x, lp):
        h1 = layernorm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        if cfg.parallel_residual:
            h2 = h1 if cfg.tied_norm else layernorm(
                x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps
            )
            x = x + attn_branch(h1, lp) + mlp_branch(h2, lp)
        else:
            x = x + attn_branch(h1, lp)
            h2 = layernorm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            x = x + mlp_branch(h2, lp)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layernorm(x, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
    head = params["wte"] if cfg.tie_word_embeddings else params["lm_head"]
    return jnp.dot(
        x, head.T.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(jnp.float32)
