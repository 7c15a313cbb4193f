"""BERT-class encoder: bidirectional attention, post-LN blocks, MLM head.

The reference's encoder model (``flash_attn/models/bert.py`` —
``BertModel``/``BertForPreTraining`` over the flash kernels, with
``key_padding_mask`` driving its varlen unpadding). TPU-native version:
static shapes with ``lens``-masked attention instead of unpad/repad (the
kernels' ``kv_lens`` ragged masking is the TPU form of ``cu_seqlens``, see
``ops/varlen.py``), stacked layer params, ``lax.scan`` encoder, weights
usable as plain arrays or prequantized fp8 ``QTensor``s.

Exercises a genuinely different topology against the shared kernel/quant
stack: non-causal attention, post-norm residuals (LN *after* the residual
add), learned absolute + token-type embeddings, and a tied MLM decoder.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.ops.layernorm import layernorm
from llm_fp8_tpu.quant import QTensor, qdot

__all__ = ["BertConfig", "BERT_REGISTRY", "init_bert_params", "bert_forward",
           "bert_mlm_logits", "pack_bert_state_dict"]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    name: str
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    ln_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


BERT_REGISTRY = {
    "bert-base-uncased": BertConfig(name="bert-base-uncased"),
    "bert-large-uncased": BertConfig(name="bert-large-uncased",
                                     hidden_size=1024, intermediate_size=4096,
                                     num_layers=24, num_heads=16),
    "debug-bert": BertConfig(name="debug-bert", vocab_size=512,
                             hidden_size=128, intermediate_size=512,
                             num_layers=2, num_heads=4,
                             max_position_embeddings=128),
}


def init_bert_params(cfg: BertConfig, key: jax.Array, dtype=jnp.float32):
    k = iter(jax.random.split(key, 12))
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    return {
        "wte": w(next(k), (cfg.vocab_size, D)),
        "wpe": w(next(k), (cfg.max_position_embeddings, D)),
        "wtype": w(next(k), (cfg.type_vocab_size, D)),
        "emb_ln_w": jnp.ones((D,), dtype), "emb_ln_b": jnp.zeros((D,), dtype),
        "layers": {
            "w_qkv": w(next(k), (L, D, 3 * D)),
            "b_qkv": jnp.zeros((L, 3 * D), dtype),
            "w_out": w(next(k), (L, D, D)),
            "b_out": jnp.zeros((L, D), dtype),
            "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
            "w_fc": w(next(k), (L, D, I)),
            "b_fc": jnp.zeros((L, I), dtype),
            "w_proj": w(next(k), (L, I, D)),
            "b_proj": jnp.zeros((L, D), dtype),
            "ln2_w": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
        },
        "pool_w": w(next(k), (D, D)), "pool_b": jnp.zeros((D,), dtype),
        "mlm_w": w(next(k), (D, D)), "mlm_b": jnp.zeros((D,), dtype),
        "mlm_ln_w": jnp.ones((D,), dtype), "mlm_ln_b": jnp.zeros((D,), dtype),
        "mlm_bias": jnp.zeros((cfg.vocab_size,), dtype),
    }


def pack_bert_state_dict(sd: Dict[str, jax.Array], cfg: BertConfig,
                         dtype=jnp.float32):
    """HF ``BertForMaskedLM`` (or ``BertModel``) state dict → stacked params.

    HF per-layer attention stores separate q/k/v ``[D, D]`` row-major
    linears; we fuse to one ``[D, 3D]`` column block (the reference's
    ``Wqkv`` fusion, ``bert.py:543-553``).
    """
    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    def opt(name, fallback, tr=False):
        if name not in sd:
            return fallback
        return g(name).T if tr else g(name)

    D, L = cfg.hidden_size, cfg.num_layers
    p = "bert.encoder.layer.{}."

    def qkv_w(i):
        return jnp.concatenate(
            [g(p.format(i) + f"attention.self.{n}.weight").T
             for n in ("query", "key", "value")], axis=1)  # [D, 3D]

    def qkv_b(i):
        return jnp.concatenate(
            [g(p.format(i) + f"attention.self.{n}.bias")
             for n in ("query", "key", "value")])

    stack = lambda fmt, tr=False: jnp.stack(  # noqa: E731
        [g(fmt.format(i)).T if tr else g(fmt.format(i)) for i in range(L)]
    )
    zeros_d = jnp.zeros((D,), dtype)
    params = {
        "wte": g("bert.embeddings.word_embeddings.weight"),
        "wpe": g("bert.embeddings.position_embeddings.weight"),
        "wtype": g("bert.embeddings.token_type_embeddings.weight"),
        "emb_ln_w": g("bert.embeddings.LayerNorm.weight"),
        "emb_ln_b": g("bert.embeddings.LayerNorm.bias"),
        "layers": {
            "w_qkv": jnp.stack([qkv_w(i) for i in range(L)]),
            "b_qkv": jnp.stack([qkv_b(i) for i in range(L)]),
            "w_out": stack(p + "attention.output.dense.weight", tr=True),
            "b_out": stack(p + "attention.output.dense.bias"),
            "ln1_w": stack(p + "attention.output.LayerNorm.weight"),
            "ln1_b": stack(p + "attention.output.LayerNorm.bias"),
            "w_fc": stack(p + "intermediate.dense.weight", tr=True),
            "b_fc": stack(p + "intermediate.dense.bias"),
            "w_proj": stack(p + "output.dense.weight", tr=True),
            "b_proj": stack(p + "output.dense.bias"),
            "ln2_w": stack(p + "output.LayerNorm.weight"),
            "ln2_b": stack(p + "output.LayerNorm.bias"),
        },
        # Pooler / MLM head are absent in some checkpoints (BertForMaskedLM
        # has no pooler; BertModel has no cls head) — identity fallbacks.
        "pool_w": opt("bert.pooler.dense.weight",
                      jnp.zeros((D, D), dtype), tr=True),
        "pool_b": opt("bert.pooler.dense.bias", zeros_d),
        "mlm_w": opt("cls.predictions.transform.dense.weight",
                     jnp.zeros((D, D), dtype), tr=True),
        "mlm_b": opt("cls.predictions.transform.dense.bias", zeros_d),
        "mlm_ln_w": opt("cls.predictions.transform.LayerNorm.weight",
                        jnp.ones((D,), dtype)),
        "mlm_ln_b": opt("cls.predictions.transform.LayerNorm.bias", zeros_d),
        "mlm_bias": opt("cls.predictions.bias",
                        jnp.zeros((cfg.vocab_size,), dtype)),
    }
    return params


def _dot(x, w):
    if isinstance(w, QTensor):
        return qdot(x, w)
    return jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def bert_forward(
    params: Dict[str, Any],
    tokens: jax.Array,  # [B, S]
    cfg: BertConfig,
    *,
    lens: Optional[jax.Array] = None,  # [B] valid lengths (right-padded)
    token_type_ids: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Encode: ``tokens [B, S] -> (sequence_output [B, S, D], pooled [B, D])``.

    ``lens`` masks padding bidirectionally — queries at padded positions
    produce garbage rows (zeroed before return) and no valid position
    attends to padding (the reference's ``key_padding_mask``).
    """
    B, S = tokens.shape
    D, H, Dh = cfg.hidden_size, cfg.num_heads, cfg.head_dim
    pos = jnp.arange(S)
    ttype = (token_type_ids if token_type_ids is not None
             else jnp.zeros_like(tokens))
    x = (
        jnp.take(params["wte"], tokens, axis=0)
        + jnp.take(params["wpe"], pos, axis=0)[None]
        + jnp.take(params["wtype"], ttype, axis=0)
    ).astype(compute_dtype)
    x = layernorm(x, params["emb_ln_w"], params["emb_ln_b"], cfg.ln_eps)

    def body(x, lp):
        qkv = _dot(x, lp["w_qkv"]) + lp["b_qkv"].astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, Dh)
        k = k.reshape(B, S, H, Dh)
        v = v.reshape(B, S, H, Dh)
        a = attention(q, k, v, causal=False, kv_lens=lens, impl=attn_impl)
        h = _dot(a.reshape(B, S, D), lp["w_out"]) + lp["b_out"].astype(x.dtype)
        # Post-LN: normalize AFTER the residual add (vs the zoo's pre-LN
        # decoders) — the topology BERT checkpoints require.
        x = layernorm(x + h, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)

        h = _dot(x, lp["w_fc"]) + lp["b_fc"].astype(x.dtype)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        h = _dot(h, lp["w_proj"]) + lp["b_proj"].astype(x.dtype)
        x = layernorm(x + h, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    if lens is not None:
        x = jnp.where(pos[None, :, None] < lens[:, None, None], x, 0.0)
    pooled = jnp.tanh(_dot(x[:, 0], params["pool_w"])
                      + params["pool_b"].astype(x.dtype))
    return x, pooled


def bert_mlm_logits(params: Dict[str, Any], sequence_output: jax.Array,
                    cfg: BertConfig) -> jax.Array:
    """MLM head: transform (dense+gelu+LN) then decode against tied
    embeddings (+ output bias). ``[B, S, D] -> [B, S, V]``."""
    h = _dot(sequence_output, params["mlm_w"]) + params["mlm_b"].astype(
        sequence_output.dtype
    )
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    h = layernorm(h, params["mlm_ln_w"], params["mlm_ln_b"], cfg.ln_eps)
    return (
        jnp.dot(h, params["wte"].T.astype(h.dtype),
                preferred_element_type=jnp.float32)
        + params["mlm_bias"].astype(jnp.float32)
    ).astype(jnp.float32)
