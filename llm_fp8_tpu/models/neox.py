"""Parallel-residual decoder family: GPT-NeoX / Pythia, Falcon and GPT-J.

The reference folds these architectures onto its GPT block via config flags
(``flash_attn/models/gpt_neox.py:103-124`` sets ``parallel_block`` +
``rotary_emb_fraction``; ``flash_attn/models/falcon.py:102-143`` adds
``parallel_block_tied_norm`` + multi-query; ``gptj.py:47-79`` adds the
interleaved rotary + single-LN parallel block). This module is the
TPU-native equivalent: one scan-compiled block whose config covers

  * parallel residual   — ``x + attn(ln1(x)) + mlp(ln2(x))`` in one step
    (NeoX ``use_parallel_residual``), vs the sequential pre-LN block;
  * tied parallel norm  — Falcon-7B shares ONE LayerNorm between the two
    parallel branches (``parallel_block_tied_norm=True``);
  * partial rotary      — NeoX rotates only ``rotary_pct`` of each head's
    dims (``rotary_emb_fraction``); Falcon rotates all of them;
  * multi-query / GQA   — Falcon's single shared KV head
    (``num_kv_heads=1``), broadcast in the attention op;
  * biasless linears    — Falcon sets ``bias=False`` everywhere; GPT-J
    drops bias from the attention projections only and adds one to the
    LM head;
  * rotary convention   — NeoX/Falcon rotate-half vs GPT-J's interleaved
    (even, odd) pairing (``rope_interleaved``).

Same functional conventions as the rest of the zoo (``models/llama.py``,
``models/gpt2.py``): stacked layer params, ``lax.scan`` forward, weights
usable as plain arrays or prequantized fp8 ``QTensor``s.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.ops.layernorm import layernorm
from llm_fp8_tpu.ops.rotary import rope_frequencies, rope_cos_sin, apply_rope
from llm_fp8_tpu.quant import QTensor, qdot

__all__ = [
    "NeoXConfig", "NEOX_REGISTRY", "init_neox_params", "neox_forward",
    "pack_neox_state_dict", "pack_falcon_state_dict", "pack_gptj_state_dict",
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
    tied_norm: bool = False  # Falcon-7B / GPT-J: one LN feeds both branches
    use_bias: bool = True  # Falcon: False
    # GPT-J: biasless attention projections but biased MLP. -1 = follow
    # use_bias; 0/1 override for the attention projections only.
    attn_bias: int = -1
    # GPT-J applies rotary with interleaved (even, odd) pairing instead of
    # the NeoX/Llama rotate-half split (HF ``GPTJAttention.rotary_dim``).
    rope_interleaved: bool = False
    lm_head_bias: bool = False  # GPT-J's lm_head has a bias
    gelu_approximate: bool = False  # GPT-J: gelu_new (tanh approximation)
    ln_eps: float = 1e-5
    tie_word_embeddings: bool = False

    @property
    def attn_has_bias(self) -> bool:
        return self.use_bias if self.attn_bias < 0 else bool(self.attn_bias)

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
    # GPT-J-6B: parallel residual with ONE shared ln_1, interleaved rotary
    # over the first 64 of 256 head dims, biasless attention, biased MLP
    # and lm_head (flash_attn/models/gptj.py:47-79).
    "gptj-6b": NeoXConfig(name="gptj-6b", vocab_size=50400,
                          hidden_size=4096, intermediate_size=16384,
                          num_layers=28, num_heads=16, rotary_pct=0.25,
                          parallel_residual=True, tied_norm=True,
                          attn_bias=0, rope_interleaved=True,
                          lm_head_bias=True, gelu_approximate=True),
    "debug-gptj": NeoXConfig(name="debug-gptj", vocab_size=512,
                             hidden_size=128, intermediate_size=512,
                             num_layers=2, num_heads=4, rotary_pct=0.25,
                             tied_norm=True, attn_bias=0,
                             rope_interleaved=True, lm_head_bias=True,
                             gelu_approximate=True),
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
    if cfg.attn_has_bias:
        layers["b_qkv"] = jnp.zeros((L, qkv_out), dtype)
        layers["b_out"] = jnp.zeros((L, D), dtype)
    if cfg.use_bias:
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
    if cfg.lm_head_bias:
        params["lm_head_b"] = jnp.zeros((cfg.vocab_size,), dtype)
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


def pack_gptj_state_dict(sd: Dict[str, jax.Array], cfg: NeoXConfig,
                         dtype=jnp.float32):
    """HF ``GPTJForCausalLM`` state dict → stacked params. Separate
    q/k/v projections concatenate to our fused ``[D, 3*H*Dh]`` column
    layout; Linear weights ``[out, in]`` transpose."""
    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    L = cfg.num_layers

    def qkv_w(i):
        p = f"transformer.h.{i}.attn."
        return jnp.concatenate(
            [g(p + "q_proj.weight").T, g(p + "k_proj.weight").T,
             g(p + "v_proj.weight").T], axis=1,
        )

    stack = lambda fmt, tr=False: jnp.stack(  # noqa: E731
        [g(fmt.format(i)).T if tr else g(fmt.format(i)) for i in range(L)]
    )
    return {
        "wte": g("transformer.wte.weight"),
        "layers": {
            "ln1_w": stack("transformer.h.{}.ln_1.weight"),
            "ln1_b": stack("transformer.h.{}.ln_1.bias"),
            "w_qkv": jnp.stack([qkv_w(i) for i in range(L)]),
            "w_out": stack("transformer.h.{}.attn.out_proj.weight", tr=True),
            "w_fc": stack("transformer.h.{}.mlp.fc_in.weight", tr=True),
            "b_fc": stack("transformer.h.{}.mlp.fc_in.bias"),
            "w_proj": stack("transformer.h.{}.mlp.fc_out.weight", tr=True),
            "b_proj": stack("transformer.h.{}.mlp.fc_out.bias"),
        },
        "lnf_w": g("transformer.ln_f.weight"),
        "lnf_b": g("transformer.ln_f.bias"),
        "lm_head": g("lm_head.weight"),
        "lm_head_b": g("lm_head.bias"),
    }


def _dot(x, w):
    if isinstance(w, QTensor):
        return qdot(x, w)
    return jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _rope_gptj(x, cos, sin):
    """GPT-J rotary: interleaved (even, odd) pairing within each head dim
    (HF ``GPTJAttention.apply_rotary_pos_emb`` with ``rotate_every_two``)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., ::2], x32[..., 1::2]
    c = jnp.expand_dims(cos, -2)  # broadcast over heads
    s = jnp.expand_dims(sin, -2)
    even = x1 * c - x2 * s
    odd = x2 * c + x1 * s
    return jnp.stack([even, odd], axis=-1).reshape(x.shape).astype(dtype)


def _partial_rope(x, cos, sin, rotary_dim, interleaved=False):
    """Rotate the first ``rotary_dim`` dims of each head, pass the rest."""
    rope = _rope_gptj if interleaved else apply_rope
    if rotary_dim == x.shape[-1]:
        return rope(x, cos, sin)
    rot, keep = x[..., :rotary_dim], x[..., rotary_dim:]
    return jnp.concatenate([rope(rot, cos, sin), keep], axis=-1)


def neox_forward(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: NeoXConfig,
    *,
    cache=None,  # llama.KVCache — same arena layout for every family
    start_pos: jax.Array | int = 0,
    kv_lens=None,
    attn_impl: str = "auto",
    compute_dtype=jnp.float32,
    remat: bool | str = False,
    unroll: int = 1,
    dropout_p: float = 0.0,
    dropout_seed: jax.Array | int = 0,
):
    """``tokens [B, S] -> logits [B, S, V]`` (cache=None: training/eval).

    With ``cache`` (a :class:`llm_fp8_tpu.models.llama.KVCache`), runs the
    prefill/decode step exactly like the Llama family's ``forward`` (rope at
    ``start_pos``, per-sequence K/V append, ``kv_lens`` masking), so the
    serving Engine can drive NeoX/Falcon/GPT-J decoders (the reference's
    shared ``generate()``, ``flash_attn/utils/generation.py:99-208``).
    Returns ``(logits, cache)`` when a cache is passed, bare ``logits``
    otherwise.
    """
    B, S = tokens.shape
    D, Hq, Hk, Dh = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = jnp.take(params["wte"], tokens, axis=0).astype(compute_dtype)

    start_pos = jnp.broadcast_to(jnp.asarray(start_pos, jnp.int32), (B,))
    positions = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    inv_freq = rope_frequencies(cfg.rotary_dim, cfg.rotary_base)
    cos, sin = rope_cos_sin(positions, inv_freq)

    def bias(lp, name, like):
        return lp[name].astype(like.dtype) if name in lp else 0.0

    seed0 = jnp.asarray(dropout_seed, jnp.int32)

    def attn_branch(h, lp, ck, cv, aux):
        qkv = _dot(h, lp["w_qkv"]) + bias(lp, "b_qkv", h)
        q, k, v = jnp.split(
            qkv, [Hq * Dh, Hq * Dh + Hk * Dh], axis=-1
        )
        q = q.reshape(B, S, Hq, Dh)
        k = k.reshape(B, S, Hk, Dh)
        v = v.reshape(B, S, Hk, Dh)
        q = _partial_rope(q, cos, sin, cfg.rotary_dim, cfg.rope_interleaved)
        k = _partial_rope(k, cos, sin, cfg.rotary_dim, cfg.rope_interleaved)
        if ck is None:
            a = attention(q, k, v, causal=True, kv_lens=kv_lens,
                          impl=attn_impl, dropout_p=dropout_p,
                          dropout_seed=seed0 + aux * 7919)
        else:
            from llm_fp8_tpu.models.llama import cache_append_attend

            a, (ck, cv) = cache_append_attend(
                q, k, v, (ck, cv) + aux, start_pos, kv_lens,
                attn_impl=attn_impl,
            )
        a = checkpoint_name(a, "attn_out")
        out = _dot(a.reshape(B, S, Hq * Dh), lp["w_out"]) + bias(lp, "b_out", h)
        return out, ck, cv

    def mlp_branch(h, lp):
        h = _dot(h, lp["w_fc"]) + bias(lp, "b_fc", h)
        h = jax.nn.gelu(
            h.astype(jnp.float32), approximate=cfg.gelu_approximate
        ).astype(compute_dtype)
        return _dot(h, lp["w_proj"]) + bias(lp, "b_proj", h)

    def body(carry, lp_l):
        x, ck, cv = carry
        lp, aux = lp_l  # aux: layer index (no cache) | (k_s, v_s, l) (cache)
        h1 = layernorm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        if cfg.parallel_residual:
            h2 = h1 if cfg.tied_norm else layernorm(
                x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps
            )
            a, ck, cv = attn_branch(h1, lp, ck, cv, aux)
            x = x + a + mlp_branch(h2, lp)
        else:
            a, ck, cv = attn_branch(h1, lp, ck, cv, aux)
            x = x + a
            h2 = layernorm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            x = x + mlp_branch(h2, lp)
        return (x, ck, cv), None

    new_cache = None
    if cache is None:
        from llm_fp8_tpu.models.llama import _remat_policy

        policy = _remat_policy(remat)
        run = body if policy is None else jax.checkpoint(body, policy=policy)
        (x, _, _), _ = jax.lax.scan(
            run, (x, None, None),
            (params["layers"], jnp.arange(cfg.num_layers, dtype=jnp.int32)),
            unroll=unroll,
        )
    else:
        from llm_fp8_tpu.models.llama import KVCache

        L = cache.k.shape[0]
        xs = (params["layers"],
              (cache.k_scale, cache.v_scale, jnp.arange(L, dtype=jnp.int32)))
        (x, new_k, new_v), _ = jax.lax.scan(body, (x, cache.k, cache.v), xs)
        new_cache = KVCache(
            k=new_k, v=new_v, lens=jnp.maximum(cache.lens, start_pos + S),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )
    x = layernorm(x, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
    head = params["wte"] if cfg.tie_word_embeddings else params["lm_head"]
    logits = jnp.dot(
        x, head.T.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    if "lm_head_b" in params:
        logits = logits + params["lm_head_b"].astype(jnp.float32)
    if cache is None:
        return logits
    return logits, new_cache
