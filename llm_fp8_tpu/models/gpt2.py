"""GPT-2 family: the classic pre-LN decoder (learned positions, LayerNorm,
GELU MLP) — plus its OPT and BigCode/SantaCoder variants.

Zoo breadth beyond the Llama/Qwen fine-tuning targets — the reference ships a
model zoo around its kernels with GPT as the flagship
(``flash_attn/models/gpt.py:577`` ``GPTLMHeadModel``) and folds OPT and
BigCode onto it (``flash_attn/models/opt.py:79-94`` remaps OPT's separate
q/k/v + ReLU + offset-2 positions; ``flash_attn/models/bigcode.py:110-129``
maps the multi-query c_attn). Same functional conventions as
``models/llama.py``: stacked layer params, ``lax.scan`` forward, weights
usable as plain arrays or prequantized QTensors. One config covers:

  * activation       — ``gelu_tanh`` (GPT-2/BigCode), ``relu`` (OPT), or
    ``swiglu`` (BTLM: ``c_fc``(gate)+``c_fc2``(up) pair);
  * position offset  — OPT reserves the first 2 rows of its position table;
  * multi-query      — BigCode's single shared KV head (``num_kv_heads=1``);
  * ALiBi + muP      — BTLM (``flash_attn/models/btlm.py:81-100``): no
    position table, per-head alibi slopes, muP embedding/output multipliers
    and the 1/d attention scale (``gpt.py:65,596-598``).

OPT-350m's ``word_embed_proj_dim`` projection and post-LN variants are out
of scope (the reference's OPT port skips them the same way).

HF note: GPT-2 checkpoints store linear weights as ``Conv1D`` ``[in, out]`` —
already our layout, so that loader does NOT transpose; OPT and BigCode use
``nn.Linear`` ``[out, in]`` and do.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.ops.layernorm import layernorm
from llm_fp8_tpu.quant import QTensor, qdot

__all__ = ["GPT2Config", "GPT2_REGISTRY", "init_gpt2_params", "gpt2_forward",
           "pack_gpt2_state_dict", "pack_opt_state_dict",
           "pack_bigcode_state_dict", "pack_btlm_state_dict"]


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    name: str
    vocab_size: int = 50257
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    num_kv_heads: int = -1  # -1 = num_heads; 1 = BigCode multi-query
    max_position_embeddings: int = 1024
    activation: str = "gelu_tanh"  # "gelu_tanh" | "relu" (OPT) | "swiglu" (BTLM)
    pos_offset: int = 0  # OPT: position table rows 0-1 are reserved
    ln_eps: float = 1e-5
    inner_size: int = -1  # -1 = 4*hidden; BTLM uses a bespoke ffn width
    use_alibi: bool = False  # BTLM: alibi slopes instead of a position table
    # muP (Cerebras BTLM, flash_attn/models/btlm.py:97-100): embedding-output
    # multiplier, logits multiplier (output_alpha * width_scale), and the
    # 1/d (instead of 1/sqrt(d)) attention scale.
    mup_embeddings_multiplier: float = 1.0
    mup_output_multiplier: float = 1.0
    mup_width_scale: float = 1.0
    mup_scale_qk_dot_by_d: bool = False

    def __post_init__(self):
        if self.num_kv_heads < 0:
            object.__setattr__(self, "num_kv_heads", self.num_heads)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def intermediate_size(self) -> int:
        return self.inner_size if self.inner_size > 0 else 4 * self.hidden_size


GPT2_REGISTRY = {
    "gpt2": GPT2Config(name="gpt2"),
    "gpt2-medium": GPT2Config(name="gpt2-medium", hidden_size=1024,
                              num_layers=24, num_heads=16),
    "gpt2-large": GPT2Config(name="gpt2-large", hidden_size=1280,
                             num_layers=36, num_heads=20),
    "gpt2-xl": GPT2Config(name="gpt2-xl", hidden_size=1600,
                          num_layers=48, num_heads=25),
    "debug-gpt2": GPT2Config(name="debug-gpt2", vocab_size=512,
                             hidden_size=128, num_layers=2, num_heads=4,
                             max_position_embeddings=256),
    # OPT family (facebook/opt-*): ReLU MLP, offset-2 learned positions.
    "opt-125m": GPT2Config(name="opt-125m", vocab_size=50272,
                           max_position_embeddings=2048,
                           activation="relu", pos_offset=2),
    "opt-1.3b": GPT2Config(name="opt-1.3b", vocab_size=50272,
                           hidden_size=2048, num_layers=24, num_heads=32,
                           max_position_embeddings=2048,
                           activation="relu", pos_offset=2),
    "debug-opt": GPT2Config(name="debug-opt", vocab_size=512,
                            hidden_size=128, num_layers=2, num_heads=4,
                            max_position_embeddings=256,
                            activation="relu", pos_offset=2),
    # BigCode (santacoder/starcoder line): GPT-2 block + multi-query KV.
    "santacoder": GPT2Config(name="santacoder", vocab_size=49280,
                             hidden_size=2048, num_layers=24, num_heads=16,
                             num_kv_heads=1,
                             max_position_embeddings=2048),
    "debug-bigcode": GPT2Config(name="debug-bigcode", vocab_size=512,
                                hidden_size=128, num_layers=2, num_heads=4,
                                num_kv_heads=1,
                                max_position_embeddings=256),
    # BTLM (cerebras/btlm-3b-8k-base): GPT-2 block + SwiGLU + ALiBi + muP.
    "btlm-3b": GPT2Config(name="btlm-3b", vocab_size=50257,
                          hidden_size=2560, num_layers=32, num_heads=32,
                          max_position_embeddings=8192, activation="swiglu",
                          inner_size=6826, use_alibi=True,
                          mup_embeddings_multiplier=14.6,
                          mup_output_multiplier=2.22, mup_width_scale=0.1,
                          mup_scale_qk_dot_by_d=True),
    "debug-btlm": GPT2Config(name="debug-btlm", vocab_size=512,
                             hidden_size=128, num_layers=2, num_heads=4,
                             max_position_embeddings=256,
                             activation="swiglu", inner_size=340,
                             use_alibi=True,
                             mup_embeddings_multiplier=14.6,
                             mup_output_multiplier=2.22,
                             mup_width_scale=0.1,
                             mup_scale_qk_dot_by_d=True),
}


def init_gpt2_params(cfg: GPT2Config, key: jax.Array, dtype=jnp.float32):
    k = iter(jax.random.split(key, 8))
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    # SwiGLU (BTLM): w_fc holds the fused gate|up pair, like llama's
    # w_gate_up; ALiBi models carry no position table (1-row placeholder
    # keeps the pytree structure uniform for quantize/shard passes).
    fc_cols = 2 * I if cfg.activation == "swiglu" else I
    n_pos = 1 if cfg.use_alibi else cfg.max_position_embeddings

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    return {
        "wte": w(next(k), (cfg.vocab_size, D)),
        "wpe": w(next(k), (n_pos, D), 0.01),
        "layers": {
            "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
            "ln2_w": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
            "w_qkv": w(next(k), (L, D, D + 2 * cfg.kv_dim)),
            "b_qkv": jnp.zeros((L, D + 2 * cfg.kv_dim), dtype),
            "w_out": w(next(k), (L, D, D)),
            "b_out": jnp.zeros((L, D), dtype),
            "w_fc": w(next(k), (L, D, fc_cols)),
            "b_fc": jnp.zeros((L, fc_cols), dtype),
            "w_proj": w(next(k), (L, I, D)),
            "b_proj": jnp.zeros((L, D), dtype),
        },
        "lnf_w": jnp.ones((D,), dtype),
        "lnf_b": jnp.zeros((D,), dtype),
    }


def pack_gpt2_state_dict(sd: Dict[str, jax.Array], cfg: GPT2Config,
                         dtype=jnp.float32):
    """HF GPT2LMHeadModel state dict → stacked params (Conv1D: no transpose)."""

    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    L = cfg.num_layers
    stack = lambda fmt: jnp.stack([g(fmt.format(i)) for i in range(L)])  # noqa: E731
    return {
        "wte": g("transformer.wte.weight"),
        "wpe": g("transformer.wpe.weight"),
        "layers": {
            "ln1_w": stack("transformer.h.{}.ln_1.weight"),
            "ln1_b": stack("transformer.h.{}.ln_1.bias"),
            "ln2_w": stack("transformer.h.{}.ln_2.weight"),
            "ln2_b": stack("transformer.h.{}.ln_2.bias"),
            "w_qkv": stack("transformer.h.{}.attn.c_attn.weight"),
            "b_qkv": stack("transformer.h.{}.attn.c_attn.bias"),
            "w_out": stack("transformer.h.{}.attn.c_proj.weight"),
            "b_out": stack("transformer.h.{}.attn.c_proj.bias"),
            "w_fc": stack("transformer.h.{}.mlp.c_fc.weight"),
            "b_fc": stack("transformer.h.{}.mlp.c_fc.bias"),
            "w_proj": stack("transformer.h.{}.mlp.c_proj.weight"),
            "b_proj": stack("transformer.h.{}.mlp.c_proj.bias"),
        },
        "lnf_w": g("transformer.ln_f.weight"),
        "lnf_b": g("transformer.ln_f.bias"),
    }


def pack_opt_state_dict(sd: Dict[str, jax.Array], cfg: GPT2Config,
                        dtype=jnp.float32):
    """HF ``OPTForCausalLM`` (pre-LN variants) → stacked params. Separate
    q/k/v Linears ``[out, in]`` concatenate transposed into the fused
    column layout; the offset-2 position table is kept whole and the
    offset applied at lookup (``cfg.pos_offset``). Reference remap:
    ``flash_attn/models/opt.py:79-94``."""
    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    L = cfg.num_layers
    pre = "model.decoder.layers.{}."

    def qkv_w(i):
        p = pre.format(i) + "self_attn."
        return jnp.concatenate(
            [g(p + "q_proj.weight").T, g(p + "k_proj.weight").T,
             g(p + "v_proj.weight").T], axis=1,
        )

    def qkv_b(i):
        p = pre.format(i) + "self_attn."
        return jnp.concatenate(
            [g(p + "q_proj.bias"), g(p + "k_proj.bias"),
             g(p + "v_proj.bias")]
        )

    stack = lambda fmt, tr=False: jnp.stack(  # noqa: E731
        [g(fmt.format(i)).T if tr else g(fmt.format(i)) for i in range(L)]
    )
    return {
        "wte": g("model.decoder.embed_tokens.weight"),
        "wpe": g("model.decoder.embed_positions.weight"),
        "layers": {
            "ln1_w": stack(pre + "self_attn_layer_norm.weight"),
            "ln1_b": stack(pre + "self_attn_layer_norm.bias"),
            "ln2_w": stack(pre + "final_layer_norm.weight"),
            "ln2_b": stack(pre + "final_layer_norm.bias"),
            "w_qkv": jnp.stack([qkv_w(i) for i in range(L)]),
            "b_qkv": jnp.stack([qkv_b(i) for i in range(L)]),
            "w_out": stack(pre + "self_attn.out_proj.weight", tr=True),
            "b_out": stack(pre + "self_attn.out_proj.bias"),
            "w_fc": stack(pre + "fc1.weight", tr=True),
            "b_fc": stack(pre + "fc1.bias"),
            "w_proj": stack(pre + "fc2.weight", tr=True),
            "b_proj": stack(pre + "fc2.bias"),
        },
        "lnf_w": g("model.decoder.final_layer_norm.weight"),
        "lnf_b": g("model.decoder.final_layer_norm.bias"),
    }


def pack_bigcode_state_dict(sd: Dict[str, jax.Array], cfg: GPT2Config,
                            dtype=jnp.float32):
    """HF ``GPTBigCodeForCausalLM`` → stacked params. ``c_attn`` is a
    Linear ``[D + 2*kv_dim, D]`` with the single shared KV head appended
    after the query heads — transposed, that is exactly the fused column
    layout (reference remap ``flash_attn/models/bigcode.py:110-129``)."""
    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    L = cfg.num_layers
    stack = lambda fmt, tr=False: jnp.stack(  # noqa: E731
        [g(fmt.format(i)).T if tr else g(fmt.format(i)) for i in range(L)]
    )
    return {
        "wte": g("transformer.wte.weight"),
        "wpe": g("transformer.wpe.weight"),
        "layers": {
            "ln1_w": stack("transformer.h.{}.ln_1.weight"),
            "ln1_b": stack("transformer.h.{}.ln_1.bias"),
            "ln2_w": stack("transformer.h.{}.ln_2.weight"),
            "ln2_b": stack("transformer.h.{}.ln_2.bias"),
            "w_qkv": stack("transformer.h.{}.attn.c_attn.weight", tr=True),
            "b_qkv": stack("transformer.h.{}.attn.c_attn.bias"),
            "w_out": stack("transformer.h.{}.attn.c_proj.weight", tr=True),
            "b_out": stack("transformer.h.{}.attn.c_proj.bias"),
            "w_fc": stack("transformer.h.{}.mlp.c_fc.weight", tr=True),
            "b_fc": stack("transformer.h.{}.mlp.c_fc.bias"),
            "w_proj": stack("transformer.h.{}.mlp.c_proj.weight", tr=True),
            "b_proj": stack("transformer.h.{}.mlp.c_proj.bias"),
        },
        "lnf_w": g("transformer.ln_f.weight"),
        "lnf_b": g("transformer.ln_f.bias"),
    }


def pack_btlm_state_dict(sd: Dict[str, jax.Array], cfg: GPT2Config,
                         dtype=jnp.float32):
    """HF ``BTLMLMHeadModel`` (cerebras) → stacked params. Conv1D-style
    ``[in, out]`` weights like GPT-2 (no transpose); the SwiGLU pair
    ``c_fc``(gate)/``c_fc2``(up) fuses into ``w_fc`` (reference remap:
    ``flash_attn/models/btlm.py:43-48``); ALiBi → no ``wpe`` in the
    checkpoint (``btlm.py:22``)."""
    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    L = cfg.num_layers
    stack = lambda fmt: jnp.stack([g(fmt.format(i)) for i in range(L)])  # noqa: E731

    def fc_w(i):
        return jnp.concatenate(
            [g(f"transformer.h.{i}.mlp.c_fc.weight"),
             g(f"transformer.h.{i}.mlp.c_fc2.weight")], axis=1,
        )

    def fc_b(i):
        return jnp.concatenate(
            [g(f"transformer.h.{i}.mlp.c_fc.bias"),
             g(f"transformer.h.{i}.mlp.c_fc2.bias")]
        )

    return {
        "wte": g("transformer.wte.weight"),
        "wpe": jnp.zeros((1, cfg.hidden_size), dtype),
        "layers": {
            "ln1_w": stack("transformer.h.{}.ln_1.weight"),
            "ln1_b": stack("transformer.h.{}.ln_1.bias"),
            "ln2_w": stack("transformer.h.{}.ln_2.weight"),
            "ln2_b": stack("transformer.h.{}.ln_2.bias"),
            "w_qkv": stack("transformer.h.{}.attn.c_attn.weight"),
            "b_qkv": stack("transformer.h.{}.attn.c_attn.bias"),
            "w_out": stack("transformer.h.{}.attn.c_proj.weight"),
            "b_out": stack("transformer.h.{}.attn.c_proj.bias"),
            "w_fc": jnp.stack([fc_w(i) for i in range(L)]),
            "b_fc": jnp.stack([fc_b(i) for i in range(L)]),
            "w_proj": stack("transformer.h.{}.mlp.c_proj.weight"),
            "b_proj": stack("transformer.h.{}.mlp.c_proj.bias"),
        },
        "lnf_w": g("transformer.ln_f.weight"),
        "lnf_b": g("transformer.ln_f.bias"),
    }


def _dot(x, w):
    if isinstance(w, QTensor):
        return qdot(x, w)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)


def gpt2_forward(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: GPT2Config,
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
    prefill/decode step exactly like the Llama family's ``forward`` —
    positions taken at ``start_pos``, K/V appended per-sequence, attention
    masked to ``kv_lens`` — so the serving Engine can drive any zoo decoder
    (the reference gives every GPT-class model the same ``generate()``,
    ``flash_attn/utils/generation.py:99-208``). Returns ``(logits, cache)``
    when a cache is passed, bare ``logits`` otherwise.

    ``remat``/``unroll``/``dropout_p``: training knobs with the Llama
    family's semantics (see ``models.llama.forward``) so the shared
    ``Trainer(forward_fn=…)`` drives this family too.
    """
    B, S = tokens.shape
    D, H, Hk, Dh = cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = jnp.take(params["wte"], tokens, axis=0).astype(compute_dtype)
    if cfg.mup_embeddings_multiplier != 1.0:
        # muP embedding scale (reference gpt.py:431, applied at embed output).
        x = x * cfg.mup_embeddings_multiplier
    start_pos = jnp.broadcast_to(jnp.asarray(start_pos, jnp.int32), (B,))
    if cfg.use_alibi:
        from llm_fp8_tpu.ops.attention import default_alibi_slopes

        slopes = default_alibi_slopes(H)  # no learned position table
    else:
        slopes = None
        pos = (start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
               + cfg.pos_offset)
        x = x + jnp.take(params["wpe"], pos, axis=0).astype(x.dtype)
    # muP attention scale: 1/d instead of 1/sqrt(d) (gpt.py:65).
    attn_scale = (1.0 / Dh) if cfg.mup_scale_qk_dot_by_d else None

    def act(h):
        h32 = h.astype(jnp.float32)
        if cfg.activation == "relu":
            return jax.nn.relu(h32).astype(h.dtype)
        return jax.nn.gelu(h32, approximate=True).astype(h.dtype)

    seed0 = jnp.asarray(dropout_seed, jnp.int32)

    def body(carry, lp_l):
        x, ck, cv = carry
        lp, aux = lp_l  # aux: layer index (no cache) | (k_s, v_s, l) (cache)
        h = layernorm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = _dot(h, lp["w_qkv"]) + lp["b_qkv"].astype(x.dtype)
        q, k, v = jnp.split(qkv, [D, D + cfg.kv_dim], axis=-1)
        q = q.reshape(B, S, H, Dh)
        k = k.reshape(B, S, Hk, Dh)
        v = v.reshape(B, S, Hk, Dh)
        if ck is None:
            a = attention(q, k, v, causal=True, impl=attn_impl,
                          scale=attn_scale, alibi_slopes=slopes,
                          dropout_p=dropout_p,
                          dropout_seed=seed0 + aux * 7919)
        else:
            from llm_fp8_tpu.models.llama import cache_append_attend

            a, (ck, cv) = cache_append_attend(
                q, k, v, (ck, cv) + aux, start_pos, kv_lens,
                attn_impl=attn_impl, scale=attn_scale, alibi_slopes=slopes,
            )
        a = checkpoint_name(a, "attn_out")
        x = x + _dot(a.reshape(B, S, D), lp["w_out"]) + lp["b_out"].astype(x.dtype)

        h = layernorm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        h = _dot(h, lp["w_fc"]) + lp["b_fc"].astype(x.dtype)
        if cfg.activation == "swiglu":
            gate, up = jnp.split(h, 2, axis=-1)
            h = (jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up)
        else:
            h = act(h)
        x = x + _dot(h, lp["w_proj"]) + lp["b_proj"].astype(x.dtype)
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
    logits = jnp.dot(
        x, params["wte"].T.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    out_scale = cfg.mup_output_multiplier * cfg.mup_width_scale
    if out_scale != 1.0:
        # muP logits scale (gpt.py:596-598: output_multiplier * width_scale).
        logits = logits * out_scale
    if cache is None:
        return logits
    return logits, new_cache
