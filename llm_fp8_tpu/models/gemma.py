"""Gemma-2 family: the softcap/window kernel levers surfaced as a model.

Beyond the reference zoo (``flash_attn/models/`` has no Gemma): Gemma-2
exercises, at the model level, kernel features the reference exposes only at
its kernel API (``softcap``, ``window_size`` —
``hopper/flash_attn_interface.py:653-655``): attention-logit softcapping,
final-logit softcapping, and *alternating* local/global attention (even
layers sliding-window, odd layers full). Numerics mirror HF
``Gemma2ForCausalLM`` (modeling_gemma2.py) for parity testing:

  * RMSNorm multiplies by ``(1 + w)`` in fp32 (zero-init residual-style
    weights);
  * four norms per layer — pre/post attention and pre/post feed-forward,
    the post-norms applied to the block *output* before the residual add;
  * GeGLU MLP: ``down(gelu_tanh(gate(x)) * up(x))``;
  * embeddings scaled by ``sqrt(hidden_size)``;
  * attention scale ``query_pre_attn_scalar**-0.5`` (not ``head_dim``).

TPU idiom for the alternating pattern: the layer scan runs over *pairs*
(stacked params reshaped ``[L/2, 2, ...]``), so each half of the body gets a
static ``window`` — the flash kernel keeps its tile-skip; no traced windows.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.ops.rmsnorm import rmsnorm
from llm_fp8_tpu.ops.rotary import rope_frequencies, rope_cos_sin, apply_rope
from .config import ModelConfig
from .llama import KVCache, _dot, _remat_policy, cache_append_attend

__all__ = [
    "GemmaConfig", "GEMMA_REGISTRY", "init_gemma_params", "gemma_forward",
    "pack_gemma2_state_dict",
]


@dataclasses.dataclass(frozen=True)
class GemmaConfig(ModelConfig):
    """Gemma-2. ``sliding_window`` applies to EVEN layers only (HF
    ``layer_types``: ``sliding_attention`` for even indices, full for odd);
    ``num_layers`` must be even so the pair-scan covers the pattern."""

    query_pre_attn_scalar: float = 256.0
    attn_logit_softcap: Optional[float] = 50.0
    final_logit_softcap: Optional[float] = 30.0

    def __post_init__(self):
        if self.num_layers % 2 != 0:
            raise ValueError("Gemma-2 pair-scan needs an even num_layers")


GEMMA_REGISTRY: Dict[str, GemmaConfig] = {
    # google/gemma-2-2b config.json.
    "gemma2-2b": GemmaConfig(
        name="gemma2-2b", vocab_size=256000, hidden_size=2304,
        intermediate_size=9216, num_layers=26, num_heads=8, num_kv_heads=4,
        head_dim=256, rope_theta=10000.0, rms_eps=1e-6,
        max_position_embeddings=8192, sliding_window=4096,
        query_pre_attn_scalar=256.0, tie_word_embeddings=True,
    ),
    "gemma2-9b": GemmaConfig(
        name="gemma2-9b", vocab_size=256000, hidden_size=3584,
        intermediate_size=14336, num_layers=42, num_heads=16,
        num_kv_heads=8, head_dim=256, rope_theta=10000.0, rms_eps=1e-6,
        max_position_embeddings=8192, sliding_window=4096,
        query_pre_attn_scalar=256.0, tie_word_embeddings=True,
    ),
    "debug-gemma2": GemmaConfig(
        name="debug-gemma2", vocab_size=512, hidden_size=128,
        intermediate_size=256, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=32, rope_theta=10000.0, rms_eps=1e-6,
        max_position_embeddings=2048, sliding_window=6,
        query_pre_attn_scalar=32.0, tie_word_embeddings=True,
    ),
}
# gemma2-9b has 42 layers (even) and 2b has 26 — both pair cleanly.


def init_gemma_params(cfg: GemmaConfig, key: jax.Array, dtype=jnp.bfloat16):
    k = iter(jax.random.split(key, 8))
    D, I, V, L = (cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size,
                  cfg.num_layers)

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "wqkv": w(next(k), (L, D, cfg.qkv_dim)),
        "wo": w(next(k), (L, cfg.q_dim, D)),
        "w_gate_up": w(next(k), (L, D, 2 * I)),
        "w_down": w(next(k), (L, I, D)),
        # Gemma norms are zero-init residual weights (applied as 1 + w).
        "norm_attn": jnp.zeros((L, D), dtype),
        "norm_attn_post": jnp.zeros((L, D), dtype),
        "norm_mlp": jnp.zeros((L, D), dtype),
        "norm_mlp_post": jnp.zeros((L, D), dtype),
    }
    return {
        "embed": w(next(k), (V, D)),
        "layers": layers,
        "final_norm": jnp.zeros((D,), dtype),
    }


def pack_gemma2_state_dict(sd: Dict[str, jax.Array], cfg: GemmaConfig,
                           dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF Gemma2 state dict → stacked fused layout (QKV fuse, gate|up
    concat — the ``replace_params`` discipline, ``te_llama.py:181-239``)."""

    def get(name):
        if name not in sd:
            raise KeyError(f"missing {name!r} in checkpoint")
        return sd[name]

    def linear(name):
        return jnp.asarray(get(name)).astype(dtype).T

    L = cfg.num_layers
    cols = {k: [] for k in ("wqkv", "wo", "w_gate_up", "w_down",
                            "norm_attn", "norm_attn_post", "norm_mlp",
                            "norm_mlp_post")}
    for i in range(L):
        p = f"model.layers.{i}."
        q = linear(p + "self_attn.q_proj.weight")
        kk = linear(p + "self_attn.k_proj.weight")
        v = linear(p + "self_attn.v_proj.weight")
        cols["wqkv"].append(jnp.concatenate([q, kk, v], axis=1))
        cols["wo"].append(linear(p + "self_attn.o_proj.weight"))
        gate = linear(p + "mlp.gate_proj.weight")
        up = linear(p + "mlp.up_proj.weight")
        cols["w_gate_up"].append(jnp.concatenate([gate, up], axis=1))
        cols["w_down"].append(linear(p + "mlp.down_proj.weight"))
        for ours, theirs in (
            ("norm_attn", "input_layernorm"),
            ("norm_attn_post", "post_attention_layernorm"),
            ("norm_mlp", "pre_feedforward_layernorm"),
            ("norm_mlp_post", "post_feedforward_layernorm"),
        ):
            cols[ours].append(
                jnp.asarray(get(p + theirs + ".weight")).astype(dtype)
            )
    return {
        "embed": jnp.asarray(get("model.embed_tokens.weight")).astype(dtype),
        "layers": {k: jnp.stack(v) for k, v in cols.items()},
        "final_norm": jnp.asarray(get("model.norm.weight")).astype(dtype),
    }


def _gnorm(x, w, eps):
    """Gemma RMSNorm: multiply by (1 + w), fp32 like HF Gemma2RMSNorm."""
    return rmsnorm(x, w.astype(jnp.float32) + 1.0, eps)


def gemma_forward(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: GemmaConfig,
    *,
    cache: Optional[KVCache] = None,
    start_pos: jax.Array | int = 0,
    kv_lens: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    unroll: int = 1,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    dropout_p: float = 0.0,
    dropout_seed: jax.Array | int = 0,
):
    """``tokens [B, S] → (logits [B, S, V], cache)`` — shared engine/Trainer
    signature. The scan body processes a (sliding, full) layer *pair* so
    both window variants stay static under jit."""
    B, S = tokens.shape
    D = cfg.hidden_size
    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    # HF computes the normalizer in the activation dtype (bf16 rounds
    # sqrt(2304)=48.0 exactly; fp32 parity tests are exact anyway).
    x = x * jnp.asarray(math.sqrt(D), compute_dtype)

    start_pos = jnp.broadcast_to(jnp.asarray(start_pos, jnp.int32), (B,))
    positions = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)
    Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    scale = float(cfg.query_pre_attn_scalar) ** -0.5
    seed0 = jnp.asarray(dropout_seed, jnp.int32)

    def layer(x, lp, cache_kv, window, li):
        h = _gnorm(x, lp["norm_attn"], cfg.rms_eps)
        qkv = _dot(h, lp["wqkv"])
        q, kk, vv = jnp.split(
            qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1
        )
        q = apply_rope(q.reshape(B, S, Hq, Dh), cos, sin)
        kk = apply_rope(kk.reshape(B, S, Hk, Dh), cos, sin)
        vv = vv.reshape(B, S, Hk, Dh)
        if cache_kv is None:
            attn = attention(
                q, kk, vv, causal=True, kv_lens=kv_lens, impl=attn_impl,
                window=window, softcap=cfg.attn_logit_softcap, scale=scale,
                dropout_p=dropout_p, dropout_seed=seed0 + li * 7919,
            )
            new_kv = None
        else:
            attn, new_kv = cache_append_attend(
                q, kk, vv, cache_kv, start_pos, kv_lens,
                attn_impl=attn_impl, window=window, scale=scale,
                softcap=cfg.attn_logit_softcap,
            )
        o = _dot(attn.reshape(B, S, Hq * Dh), lp["wo"])
        x = x + _gnorm(o, lp["norm_attn_post"], cfg.rms_eps)

        h = _gnorm(x, lp["norm_mlp"], cfg.rms_eps)
        gu = _dot(h, lp["w_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
        h1 = (jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
              .astype(up.dtype) * up)
        down = _dot(h1, lp["w_down"])
        return x + _gnorm(down, lp["norm_mlp_post"], cfg.rms_eps), new_kv

    lp_stack = params["layers"]
    L = cfg.num_layers
    pairs = jax.tree_util.tree_map(
        lambda a: a.reshape(L // 2, 2, *a.shape[1:]), lp_stack
    )

    def pick(tree, j):
        return jax.tree_util.tree_map(lambda a: a[j], tree)

    if cache is None:

        def body(x, lp2_i):
            lp2, i = lp2_i
            # Even global index = sliding, odd = full (HF layer_types).
            x, _ = layer(x, pick(lp2, 0), None, cfg.sliding_window, 2 * i)
            x, _ = layer(x, pick(lp2, 1), None, None, 2 * i + 1)
            return x, None

        policy = _remat_policy(remat)
        if policy is not None:
            body = jax.checkpoint(body, policy=policy)
        x, _ = jax.lax.scan(
            body, x, (pairs, jnp.arange(L // 2, dtype=jnp.int32)),
            unroll=unroll,
        )
        new_cache = None
    else:

        def body(carry, lp2_i):
            x, ck, cv = carry
            lp2, (k_s2, v_s2, i) = lp2_i
            l0 = 2 * i
            x, (ck, cv) = layer(
                x, pick(lp2, 0), (ck, cv, k_s2[0], v_s2[0], l0),
                cfg.sliding_window, l0,
            )
            x, (ck, cv) = layer(
                x, pick(lp2, 1), (ck, cv, k_s2[1], v_s2[1], l0 + 1),
                None, l0 + 1,
            )
            return (x, ck, cv), None

        xs = (pairs, (cache.k_scale.reshape(L // 2, 2),
                      cache.v_scale.reshape(L // 2, 2),
                      jnp.arange(L // 2, dtype=jnp.int32)))
        (x, new_k, new_v), _ = jax.lax.scan(
            body, (x, cache.k, cache.v), xs, unroll=unroll
        )
        new_cache = KVCache(
            k=new_k, v=new_v,
            lens=jnp.maximum(cache.lens, start_pos + S),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )

    x = _gnorm(x, params["final_norm"], cfg.rms_eps)
    logits = jnp.dot(
        x, params["embed"].T.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)
    if cfg.final_logit_softcap is not None:
        cap = cfg.final_logit_softcap
        logits = jnp.tanh(logits / cap) * cap
    return logits, new_cache
