"""Mixtral-family sparse Mixture-of-Experts decoder (beyond-reference).

The reference has no MoE and no expert parallelism — the thesis discusses
MoE only as background (``thesis/chapters/c2/c2_mo_llm.tex:139``) and
SURVEY.md §2d records EP as absent. This module adds the capability the
TPU-first design makes natural: the Mixtral architecture (Llama attention +
top-k routed SwiGLU experts, numerics mirroring HF ``MixtralForCausalLM``
for parity testing) on the same kernel/quant/serving stack as every other
family.

TPU-idiomatic routing: GShard-style one-hot **einsum dispatch** with a
static expert capacity — every shape is static under ``jit``, the dispatch/
combine contractions and the per-expert FFNs are batched MXU matmuls, and
there is no gather/scatter in the hot path. Expert parallelism falls out of
GSPMD: the expert axis of the stacked ``[L, E, ...]`` weights is sharded
over the mesh ``ep`` axis (``parallel/sharding.py::moe_rules``) and XLA
partitions the dispatch einsums, inserting the all-to-all-class collectives
the reference would have hand-written in NCCL.

Routing numerics (HF ``MixtralSparseMoeBlock``): softmax over *all* expert
logits in fp32, top-k of the probabilities, renormalize the kept weights to
sum to 1. The load-balancing auxiliary loss is Switch/Mixtral's
``E * Σ_e f_e · P_e`` (fraction of routed assignments × mean router prob).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_fp8_tpu.ops.rmsnorm import rmsnorm
from llm_fp8_tpu.ops.rotary import rope_frequencies, rope_cos_sin, apply_rope
from llm_fp8_tpu.quant import QTensor, RecipeSet, quantize
from .config import ModelConfig
from .llama import (
    KVCache,
    _dot,
    _lm_head,
    _remat_policy,
    cache_append_attend,
)
from llm_fp8_tpu.ops.attention import attention

__all__ = [
    "MoEConfig", "MOE_REGISTRY", "init_moe_params", "moe_forward",
    "pack_mixtral_state_dict", "export_mixtral_state_dict",
    "pack_qwen3_moe_state_dict", "export_qwen3_moe_state_dict",
    "quantize_moe_params", "load_balance_loss", "dispatch_experts",
]


@dataclasses.dataclass(frozen=True)
class MoEConfig(ModelConfig):
    """Mixtral = Llama attention + routed experts in place of the MLP."""

    num_experts: int = 8
    num_experts_per_tok: int = 2
    #: Dispatch-path expert capacity factor: within each routing group,
    #: an expert processes at most ``ceil(g · k / E) · capacity_factor``
    #: tokens; overflow assignments are dropped (their combine weight is
    #: zero), the standard GShard trade for static shapes. ``<= 0`` means
    #: full capacity (``C = g``, lossless). The serving/decode path (any
    #: call with a KV cache) always runs lossless — dropped tokens would
    #: silently diverge served logits from HF, and decode batches are small.
    capacity_factor: float = 2.0
    #: GShard-style routing group size: tokens are routed within groups of
    #: this many, which bounds the dispatch tensors at [g, E, C] per group —
    #: memory and dispatch-einsum FLOPs stay *linear* in sequence length
    #: instead of the quadratic blowup of a single global group.
    moe_group_size: int = 512
    router_aux_coef: float = 0.02
    #: Renormalize the top-k gate weights to sum to 1. Mixtral always does;
    #: HF ``Qwen3MoeSparseMoeBlock`` guards it on ``norm_topk_prob`` ("only
    #: diff with mixtral sparse moe block", modeling_qwen3_moe.py:235).
    norm_topk_prob: bool = True

    def num_params(self) -> int:
        d, i, v = self.hidden_size, self.intermediate_size, self.vocab_size
        per_layer = (
            d * self.qkv_dim
            + self.q_dim * d
            + d * self.num_experts              # router
            + self.num_experts * 3 * d * i      # expert gate/up/down
            + 2 * d
        )
        embed = v * d * (1 if self.tie_word_embeddings else 2)
        return self.num_layers * per_layer + embed + d


MOE_REGISTRY: Dict[str, MoEConfig] = {
    # Mixtral-8x7B (HF mistralai/Mixtral-8x7B-v0.1 config.json).
    "mixtral-8x7b": MoEConfig(
        name="mixtral-8x7b", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=32, num_heads=32,
        num_kv_heads=8, head_dim=128, rope_theta=1e6, rms_eps=1e-5,
        max_position_embeddings=32768, num_experts=8, num_experts_per_tok=2,
    ),
    "debug-mixtral": MoEConfig(
        name="debug-mixtral", vocab_size=512, hidden_size=128,
        intermediate_size=256, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=32, rope_theta=1e6, rms_eps=1e-5,
        max_position_embeddings=2048, num_experts=4, num_experts_per_tok=2,
    ),
    # Qwen3-MoE (HF Qwen/Qwen3-30B-A3B config.json): Qwen3 attention
    # (per-head QK-norm, no bias) + Mixtral-shape routed experts with
    # norm_topk_prob. Every layer is sparse (decoder_sparse_step=1), so
    # intermediate_size here is the expert width (moe_intermediate_size).
    "qwen3-30b-a3b": MoEConfig(
        name="qwen3-30b-a3b", vocab_size=151936, hidden_size=2048,
        intermediate_size=768, num_layers=48, num_heads=32, num_kv_heads=4,
        head_dim=128, rope_theta=1e6, rms_eps=1e-6, qk_norm=True,
        max_position_embeddings=40960, num_experts=128,
        num_experts_per_tok=8,
    ),
    "debug-qwen3moe": MoEConfig(
        name="debug-qwen3moe", vocab_size=512, hidden_size=128,
        intermediate_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=32, rope_theta=1e6, rms_eps=1e-6, qk_norm=True,
        max_position_embeddings=2048, num_experts=4, num_experts_per_tok=2,
    ),
}


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------


def init_moe_params(cfg: MoEConfig, key: jax.Array, dtype=jnp.bfloat16):
    k = iter(jax.random.split(key, 16))
    D, I, V, L, E = (cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size,
                     cfg.num_layers, cfg.num_experts)

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "wqkv": w(next(k), (L, D, cfg.qkv_dim)),
        "wo": w(next(k), (L, cfg.q_dim, D)),
        "w_router": w(next(k), (L, D, E)),
        "w_gate_up": w(next(k), (L, E, D, 2 * I)),
        "w_down": w(next(k), (L, E, I, D)),
        "norm_attn": jnp.ones((L, D), dtype),
        "norm_mlp": jnp.ones((L, D), dtype),
    }
    if cfg.qk_norm:  # Qwen3-MoE: per-head RMSNorm on q and k
        layers["q_norm"] = jnp.ones((L, cfg.head_dim), dtype)
        layers["k_norm"] = jnp.ones((L, cfg.head_dim), dtype)
    params = {
        "embed": w(next(k), (V, D)),
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(next(k), (D, V))
    return params


def pack_mixtral_state_dict(sd: Dict[str, jax.Array], cfg: MoEConfig,
                            dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF Mixtral state dict → stacked fused layout.

    Same remap discipline as the Llama loader (the reference's
    ``replace_params``, ``te_llama.py:181-239``): HF linears are ``[out,in]``
    → transposed; per-expert ``w1``(gate)/``w3``(up) concat into one
    ``[D, 2I]`` input projection; experts stacked along a leading E axis.
    """

    def get(name):
        if name not in sd:
            raise KeyError(f"missing {name!r} in checkpoint")
        return sd[name]

    def linear(name):
        return jnp.asarray(get(name)).astype(dtype).T

    L, E = cfg.num_layers, cfg.num_experts
    wqkv, wo, w_router, w_gate_up, w_down = [], [], [], [], []
    n_attn, n_mlp = [], []
    for i in range(L):
        p = f"model.layers.{i}."
        q = linear(p + "self_attn.q_proj.weight")
        kk = linear(p + "self_attn.k_proj.weight")
        v = linear(p + "self_attn.v_proj.weight")
        wqkv.append(jnp.concatenate([q, kk, v], axis=1))
        wo.append(linear(p + "self_attn.o_proj.weight"))
        w_router.append(linear(p + "block_sparse_moe.gate.weight"))
        gu, dn = [], []
        for e in range(E):
            ep = p + f"block_sparse_moe.experts.{e}."
            gate = linear(ep + "w1.weight")
            up = linear(ep + "w3.weight")
            gu.append(jnp.concatenate([gate, up], axis=1))
            dn.append(linear(ep + "w2.weight"))
        w_gate_up.append(jnp.stack(gu))
        w_down.append(jnp.stack(dn))
        n_attn.append(jnp.asarray(get(p + "input_layernorm.weight")).astype(dtype))
        n_mlp.append(
            jnp.asarray(get(p + "post_attention_layernorm.weight")).astype(dtype)
        )

    params: Dict[str, Any] = {
        "embed": jnp.asarray(get("model.embed_tokens.weight")).astype(dtype),
        "layers": {
            "wqkv": jnp.stack(wqkv),
            "wo": jnp.stack(wo),
            "w_router": jnp.stack(w_router),
            "w_gate_up": jnp.stack(w_gate_up),
            "w_down": jnp.stack(w_down),
            "norm_attn": jnp.stack(n_attn),
            "norm_mlp": jnp.stack(n_mlp),
        },
        "final_norm": jnp.asarray(get("model.norm.weight")).astype(dtype),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = linear("lm_head.weight")
    return params


def pack_qwen3_moe_state_dict(sd: Dict[str, jax.Array], cfg: MoEConfig,
                              dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF Qwen3-MoE state dict → stacked fused layout.

    Same remap discipline as :func:`pack_mixtral_state_dict`; the naming
    differences (HF ``modeling_qwen3_moe.py``): per-head ``q_norm``/
    ``k_norm``, router at ``mlp.gate``, experts at
    ``mlp.experts.N.{gate,up,down}_proj``.
    """

    def get(name):
        if name not in sd:
            raise KeyError(f"missing {name!r} in checkpoint")
        return sd[name]

    def linear(name):
        return jnp.asarray(get(name)).astype(dtype).T

    def vec(name):
        return jnp.asarray(get(name)).astype(dtype)

    L, E = cfg.num_layers, cfg.num_experts
    acc: Dict[str, list] = {k: [] for k in (
        "wqkv", "wo", "w_router", "w_gate_up", "w_down", "norm_attn",
        "norm_mlp", "q_norm", "k_norm",
    )}
    for i in range(L):
        p = f"model.layers.{i}."
        q = linear(p + "self_attn.q_proj.weight")
        kk = linear(p + "self_attn.k_proj.weight")
        v = linear(p + "self_attn.v_proj.weight")
        acc["wqkv"].append(jnp.concatenate([q, kk, v], axis=1))
        acc["wo"].append(linear(p + "self_attn.o_proj.weight"))
        acc["q_norm"].append(vec(p + "self_attn.q_norm.weight"))
        acc["k_norm"].append(vec(p + "self_attn.k_norm.weight"))
        acc["w_router"].append(linear(p + "mlp.gate.weight"))
        gu, dn = [], []
        for e in range(E):
            ep = p + f"mlp.experts.{e}."
            gate = linear(ep + "gate_proj.weight")
            up = linear(ep + "up_proj.weight")
            gu.append(jnp.concatenate([gate, up], axis=1))
            dn.append(linear(ep + "down_proj.weight"))
        acc["w_gate_up"].append(jnp.stack(gu))
        acc["w_down"].append(jnp.stack(dn))
        acc["norm_attn"].append(vec(p + "input_layernorm.weight"))
        acc["norm_mlp"].append(vec(p + "post_attention_layernorm.weight"))

    params: Dict[str, Any] = {
        "embed": jnp.asarray(get("model.embed_tokens.weight")).astype(dtype),
        "layers": {k: jnp.stack(v) for k, v in acc.items()},
        "final_norm": jnp.asarray(get("model.norm.weight")).astype(dtype),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = linear("lm_head.weight")
    return params


def export_qwen3_moe_state_dict(params: Dict[str, Any],
                                cfg: MoEConfig) -> Dict[str, Any]:
    """Inverse remap: stacked Qwen3-MoE params → HF names."""
    import numpy as np

    lp = params["layers"]
    out: Dict[str, Any] = {}

    def put(name, arr):
        out[name] = np.asarray(jax.device_get(arr.astype(jnp.float32)))

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"].T)
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        wqkv = lp["wqkv"][i]
        put(p + "self_attn.q_proj.weight", wqkv[:, :qd].T)
        put(p + "self_attn.k_proj.weight", wqkv[:, qd:qd + kvd].T)
        put(p + "self_attn.v_proj.weight", wqkv[:, qd + kvd:].T)
        put(p + "self_attn.o_proj.weight", lp["wo"][i].T)
        put(p + "self_attn.q_norm.weight", lp["q_norm"][i])
        put(p + "self_attn.k_norm.weight", lp["k_norm"][i])
        put(p + "mlp.gate.weight", lp["w_router"][i].T)
        for e in range(cfg.num_experts):
            ep = p + f"mlp.experts.{e}."
            gu = lp["w_gate_up"][i, e]
            put(ep + "gate_proj.weight", gu[:, :I].T)
            put(ep + "up_proj.weight", gu[:, I:].T)
            put(ep + "down_proj.weight", lp["w_down"][i, e].T)
        put(p + "input_layernorm.weight", lp["norm_attn"][i])
        put(p + "post_attention_layernorm.weight", lp["norm_mlp"][i])
    return out


def quantize_moe_params(params: Dict[str, Any], recipes: RecipeSet):
    """Scale-baking pass for serving (same contract as the Llama family's
    ``quantize_params``). Expert weights get per-output-channel scales along
    their contraction axes; the router stays high precision (it is tiny and
    decides the computation graph — quantizing it moves routing decisions,
    not just values)."""
    out = dict(params)
    layers = dict(params["layers"])

    def q(name, role, contract_axis):
        recipe = recipes.for_role(role)
        if recipe is None:
            return
        wv = layers[name]
        if recipe.granularity == "block32":
            from llm_fp8_tpu.quant import quantize_mx

            layers[name] = quantize_mx(
                wv.astype(jnp.float32), recipe.fmt_fwd,
                block_axis=contract_axis, flush_subnormal=True,
            )
        else:
            layers[name] = quantize(
                wv.astype(jnp.float32), recipe.fmt_fwd,
                axes=(contract_axis,), margin=recipe.margin,
                group_size=recipe.group_size, flush_subnormal=True,
            )

    q("wqkv", "attn_qkv", 1)
    q("wo", "attn_out", 1)
    q("w_gate_up", "mlp", 2)   # [L, E, D, 2I] contracts over D
    q("w_down", "mlp", 2)      # [L, E, I, D] contracts over I
    out["layers"] = layers
    lm_recipe = recipes.for_role("lm_head")
    if lm_recipe is not None and "lm_head" in out:
        out["lm_head"] = quantize(
            out["lm_head"].astype(jnp.float32), lm_recipe.fmt_fwd, axes=(0,),
            flush_subnormal=True,
        )
    return out


# --------------------------------------------------------------------------
# Routed MLP
# --------------------------------------------------------------------------


def _edot(x: jax.Array, w, pattern: str) -> jax.Array:
    """Batched-over-experts einsum where ``w`` may be a per-channel QTensor.

    The scale is constant along the contraction (``quantize_moe_params``
    axes), so it post-applies exactly after the einsum — the same trick the
    2-D ``qdot`` uses, batched over E.
    """
    if isinstance(w, QTensor):
        if w.block_size is not None:
            # MX block scales vary along the contraction — not
            # post-applicable; dequantize and let XLA fuse the
            # expand+multiply into the einsum's operand read.
            return jnp.einsum(pattern, x, w.dequantize(x.dtype),
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)
        y = jnp.einsum(pattern, x, w.unpack().astype(x.dtype),
                       preferred_element_type=jnp.float32)
        # scale [E, 1, F] broadcasts over [E, C, F].
        return (y * w.scale.astype(jnp.float32)).astype(x.dtype)
    return jnp.einsum(pattern, x, w.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def load_balance_loss(probs: jax.Array, topi: jax.Array, num_experts: int,
                      token_mask: Optional[jax.Array] = None) -> jax.Array:
    """Switch/Mixtral auxiliary loss: ``E · Σ_{k,e} f_{k,e} · P_e``.

    ``probs`` [T, E] router softmax; ``topi`` [T, K] selected experts;
    ``token_mask`` [T] optionally excludes padding tokens from both
    statistics. Matches HF ``load_balancing_loss_func``
    (modeling_mixtral.py:483-561) exactly: ``f`` is the per-slot mean of
    the one-hot selections (NOT divided by K — uniform routing yields K,
    not 1) and padding is masked out of both means.
    """
    sel = jax.nn.one_hot(topi, num_experts, dtype=jnp.float32)  # [T, K, E]
    p32 = probs.astype(jnp.float32)
    if token_mask is None:
        f = jnp.mean(sel, axis=0)                               # [K, E]
        p = jnp.mean(p32, axis=0)                               # [E]
    else:
        m = token_mask.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        f = jnp.sum(sel * m[:, None, None], axis=0) / denom
        p = jnp.sum(p32 * m[:, None], axis=0) / denom
    return num_experts * jnp.sum(f * p[None, :])


def dispatch_experts(
    h: jax.Array,                 # [T, D] (post-norm tokens)
    topi: jax.Array,              # [T, K] selected expert indices
    topv: jax.Array,              # [T, K] combine weights (fp32)
    w_gate_up,                    # [E, D, 2I] (array or QTensor)
    w_down,                       # [E, I, D]
    num_experts: int,
    *,
    moe_group_size: int = 512,
    capacity_factor: float = 2.0,
    token_mask: Optional[jax.Array] = None,  # [T] 1=real, 0=padding
    lossless: bool = False,
) -> jax.Array:
    """Routed SwiGLU experts via grouped one-hot dispatch — the
    router-agnostic half of the MoE block (Mixtral renormalized softmax and
    DeepSeek's scaled/group-limited gate both feed this).

    Tokens are routed within groups of ``moe_group_size`` (GShard's
    fixed-size groups): the dispatch/combine tensors are ``[G, g, E, C]``
    with per-group capacity C, so memory and dispatch-einsum FLOPs scale
    linearly with sequence length. ``lossless=True`` (the serving path)
    sets C = g — no assignment is ever dropped. Padding tokens
    (``token_mask`` 0) neither claim capacity nor enter the statistics.

    Returns ``y [T, D]``.
    """
    T, D = h.shape
    E, K = num_experts, topi.shape[-1]

    # Group: pad T to a multiple of g with masked-out rows.
    g = min(T, max(1, moe_group_size))
    Tp = -(-T // g) * g
    valid = (jnp.ones((T,), jnp.float32) if token_mask is None
             else token_mask.astype(jnp.float32))
    if Tp != T:
        h = jnp.pad(h, ((0, Tp - T), (0, 0)))
        topi = jnp.pad(topi, ((0, Tp - T), (0, 0)))
        topv = jnp.pad(topv, ((0, Tp - T), (0, 0)))
        valid = jnp.pad(valid, (0, Tp - T))
    G = Tp // g
    if lossless or capacity_factor <= 0:
        C = g  # top_k picks are distinct → an expert sees ≤ g tokens/group
    else:
        per = -(-g * K // E)  # ceil
        C = min(g, max(1, int(per * capacity_factor)))

    # Masked selections never claim a capacity slot.
    sel = (jax.nn.one_hot(topi, E, dtype=jnp.int32)
           * valid[:, None, None].astype(jnp.int32))     # [Tp, K, E]
    selg = sel.reshape(G, g, K, E)
    # Position-in-expert, slot-major within the group (a token's primary
    # expert wins capacity over another token's secondary pick).
    flat = selg.transpose(0, 2, 1, 3).reshape(G, K * g, E)
    pos_flat = jnp.cumsum(flat, axis=1) - 1              # [G, Kg, E]
    pos = pos_flat.reshape(G, K, g, E).transpose(0, 2, 1, 3)  # [G, g, K, E]
    pos_tk = jnp.sum(pos * selg, axis=-1)                # [G, g, K]
    keep = ((pos_tk < C) & (jnp.sum(selg, axis=-1) > 0)).astype(jnp.float32)

    slot = jax.nn.one_hot(pos_tk, C, dtype=jnp.float32)  # [G, g, K, C]
    sel32 = selg.astype(jnp.float32)
    dispatch = jnp.einsum("gtke,gtkc,gtk->gtec", sel32, slot, keep)
    combine = jnp.einsum("gtke,gtkc,gtk,gtk->gtec", sel32, slot, keep,
                         topv.reshape(G, g, K).astype(jnp.float32))

    hg = h.reshape(G, g, D)
    xe = jnp.einsum("gtec,gtd->gecd", dispatch.astype(h.dtype), hg,
                    preferred_element_type=jnp.float32).astype(h.dtype)
    # Batched expert FFN over E with all groups' capacity rows concatenated:
    # [G, E, C, D] → [E, G·C, D] keeps the per-expert GEMMs large and MXU-
    # shaped regardless of the group count.
    xe2 = xe.transpose(1, 0, 2, 3).reshape(E, G * C, D)
    gu = _edot(xe2, w_gate_up, "ecd,edf->ecf")
    gate, up = jnp.split(gu, 2, axis=-1)
    h1 = (jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up)
    ye = _edot(h1, w_down, "ecf,efd->ecd")               # [E, G·C, D]
    yg = ye.reshape(E, G, C, D).transpose(1, 0, 2, 3)    # [G, E, C, D]
    y = jnp.einsum("gtec,gecd->gtd", combine.astype(jnp.float32),
                   yg.astype(jnp.float32),
                   preferred_element_type=jnp.float32).astype(h.dtype)
    return y.reshape(Tp, D)[:T]


def _moe_mlp(
    h: jax.Array,                 # [T, D] (post-norm tokens)
    w_router: jax.Array,          # [D, E]
    w_gate_up,                    # [E, D, 2I] (array or QTensor)
    w_down,                       # [E, I, D]
    cfg: MoEConfig,
    *,
    token_mask: Optional[jax.Array] = None,  # [T] 1=real, 0=padding
    lossless: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Mixtral routing (full-softmax fp32, top-k, renormalize to sum 1 —
    HF ``MixtralSparseMoeBlock``) over :func:`dispatch_experts`.

    Returns ``(y [T, D], aux)``.
    """
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    logits = jnp.dot(h.astype(jnp.float32), w_router.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)            # [T, E] fp32
    topv, topi = jax.lax.top_k(probs, K)               # [T, K]
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    aux = load_balance_loss(probs, topi, E, token_mask)
    y = dispatch_experts(
        h, topi, topv, w_gate_up, w_down, E,
        moe_group_size=cfg.moe_group_size,
        capacity_factor=cfg.capacity_factor,
        token_mask=token_mask, lossless=lossless,
    )
    return y, aux


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def moe_forward(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: MoEConfig,
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
    token_mask: Optional[jax.Array] = None,
    return_router_aux: bool = False,
):
    """``tokens [B, S] → (logits [B, S, V], cache[, aux])``.

    Same engine-facing signature as the Llama family ``forward`` — the MoE
    family serves through the shared continuous-batching Engine via
    ``forward_fn`` like every other zoo member. ``return_router_aux``
    additionally returns the mean per-layer load-balancing loss (scaled by
    ``cfg.router_aux_coef`` at the training loss site, not here).
    """
    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    B, S = tokens.shape
    D = cfg.hidden_size

    start_pos = jnp.broadcast_to(jnp.asarray(start_pos, jnp.int32), (B,))
    positions = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)

    lp_stack = params["layers"]
    Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    seed0 = jnp.asarray(dropout_seed, jnp.int32)

    def layer(x, lp, cache_kv, li=0):
        h = rmsnorm(x, lp["norm_attn"], cfg.rms_eps)
        qkv = _dot(h, lp["wqkv"])
        q, kk, vv = jnp.split(
            qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1
        )
        q = q.reshape(B, S, Hq, Dh)
        kk = kk.reshape(B, S, Hk, Dh)
        if "q_norm" in lp:  # Qwen3-MoE: per-head QK-norm before rope
            q = rmsnorm(q, lp["q_norm"], cfg.rms_eps)
            kk = rmsnorm(kk, lp["k_norm"], cfg.rms_eps)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)
        vv = vv.reshape(B, S, Hk, Dh)
        if cache_kv is None:
            attn = attention(q, kk, vv, causal=True, kv_lens=kv_lens,
                             impl=attn_impl, dropout_p=dropout_p,
                             dropout_seed=seed0 + li * 7919)
            new_kv = None
        else:
            attn, new_kv = cache_append_attend(
                q, kk, vv, cache_kv, start_pos, kv_lens, attn_impl=attn_impl
            )
        x = x + _dot(attn.reshape(B, S, Hq * Dh), lp["wo"])

        h = rmsnorm(x, lp["norm_mlp"], cfg.rms_eps)
        y, aux = _moe_mlp(
            h.reshape(B * S, D), lp["w_router"], lp["w_gate_up"],
            lp["w_down"], cfg,
            token_mask=(None if token_mask is None
                        else token_mask.reshape(B * S)),
            # Serving must never drop an assignment — dropped tokens would
            # silently diverge served logits; decode/prefill T is small.
            lossless=cache_kv is not None,
        )
        return x + y.reshape(B, S, D), new_kv, aux

    if cache is None:
        L = jax.tree_util.tree_leaves(lp_stack)[0].shape[0]

        def body(x, lp_l):
            lp, li = lp_l
            x, _, aux = layer(x, lp, None, li)
            return x, aux

        policy = _remat_policy(remat)
        if policy is not None:
            body = jax.checkpoint(body, policy=policy)
        x, auxes = jax.lax.scan(
            body, x, (lp_stack, jnp.arange(L, dtype=jnp.int32)),
            unroll=unroll,
        )
        new_cache = None
    else:

        def body(carry, lp_l):
            x, ck, cv = carry
            lp, (k_s, v_s, l) = lp_l
            x, (ck, cv), aux = layer(x, lp, (ck, cv, k_s, v_s, l), l)
            return (x, ck, cv), aux

        L = cache.k.shape[0]
        xs = (lp_stack, (cache.k_scale, cache.v_scale,
                         jnp.arange(L, dtype=jnp.int32)))
        (x, new_k, new_v), auxes = jax.lax.scan(
            body, (x, cache.k, cache.v), xs, unroll=unroll
        )
        new_cache = KVCache(
            k=new_k, v=new_v,
            lens=jnp.maximum(cache.lens, start_pos + S),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = _lm_head(params, x, cfg)
    if return_router_aux:
        return logits, new_cache, jnp.mean(auxes)
    return logits, new_cache


def export_mixtral_state_dict(params: Dict[str, Any],
                              cfg: MoEConfig) -> Dict[str, Any]:
    """Inverse remap: stacked MoE params → HF Mixtral names.

    Mirror of :func:`pack_mixtral_state_dict` (the ``ModelSaver``-side of
    the round trip); quantized leaves must be dequantized by the caller.
    """
    import numpy as np

    lp = params["layers"]
    out: Dict[str, Any] = {}

    def put(name, arr):
        out[name] = np.asarray(jax.device_get(arr.astype(jnp.float32)))

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"].T)
    qd, kvd, I = cfg.q_dim, cfg.kv_dim, cfg.intermediate_size
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        wqkv = lp["wqkv"][i]
        put(p + "self_attn.q_proj.weight", wqkv[:, :qd].T)
        put(p + "self_attn.k_proj.weight", wqkv[:, qd : qd + kvd].T)
        put(p + "self_attn.v_proj.weight", wqkv[:, qd + kvd :].T)
        put(p + "self_attn.o_proj.weight", lp["wo"][i].T)
        put(p + "block_sparse_moe.gate.weight", lp["w_router"][i].T)
        for e in range(cfg.num_experts):
            ep = p + f"block_sparse_moe.experts.{e}."
            gu = lp["w_gate_up"][i, e]
            put(ep + "w1.weight", gu[:, :I].T)
            put(ep + "w3.weight", gu[:, I:].T)
            put(ep + "w2.weight", lp["w_down"][i, e].T)
        put(p + "input_layernorm.weight", lp["norm_attn"][i])
        put(p + "post_attention_layernorm.weight", lp["norm_mlp"][i])
    return out
