"""DeepSeek-V2-family decoder: Multi-head Latent Attention + DeepSeekMoE
(beyond-reference).

The reference has no MLA model — its zoo tops out at GQA
(``flash-attention-2.8.0/flash_attn/models/llama.py``; SURVEY.md §2b #31).
This family adds the architecture that makes the strongest case for a
TPU-first serving design: MLA caches a *compressed latent* per token
(``kv_lora_rank + qk_rope_head_dim`` floats, e.g. 576 for DeepSeek-V2 vs
the 32k-per-token a naive per-head cache would need) and decodes via
**absorbed-matmul MQA** over that latent — the per-head K/V are never
materialized at decode time. Numerics mirror HF ``DeepseekV2ForCausalLM``
(transformers ``models/deepseek_v2/modeling_deepseek_v2.py``) for parity
testing.

Architecture recap (HF source cited per detail):

* Q path: either a direct ``q_proj`` or low-rank ``q_a_proj →
  RMSNorm → q_b_proj`` (``q_lora_rank``); per head the query splits into a
  ``qk_nope_head_dim`` content part and a ``qk_rope_head_dim`` rotary part.
* KV path: ``kv_a_proj_with_mqa`` maps hidden → ``kv_lora_rank`` compressed
  latent + one shared ``qk_rope_head_dim`` key-rotary slice; the latent is
  RMSNormed, then ``kv_b_proj`` expands it to per-head (k_nope, v). The
  rotary slice is position-encoded once and broadcast to every head (MQA on
  the rope part).
* Rotary: interleaved (even, odd) pairing — HF's complex ``freqs_cis``
  multiply (``apply_rotary_emb``), NOT the Llama rotate-half convention.
* Softmax scale: ``(qk_nope_head_dim + qk_rope_head_dim) ** -0.5``.
* MLP: first ``first_k_dense_replace`` layers are dense SwiGLU; the rest are
  DeepSeekMoE — fine-grained routed experts (softmax over all experts in
  fp32, top-k, **no renormalization**, weights scaled by
  ``routed_scaling_factor``; V2 additionally restricts the top-k to the best
  ``topk_group`` of ``n_group`` expert groups) plus always-on shared experts.

TPU-first decode: the cache stores the *normalized* latent ``c`` (K side)
and the post-rope shared slice ``k_pe`` (V side of the same arena —
``kv_cache_dims`` gives the two stores different widths). Per step the
query's content part is absorbed through ``kv_b``'s K half
(``q_lat[h] = W_UKᵀ[h] q_nope[h]``) so attention runs as single-shared-KV
MQA in latent space: scores = q_lat·c + q_pe·k_pe, output =
(probs·c) @ W_UV[h]. This is algebraically identical to the expanded
attention (same associativity caveats as any matmul reordering) at ~H× less
cache traffic — the design reason MLA exists, expressed as two einsums XLA
fuses the same way the grouped-einsum decode fast path is
(``ops/attention.py::decode_attention``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_fp8_tpu.ops.rmsnorm import rmsnorm
from llm_fp8_tpu.ops.rotary import rope_frequencies, rope_cos_sin
from llm_fp8_tpu.quant import QTensor, RecipeSet, quantize
from .config import ModelConfig
from .llama import KVCache, _dot, _lm_head, _remat_policy
from .moe import dispatch_experts, load_balance_loss
from .neox import _rope_gptj as _rope_interleaved
from llm_fp8_tpu.ops.attention import attention

__all__ = [
    "MLAConfig", "MLA_REGISTRY", "init_mla_params", "mla_forward",
    "pack_deepseek_state_dict", "export_deepseek_state_dict",
    "quantize_mla_params",
]


@dataclasses.dataclass(frozen=True)
class MLAConfig(ModelConfig):
    """DeepSeek-V2: MLA attention + DeepSeekMoE FFN.

    ``num_kv_heads``/``head_dim`` from the base config describe the *latent*
    cache (1 shared store per token); the per-head dims live in the MLA
    fields below. ``intermediate_size`` is the dense-prefix MLP width.
    """

    q_lora_rank: Optional[int] = None      # None = direct q_proj (V2-Lite)
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    # DeepSeekMoE
    num_experts: int = 64                  # n_routed_experts
    num_experts_per_tok: int = 6
    n_shared_experts: int = 2
    moe_intermediate_size: int = 1408
    first_k_dense_replace: int = 1
    routed_scaling_factor: float = 1.0
    topk_method: str = "greedy"            # or "group_limited_greedy" (V2)
    n_group: Optional[int] = None
    topk_group: Optional[int] = None
    # GShard dispatch knobs (shared with the Mixtral family)
    capacity_factor: float = 2.0
    moe_group_size: int = 512
    router_aux_coef: float = 0.001         # HF aux_loss_alpha default

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    def kv_cache_dims(self) -> Tuple[int, int, int]:
        """Latent cache: K store = normalized compressed kv
        (``kv_lora_rank``), V store = shared post-rope slice."""
        return (1, self.kv_lora_rank, self.qk_rope_head_dim)

    def num_params(self) -> int:
        d, v = self.hidden_size, self.vocab_size
        H, dn, dr, dv = (self.num_heads, self.qk_nope_head_dim,
                         self.qk_rope_head_dim, self.v_head_dim)
        r, qr = self.kv_lora_rank, self.q_lora_rank
        q_p = (d * H * (dn + dr) if qr is None
               else d * qr + qr + qr * H * (dn + dr))
        attn = (q_p + d * (r + dr) + r + r * H * (dn + dv) + H * dv * d)
        dense = 3 * d * self.intermediate_size
        Im, E, S = (self.moe_intermediate_size, self.num_experts,
                    self.n_shared_experts)
        moe = d * E + E * 3 * d * Im + 3 * d * (Im * S)
        Kd = self.first_k_dense_replace
        per = attn + 2 * d
        total = (self.num_layers * per + Kd * dense
                 + (self.num_layers - Kd) * moe)
        embed = v * d * (1 if self.tie_word_embeddings else 2)
        return total + embed + d


def _mla(name: str, **kw) -> MLAConfig:
    base = dict(
        name=name, rope_theta=10000.0, rms_eps=1e-6,
        # base-config fields repurposed: num_kv_heads=1 latent store;
        # head_dim = qk head dim (used only for bookkeeping/estimates).
        num_kv_heads=1,
    )
    base.update(kw)
    return MLAConfig(**base)


# Both published DeepSeek-V2 checkpoints extend 4k → 160k context with the
# same yarn dict (config.json ``rope_scaling``); mscale == mscale_all_dim
# makes the cos/sin attention factor exactly 1.0 (HF convention).
_DEEPSEEK_YARN = dict(
    rope_type="yarn", factor=40.0, beta_fast=32, beta_slow=1,
    mscale=0.707, mscale_all_dim=0.707,
    original_max_position_embeddings=4096,
)

MLA_REGISTRY: Dict[str, MLAConfig] = {
    # deepseek-ai/DeepSeek-V2-Lite (config.json): 27 layers, 16 heads,
    # direct q_proj, greedy top-6 of 64 routed + 2 shared experts, first
    # layer dense.
    "deepseek-v2-lite": _mla(
        "deepseek-v2-lite", vocab_size=102400, hidden_size=2048,
        intermediate_size=10944, num_layers=27, num_heads=16,
        head_dim=192, q_lora_rank=None, kv_lora_rank=512,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        num_experts=64, num_experts_per_tok=6, n_shared_experts=2,
        moe_intermediate_size=1408, first_k_dense_replace=1,
        routed_scaling_factor=1.0, topk_method="greedy",
        max_position_embeddings=163840, rope_scaling=_DEEPSEEK_YARN,
    ),
    # deepseek-ai/DeepSeek-V2: 60 layers, 128 heads, low-rank q (1536),
    # group-limited top-6 of 160 routed experts (best 3 of 8 groups),
    # routed weights scaled 16x.
    "deepseek-v2": _mla(
        "deepseek-v2", vocab_size=102400, hidden_size=5120,
        intermediate_size=12288, num_layers=60, num_heads=128,
        head_dim=192, q_lora_rank=1536, kv_lora_rank=512,
        qk_nope_head_dim=128, qk_rope_head_dim=64, v_head_dim=128,
        num_experts=160, num_experts_per_tok=6, n_shared_experts=2,
        moe_intermediate_size=1536, first_k_dense_replace=1,
        routed_scaling_factor=16.0, topk_method="group_limited_greedy",
        n_group=8, topk_group=3, max_position_embeddings=163840,
        rope_scaling=_DEEPSEEK_YARN,
    ),
    "debug-mla": _mla(
        "debug-mla", vocab_size=512, hidden_size=128,
        intermediate_size=256, num_layers=2, num_heads=4, head_dim=24,
        q_lora_rank=None, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, num_experts=4,
        num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=64, first_k_dense_replace=1,
        max_position_embeddings=2048,
    ),
    # Exercises the low-rank q path + V2's group-limited gate + scaling.
    "debug-mla-q": _mla(
        "debug-mla-q", vocab_size=512, hidden_size=128,
        intermediate_size=256, num_layers=3, num_heads=4, head_dim=24,
        q_lora_rank=48, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, num_experts=8,
        num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=64, first_k_dense_replace=1,
        routed_scaling_factor=2.5, topk_method="group_limited_greedy",
        n_group=2, topk_group=1, max_position_embeddings=2048,
    ),
}


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------


def init_mla_params(cfg: MLAConfig, key: jax.Array, dtype=jnp.bfloat16):
    k = iter(jax.random.split(key, 32))
    D, V, L = cfg.hidden_size, cfg.vocab_size, cfg.num_layers
    H, dn, dr, dv = (cfg.num_heads, cfg.qk_nope_head_dim,
                     cfg.qk_rope_head_dim, cfg.v_head_dim)
    r, qr = cfg.kv_lora_rank, cfg.q_lora_rank
    Kd, Lm = cfg.first_k_dense_replace, L - cfg.first_k_dense_replace
    E, Im, Is = (cfg.num_experts, cfg.moe_intermediate_size,
                 cfg.moe_intermediate_size * cfg.n_shared_experts)
    I = cfg.intermediate_size

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    def attn_leaves(n):
        lv = {
            "w_kv_a": w(next(k), (n, D, r + dr)),
            "norm_kv": jnp.ones((n, r), dtype),
            "w_kv_b": w(next(k), (n, r, H * (dn + dv))),
            "wo": w(next(k), (n, H * dv, D)),
            "norm_attn": jnp.ones((n, D), dtype),
            "norm_mlp": jnp.ones((n, D), dtype),
        }
        if qr is None:
            lv["wq"] = w(next(k), (n, D, H * (dn + dr)))
        else:
            lv["wq_a"] = w(next(k), (n, D, qr))
            lv["norm_q"] = jnp.ones((n, qr), dtype)
            lv["wq_b"] = w(next(k), (n, qr, H * (dn + dr)))
        return lv

    dense = attn_leaves(Kd)
    dense["w_gate_up"] = w(next(k), (Kd, D, 2 * I))
    dense["w_down"] = w(next(k), (Kd, I, D))

    moe = attn_leaves(Lm)
    moe["w_router"] = w(next(k), (Lm, D, E))
    moe["w_gate_up"] = w(next(k), (Lm, E, D, 2 * Im))
    moe["w_down"] = w(next(k), (Lm, E, Im, D))
    moe["w_shared_gate_up"] = w(next(k), (Lm, D, 2 * Is))
    moe["w_shared_down"] = w(next(k), (Lm, Is, D))

    params = {
        "embed": w(next(k), (V, D)),
        "dense_layers": dense,
        "moe_layers": moe,
        "final_norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(next(k), (D, V))
    return params


def pack_deepseek_state_dict(sd: Dict[str, jax.Array], cfg: MLAConfig,
                             dtype=jnp.bfloat16) -> Dict[str, Any]:
    """HF DeepseekV2 state dict → stacked fused layout (same remap
    discipline as the Llama loader; reference ``te_llama.py:181-239``)."""

    def get(name):
        if name not in sd:
            raise KeyError(f"missing {name!r} in checkpoint")
        return sd[name]

    def linear(name):
        return jnp.asarray(get(name)).astype(dtype).T

    def vec(name):
        return jnp.asarray(get(name)).astype(dtype)

    Kd = cfg.first_k_dense_replace
    groups = {"dense": {}, "moe": {}}

    def put(group, leaf, arr):
        groups[group].setdefault(leaf, []).append(arr)

    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        g = "dense" if i < Kd else "moe"
        if cfg.q_lora_rank is None:
            put(g, "wq", linear(p + "self_attn.q_proj.weight"))
        else:
            put(g, "wq_a", linear(p + "self_attn.q_a_proj.weight"))
            put(g, "norm_q", vec(p + "self_attn.q_a_layernorm.weight"))
            put(g, "wq_b", linear(p + "self_attn.q_b_proj.weight"))
        put(g, "w_kv_a", linear(p + "self_attn.kv_a_proj_with_mqa.weight"))
        put(g, "norm_kv", vec(p + "self_attn.kv_a_layernorm.weight"))
        put(g, "w_kv_b", linear(p + "self_attn.kv_b_proj.weight"))
        put(g, "wo", linear(p + "self_attn.o_proj.weight"))
        put(g, "norm_attn", vec(p + "input_layernorm.weight"))
        put(g, "norm_mlp", vec(p + "post_attention_layernorm.weight"))
        if g == "dense":
            gate = linear(p + "mlp.gate_proj.weight")
            up = linear(p + "mlp.up_proj.weight")
            put(g, "w_gate_up", jnp.concatenate([gate, up], axis=1))
            put(g, "w_down", linear(p + "mlp.down_proj.weight"))
        else:
            put(g, "w_router", linear(p + "mlp.gate.weight"))
            gu, dn_ = [], []
            for e in range(cfg.num_experts):
                ep = p + f"mlp.experts.{e}."
                eg = linear(ep + "gate_proj.weight")
                eu = linear(ep + "up_proj.weight")
                gu.append(jnp.concatenate([eg, eu], axis=1))
                dn_.append(linear(ep + "down_proj.weight"))
            put(g, "w_gate_up", jnp.stack(gu))
            put(g, "w_down", jnp.stack(dn_))
            sg = linear(p + "mlp.shared_experts.gate_proj.weight")
            su = linear(p + "mlp.shared_experts.up_proj.weight")
            put(g, "w_shared_gate_up", jnp.concatenate([sg, su], axis=1))
            put(g, "w_shared_down",
                linear(p + "mlp.shared_experts.down_proj.weight"))

    params: Dict[str, Any] = {
        "embed": jnp.asarray(get("model.embed_tokens.weight")).astype(dtype),
        "dense_layers": {k_: jnp.stack(v) for k_, v in
                         groups["dense"].items()},
        "moe_layers": {k_: jnp.stack(v) for k_, v in groups["moe"].items()},
        "final_norm": vec("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = linear("lm_head.weight")
    return params


def export_deepseek_state_dict(params: Dict[str, Any],
                               cfg: MLAConfig) -> Dict[str, Any]:
    """Inverse remap: stacked MLA params → HF DeepseekV2 names."""
    import numpy as np

    out: Dict[str, Any] = {}

    def put(name, arr):
        out[name] = np.asarray(jax.device_get(arr.astype(jnp.float32)))

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"].T)
    Kd = cfg.first_k_dense_replace
    I = cfg.intermediate_size
    Im = cfg.moe_intermediate_size
    Is = Im * cfg.n_shared_experts
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        dense = i < Kd
        lp = params["dense_layers" if dense else "moe_layers"]
        j = i if dense else i - Kd
        if cfg.q_lora_rank is None:
            put(p + "self_attn.q_proj.weight", lp["wq"][j].T)
        else:
            put(p + "self_attn.q_a_proj.weight", lp["wq_a"][j].T)
            put(p + "self_attn.q_a_layernorm.weight", lp["norm_q"][j])
            put(p + "self_attn.q_b_proj.weight", lp["wq_b"][j].T)
        put(p + "self_attn.kv_a_proj_with_mqa.weight", lp["w_kv_a"][j].T)
        put(p + "self_attn.kv_a_layernorm.weight", lp["norm_kv"][j])
        put(p + "self_attn.kv_b_proj.weight", lp["w_kv_b"][j].T)
        put(p + "self_attn.o_proj.weight", lp["wo"][j].T)
        put(p + "input_layernorm.weight", lp["norm_attn"][j])
        put(p + "post_attention_layernorm.weight", lp["norm_mlp"][j])
        if dense:
            gu = lp["w_gate_up"][j]
            put(p + "mlp.gate_proj.weight", gu[:, :I].T)
            put(p + "mlp.up_proj.weight", gu[:, I:].T)
            put(p + "mlp.down_proj.weight", lp["w_down"][j].T)
        else:
            put(p + "mlp.gate.weight", lp["w_router"][j].T)
            for e in range(cfg.num_experts):
                ep = p + f"mlp.experts.{e}."
                gu = lp["w_gate_up"][j, e]
                put(ep + "gate_proj.weight", gu[:, :Im].T)
                put(ep + "up_proj.weight", gu[:, Im:].T)
                put(ep + "down_proj.weight", lp["w_down"][j, e].T)
            sgu = lp["w_shared_gate_up"][j]
            put(p + "mlp.shared_experts.gate_proj.weight", sgu[:, :Is].T)
            put(p + "mlp.shared_experts.up_proj.weight", sgu[:, Is:].T)
            put(p + "mlp.shared_experts.down_proj.weight",
                lp["w_shared_down"][j].T)
    return out


def quantize_mla_params(params: Dict[str, Any], recipes: RecipeSet):
    """Scale-baking pass (same contract as the Llama family's
    ``quantize_params``): per-output-channel scales along the contraction;
    routers and norms stay high precision."""
    from llm_fp8_tpu.quant import quantize_mx

    out = dict(params)

    def qz(layers, name, role, contract_axis):
        recipe = recipes.for_role(role)
        if recipe is None or name not in layers:
            return
        wv = layers[name]
        if recipe.granularity == "block32":
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

    for gname in ("dense_layers", "moe_layers"):
        layers = dict(params[gname])
        for nm in ("wq", "wq_a", "wq_b", "w_kv_a", "w_kv_b"):
            qz(layers, nm, "attn_qkv", 1)
        qz(layers, "wo", "attn_out", 1)
        if gname == "dense_layers":
            qz(layers, "w_gate_up", "mlp", 1)
            qz(layers, "w_down", "mlp", 1)
        else:
            qz(layers, "w_gate_up", "mlp", 2)   # [Lm, E, D, 2Im]
            qz(layers, "w_down", "mlp", 2)
            qz(layers, "w_shared_gate_up", "mlp", 1)
            qz(layers, "w_shared_down", "mlp", 1)
        out[gname] = layers
    lm_recipe = recipes.for_role("lm_head")
    if lm_recipe is not None and "lm_head" in out:
        out["lm_head"] = quantize(
            out["lm_head"].astype(jnp.float32), lm_recipe.fmt_fwd, axes=(0,),
            flush_subnormal=True,
        )
    return out


# --------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------


def _asarray(w, dtype):
    return w.dequantize(dtype) if isinstance(w, QTensor) else w.astype(dtype)


def _project_q(h, lp, cfg, eps):
    """hidden → [B, S, H, dn + dr] query (direct or low-rank)."""
    if cfg.q_lora_rank is None:
        q = _dot(h, lp["wq"])
    else:
        qa = rmsnorm(_dot(h, lp["wq_a"]), lp["norm_q"], eps)
        q = _dot(qa, lp["wq_b"])
    B, S = h.shape[:2]
    return q.reshape(B, S, cfg.num_heads, cfg.qk_head_dim)


def _latents(h, lp, cfg, cos, sin):
    """hidden → (c [B,S,r] normalized latent, k_pe [B,S,dr] post-rope)."""
    ckv = _dot(h, lp["w_kv_a"])
    c, k_pe = jnp.split(ckv, [cfg.kv_lora_rank], axis=-1)
    c = rmsnorm(c, lp["norm_kv"], cfg.rms_eps)
    k_pe = _rope_interleaved(k_pe[:, :, None, :], cos, sin)[:, :, 0, :]
    return c, k_pe


def _mla_attn_expanded(h, lp, cfg, cos, sin, kv_lens, attn_impl,
                       dropout_p, dropout_seed):
    """Training/parity attention: expand the latent to per-head K/V and run
    the shared flash/reference attention (HF's own forward shape). V is
    zero-padded to the QK head dim for the kernel and sliced back — exactly
    what HF does for flash-attention-2 when ``qk_head_dim != v_head_dim``."""
    B, S, _ = h.shape
    H, dn, dr, dv = (cfg.num_heads, cfg.qk_nope_head_dim,
                     cfg.qk_rope_head_dim, cfg.v_head_dim)
    q = _project_q(h, lp, cfg, cfg.rms_eps)
    q_nope, q_pe = jnp.split(q, [dn], axis=-1)
    q_pe = _rope_interleaved(q_pe, cos, sin)
    c, k_pe = _latents(h, lp, cfg, cos, sin)
    kv = _dot(c, lp["w_kv_b"]).reshape(B, S, H, dn + dv)
    k_nope, v = jnp.split(kv, [dn], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe[:, :, None, :], (B, S, H, dr))],
        axis=-1,
    )
    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    dq = dn + dr
    if dv != dq:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, dq - dv)))
    o = attention(
        q, k, v, causal=True, kv_lens=kv_lens, impl=attn_impl,
        scale=dq ** -0.5, dropout_p=dropout_p, dropout_seed=dropout_seed,
    )
    return o[..., :dv].reshape(B, S, H * dv)


def _mla_attend_latent(q_nope, q_pe, c_all, pe_all, w_uk, w_uv, cfg,
                       start_pos, kv_lens):
    """Absorbed-matmul MQA over the latent cache.

    ``q_nope [B,S,H,dn]``, ``q_pe [B,S,H,dr]`` (post-rope);
    ``c_all [B,T,r]`` normalized latents, ``pe_all [B,T,dr]`` post-rope
    shared slices; ``w_uk [H,dn,r]``, ``w_uv [H,r,dv]`` = the two halves of
    ``kv_b_proj``. Causal over absolute positions ``start_pos`` with
    ``kv_lens`` ragged masking — the MLA analogue of ``decode_attention``.
    """
    B, S, H, dn = q_nope.shape
    T = c_all.shape[1]
    scale = (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim) ** -0.5

    q_lat = jnp.einsum(
        "bshd,hdr->bshr", q_nope.astype(jnp.float32),
        w_uk.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    s = (
        jnp.einsum("bshr,btr->bhst", q_lat, c_all.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bshd,btd->bhst", q_pe.astype(jnp.float32),
                     pe_all.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    ) * scale

    k_pos = jnp.arange(T, dtype=jnp.int32)
    q_pos = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    mask = k_pos[None, None, :] <= q_pos[:, :, None]  # [B, S, T]
    if kv_lens is not None:
        mask &= k_pos[None, None, :] < kv_lens[:, None, None]
    s = jnp.where(mask[:, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)

    o_lat = jnp.einsum("bhst,btr->bshr", p, c_all.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    o = jnp.einsum("bshr,hrd->bshd", o_lat, w_uv.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return o.reshape(B, S, H * cfg.v_head_dim).astype(q_nope.dtype)


def _split_kv_b(w_kv_b, cfg, dtype):
    """``kv_b_proj [r, H·(dn+dv)]`` → (``w_uk [H,dn,r]``, ``w_uv [H,r,dv]``)."""
    H, dn, dv = cfg.num_heads, cfg.qk_nope_head_dim, cfg.v_head_dim
    w = _asarray(w_kv_b, dtype).reshape(cfg.kv_lora_rank, H, dn + dv)
    w_uk = w[:, :, :dn].transpose(1, 2, 0)   # [H, dn, r]
    w_uv = w[:, :, dn:].transpose(1, 0, 2)   # [H, r, dv]
    return w_uk, w_uv


# --------------------------------------------------------------------------
# MoE block (DeepSeek gate)
# --------------------------------------------------------------------------


def _deepseek_gate(h, w_router, cfg: MLAConfig):
    """HF ``DeepseekV2MoEGate``: fp32 softmax over all experts, top-k
    (optionally restricted to the best ``topk_group`` of ``n_group`` expert
    groups), **no renormalization**, scaled by ``routed_scaling_factor``."""
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    logits = jnp.dot(h.astype(jnp.float32), w_router.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)            # [T, E] fp32
    if cfg.topk_method == "group_limited_greedy":
        T = probs.shape[0]
        G = cfg.n_group
        grp = probs.reshape(T, G, E // G)
        group_scores = jnp.max(grp, axis=-1)           # [T, G]
        _, gidx = jax.lax.top_k(group_scores, cfg.topk_group)
        gmask = jnp.sum(
            jax.nn.one_hot(gidx, G, dtype=jnp.float32), axis=1
        )                                              # [T, G]
        masked = (grp * gmask[:, :, None]).reshape(T, E)
        topv, topi = jax.lax.top_k(masked, K)
    else:
        topv, topi = jax.lax.top_k(probs, K)
    topv = topv * cfg.routed_scaling_factor
    return probs, topv, topi


def _deepseek_moe(h, lp, cfg: MLAConfig, token_mask, lossless):
    """Routed experts + always-on shared experts (HF ``DeepseekV2MoE``)."""
    T = h.shape[0]
    probs, topv, topi = _deepseek_gate(h, lp["w_router"], cfg)
    aux = load_balance_loss(probs, topi, cfg.num_experts, token_mask)
    y = dispatch_experts(
        h, topi, topv, lp["w_gate_up"], lp["w_down"], cfg.num_experts,
        moe_group_size=cfg.moe_group_size,
        capacity_factor=cfg.capacity_factor,
        token_mask=token_mask, lossless=lossless,
    )
    gu = _dot(h, lp["w_shared_gate_up"])
    gate, up = jnp.split(gu, 2, axis=-1)
    shared = _dot(
        jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
        lp["w_shared_down"],
    )
    return y + shared, aux


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def mla_forward(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: MLAConfig,
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

    Same engine-facing signature as every zoo family. Cache-less calls run
    the expanded (per-head K/V) attention — HF's own forward shape, used for
    training and parity. Cached calls run absorbed-matmul MQA over the
    latent cache (``kv_cache_dims``: K store = normalized compressed kv, V
    store = shared post-rope slice), so decode never materializes per-head
    K/V — the MLA serving win.
    """
    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    B, S = tokens.shape
    D = cfg.hidden_size

    start_pos = jnp.broadcast_to(jnp.asarray(start_pos, jnp.int32), (B,))
    positions = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    inv_freq = rope_frequencies(
        cfg.qk_rope_head_dim, cfg.rope_theta, cfg.rope_scaling
    )
    cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)

    Kd = cfg.first_k_dense_replace
    flat_mask = None if token_mask is None else token_mask.reshape(B * S)

    def layer(x, lp, dense, cache_kv, li):
        h = rmsnorm(x, lp["norm_attn"], cfg.rms_eps)
        if cache_kv is None:
            attn = _mla_attn_expanded(
                h, lp, cfg, cos, sin, kv_lens, attn_impl,
                dropout_p, jnp.asarray(dropout_seed, jnp.int32) + li * 7919,
            )
            new_kv = None
        else:
            ck, cv, layer_idx, k_s, v_s = cache_kv
            q = _project_q(h, lp, cfg, cfg.rms_eps)
            q_nope, q_pe = jnp.split(q, [cfg.qk_nope_head_dim], axis=-1)
            q_pe = _rope_interleaved(q_pe, cos, sin)
            c_new, pe_new = _latents(h, lp, cfg, cos, sin)

            # Append into the [L, B, T, 1, ·] arenas at each row's
            # start_pos via a hinted scatter (unique + sorted indices),
            # quantizing (clip-before-cast, same NaN guard as
            # cache_append_attend) when the arena is a narrow dtype.
            # The hints are load-bearing: a vmapped dynamic_update_slice
            # (or an unhinted .at[].set) lowers to a serialized scatter
            # that measured 20 ms/step at 1B/batch 28 on v5e — 78% of the
            # whole decode step; with the hints the write hits the
            # static-position floor (25.4 -> 5.9 ms/step, 4.3x).
            Bq, Sq = c_new.shape[:2]
            bidx = jnp.arange(Bq, dtype=jnp.int32)[:, None]
            pos = start_pos[:, None] + jnp.arange(Sq, dtype=jnp.int32)

            def store(arena, new, scale):
                if arena.dtype != new.dtype:
                    fmax = float(jnp.finfo(arena.dtype).max)
                    new = jnp.clip(
                        new.astype(jnp.float32) / scale, -fmax, fmax
                    )
                return arena.at[layer_idx, bidx, pos, 0].set(
                    new.astype(arena.dtype),
                    unique_indices=True, indices_are_sorted=True,
                )

            ck = store(ck, c_new, k_s)
            cv = store(cv, pe_new, v_s)

            def load(arena, scale):
                row = jax.lax.dynamic_index_in_dim(
                    arena, layer_idx, 0, keepdims=False
                )[:, :, 0, :].astype(compute_dtype)
                if arena.dtype != c_new.dtype:
                    row = row * scale.astype(compute_dtype)
                return row

            c_all = load(ck, k_s)
            pe_all = load(cv, v_s)
            w_uk, w_uv = _split_kv_b(lp["w_kv_b"], cfg, compute_dtype)
            attn = _mla_attend_latent(
                q_nope, q_pe, c_all, pe_all, w_uk, w_uv, cfg,
                start_pos, kv_lens,
            )
            new_kv = (ck, cv)
        x = x + _dot(attn, lp["wo"])

        h = rmsnorm(x, lp["norm_mlp"], cfg.rms_eps)
        if dense:
            gu = _dot(h, lp["w_gate_up"])
            gate, up = jnp.split(gu, 2, axis=-1)
            y = _dot(
                jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
                lp["w_down"],
            )
            aux = jnp.zeros((), jnp.float32)
        else:
            y, aux = _deepseek_moe(
                h.reshape(B * S, D), lp, cfg, flat_mask,
                lossless=cache_kv is not None,
            )
            y = y.reshape(B, S, D)
        return x + y, new_kv, aux

    policy = _remat_policy(remat)

    def scan_group(x, lp_stack, dense, cache_arrays, base):
        n = jax.tree_util.tree_leaves(lp_stack)[0].shape[0]
        if n == 0:
            return x, cache_arrays, jnp.zeros((0,), jnp.float32)
        idx = base + jnp.arange(n, dtype=jnp.int32)
        if cache_arrays is None:

            def body(x, lp_l):
                lp, li = lp_l
                x, _, aux = layer(x, lp, dense, None, li)
                return x, aux

            if policy is not None:
                body = jax.checkpoint(body, policy=policy)
            x, auxes = jax.lax.scan(body, x, (lp_stack, idx), unroll=unroll)
            return x, None, auxes

        scales = (cache.k_scale[base:base + n], cache.v_scale[base:base + n])

        def body(carry, lp_l):
            x, ck, cv = carry
            lp, (li, k_s, v_s) = lp_l
            x, (ck, cv), aux = layer(
                x, lp, dense, (ck, cv, li, k_s, v_s), li
            )
            return (x, ck, cv), aux

        (x, ck, cv), auxes = jax.lax.scan(
            body, (x, *cache_arrays), (lp_stack, (idx, *scales)),
            unroll=unroll,
        )
        return x, (ck, cv), auxes

    cache_arrays = None if cache is None else (cache.k, cache.v)
    x, cache_arrays, aux_d = scan_group(
        x, params["dense_layers"], True, cache_arrays, 0
    )
    x, cache_arrays, aux_m = scan_group(
        x, params["moe_layers"], False, cache_arrays, Kd
    )

    new_cache = None
    if cache is not None:
        new_cache = KVCache(
            k=cache_arrays[0], v=cache_arrays[1],
            lens=jnp.maximum(cache.lens, start_pos + S),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    logits = _lm_head(params, x, cfg)
    if return_router_aux:
        # Dense layers contribute zero aux; mean over MoE layers only
        # (matching the per-MoE-layer mean the Mixtral family reports).
        return logits, new_cache, jnp.mean(aux_m)
    return logits, new_cache
