"""Llama/Qwen decoder: pure-functional JAX, stacked layers, scan-compiled.

The TPU-native re-design of the reference's TE-patched decoder
(``te_llama.py:41-66``: TE MultiheadAttention + LayerNormMLP under two
``fp8_autocast`` scopes). Differences by design:

  * no modules, no monkey-patching — params are a pytree, the forward is a
    function; quantization state (scales) is explicit input/output.
  * layers are *stacked* (every param has a leading ``[num_layers]`` axis) and
    iterated with ``lax.scan`` — one traced layer body regardless of depth,
    which keeps XLA compile times flat from 1B to 14B.
  * fused projections: ``wqkv = [q|k|v]`` and ``w_gate_up = [gate|up]``
    exactly mirroring TE's fused layouts that the reference's checkpoint remap
    produces (``te_llama.py:181-239``).
  * weights may be plain arrays (bf16 path) or :class:`QTensor` (prequantized
    FP8 serving path); the training path quantizes both operands per recipe
    via :func:`fp8_dot`.

Layout is bshd everywhere (matches TE's ``qkv_format="bshd"``,
``te_llama.py:45-56``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.ops.rmsnorm import rmsnorm
from llm_fp8_tpu.ops.rotary import rope_frequencies, rope_cos_sin, apply_rope
from llm_fp8_tpu.quant import (
    QTensor,
    RecipeSet,
    BF16_SET,
    qdot,
    quantize,
    quantize_mx,
)

from .config import ModelConfig

__all__ = [
    "init_params",
    "forward",
    "quantize_params",
    "KVCache",
    "init_kv_cache",
]


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------


def init_params(
    cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Random init with HF-comparable scales (normal(0, 0.02))."""
    k = iter(jax.random.split(key, 16))
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L = cfg.num_layers

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    layers = {
        "wqkv": w(next(k), (L, D, cfg.qkv_dim)),
        "wo": w(next(k), (L, cfg.q_dim, D)),
        "w_gate_up": w(next(k), (L, D, 2 * I)),
        "w_down": w(next(k), (L, I, D)),
        "norm_attn": jnp.ones((L, D), dtype),
        "norm_mlp": jnp.ones((L, D), dtype),
    }
    if cfg.qkv_bias:
        layers["bqkv"] = jnp.zeros((L, cfg.qkv_dim), dtype)
    if cfg.qk_norm:
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


def quantize_params(
    params: Dict[str, Any], recipes: RecipeSet
) -> Dict[str, Any]:
    """Prequantize weights per the recipe set (the scale-baking pass).

    This is the functional replacement for TE's runtime weight quantization
    inside ``fp8_autocast``: quantize once, bake scales into the checkpoint,
    serve from FP8 (BASELINE.json north-star). Per-output-channel scales for
    per-tensor-class recipes (strictly tighter than TE's per-tensor, free on
    TPU), MX block scales for the block recipe. Norms/embeddings stay high
    precision, as in the reference (TE never wraps them).
    """
    out = dict(params)
    layers = dict(params["layers"])

    def q(name: str, role: str, contract_axis: int = 1):
        recipe = recipes.for_role(role)
        wv = layers[name]
        if recipe is None:
            return
        if recipe.granularity == "block32":
            layers[name] = quantize_mx(
                wv.astype(jnp.float32), recipe.fmt_fwd,
                block_axis=contract_axis, flush_subnormal=True,
            )
        else:
            # contract_axis is the K axis of the stacked [L, K, N] weight.
            layers[name] = quantize(
                wv.astype(jnp.float32), recipe.fmt_fwd, axes=(contract_axis,),
                margin=recipe.margin, group_size=recipe.group_size,
                flush_subnormal=True,
            )

    q("wqkv", "attn_qkv")
    q("wo", "attn_out")
    q("w_gate_up", "mlp")
    q("w_down", "mlp")
    out["layers"] = layers
    lm_recipe = recipes.for_role("lm_head")
    if lm_recipe is not None and "lm_head" in out:
        out["lm_head"] = quantize(
            out["lm_head"].astype(jnp.float32), lm_recipe.fmt_fwd, axes=(0,),
            flush_subnormal=True,
        )
    return out


def _dot(x: jax.Array, w) -> jax.Array:
    """x @ w where w is an array or a QTensor."""
    if isinstance(w, QTensor):
        return qdot(x, w)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(
        x.dtype
    )


#: The four quantized-GEMM sites per decoder layer — the same GEMMs TE
#: intercepts inside its two fp8_autocast scopes (te_llama.py:76-81):
#: QKV projection, attention out-projection, MLP fc1 (gate|up), MLP fc2.
DOT_SITES = ("attn_qkv", "attn_out", "mlp_gate_up", "mlp_down")

#: Dot site -> recipe-set role (both MLP matmuls share the "mlp" recipe,
#: matching the reference's single LayerNormMLP autocast scope).
SITE_ROLE = {
    "attn_qkv": "attn_qkv",
    "attn_out": "attn_out",
    "mlp_gate_up": "mlp",
    "mlp_down": "mlp",
}


def _make_train_dots(recipes, scales, sinks):
    """Build per-site dot closures for the FP8 training path.

    ``scales[site]`` = (x_scale, w_scale) delayed scalars for this layer;
    ``sinks[site]`` = zero scalar whose cotangent carries the bwd amax.
    Returns closures mapping (x, w) -> (y, DotAmaxes).
    """
    from llm_fp8_tpu.quant.dot import fp8_dot, DotAmaxes  # noqa: F401

    dots = {}
    for site in DOT_SITES:
        recipe = recipes.for_role(SITE_ROLE[site]) if recipes else None
        if recipe is None:

            def plain(x, w):
                # Zero amaxes keep the scan-collected pytree uniform across
                # quantized and high-precision sites.
                z = jnp.zeros((), jnp.float32)
                return _dot(x, w), DotAmaxes(z, z, z)

            dots[site] = plain
        else:

            def quantized(x, w, recipe=recipe, site=site):
                x2 = x.reshape(-1, x.shape[-1])
                x_s, w_s = scales[site]
                y, amaxes = fp8_dot(x2, w, x_s, w_s, sinks[site], recipe)
                return y.reshape(*x.shape[:-1], w.shape[-1]).astype(x.dtype), amaxes

            dots[site] = quantized
    return dots


# --------------------------------------------------------------------------
# KV cache
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Static-shape KV cache arena: ``k/v: [L, B, S_max, Hk, Dh]``.

    ``fp8`` storage keeps e4m3 payloads (the FP8-KV serving recipe). FP8 is a
    *float* format, so magnitude-1 K/V values quantize at ~6% relative error
    without any scale; ``k_scale/v_scale`` ([L] per-layer) are provided for
    calibrated deployments. ``lens [B]`` tracks per-sequence fill (the
    ``cache_seqlens`` of ``flash_attn_with_kvcache``,
    reference ``flash_attn/flash_attn_interface.py:1464+``).
    """

    k: jax.Array
    v: jax.Array
    lens: jax.Array  # [B] int32
    k_scale: jax.Array  # [L] f32
    v_scale: jax.Array  # [L] f32

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def fp8(self) -> bool:
        return self.k.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)


def init_kv_cache(
    cfg: ModelConfig,
    batch: int,
    max_len: int,
    *,
    dtype=jnp.bfloat16,
) -> KVCache:
    """Zeroed cache arena for ``cfg``. Families whose K and V stores differ
    in shape (the MLA latent cache: K = compressed kv, V = rope part) override
    ``cfg.kv_cache_dims() -> (Hk, Dk, Dv)``; the default is the symmetric
    per-head layout."""
    L = cfg.num_layers
    dims = getattr(cfg, "kv_cache_dims", None)
    Hk, Dk, Dv = dims() if dims else (
        cfg.num_kv_heads, cfg.head_dim, cfg.head_dim
    )
    return KVCache(
        k=jnp.zeros((L, batch, max_len, Hk, Dk), dtype),
        v=jnp.zeros((L, batch, max_len, Hk, Dv), dtype),
        lens=jnp.zeros((batch,), jnp.int32),
        k_scale=jnp.ones((L,), jnp.float32),
        v_scale=jnp.ones((L,), jnp.float32),
    )


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _remat_policy(remat):
    """Map the remat knob to a jax.checkpoint policy (None = no remat).

    ``True``/"full": save nothing, recompute the whole layer in the backward
    (max memory saving, ~1/3 extra compute). "dots": save matmul outputs,
    recompute only the cheap elementwise ops — near-zero recompute FLOPs at
    a fraction of full activation memory (the measured-MFU-friendly policy).
    """
    if remat in (False, None, "none"):
        return None
    if remat in (True, "full"):
        return jax.checkpoint_policies.nothing_saveable
    if remat == "dots":
        # Matmul outputs are "dots" and get saved; measured at 1B batch 8x512
        # this lifts bf16 MFU 38.4% -> 40.7% vs full remat. "flash_res" keeps
        # the flash custom_vjp's own out/lse residuals (named inside
        # _flash_fwd_rule), so the backward reuses them instead of re-running
        # the Pallas forward kernel. "qdot_res"/"qdot_out" do the same for
        # the native int8 dots (quant/dot.py): their int8 payloads + bf16
        # outputs are saved while the raw int32 MXU accumulators — 4 bytes
        # per element, the reason int8_train OOMed under the plain dots
        # policy — are excluded and recomputed-free (the tagged y replaces
        # them).
        dots = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        names = jax.checkpoint_policies.save_only_these_names(
            "attn_out", "flash_res", "qdot_res", "qdot_out"
        )

        def policy(prim, *args, **params):
            pet = params.get("preferred_element_type")
            if pet is not None and jnp.issubdtype(pet, jnp.integer):
                return False  # raw int32 accumulators: tagged forms suffice
            return dots(prim, *args, **params) or names(prim, *args, **params)

        return policy
    raise ValueError(f"unknown remat policy {remat!r}; "
                     "use False/'none', True/'full', or 'dots'")


def cache_append_attend(
    q: jax.Array,  # [B, S, Hq, Dh]
    kk: jax.Array,  # [B, S, Hk, Dh] new K (post-rope / post-norm)
    vv: jax.Array,
    cache_kv: Tuple,
    start_pos: jax.Array,  # [B]
    kv_lens: Optional[jax.Array],
    *,
    attn_impl: str = "auto",
    scale: Optional[float] = None,
    alibi_slopes: Optional[jax.Array] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Append new K/V into the carried cache arena at each sequence's
    ``start_pos`` (quantizing when the arena is FP8) and attend over the
    masked cache — the shared decode-step cache machinery every model family
    uses (the reference's ``InferenceParams`` update + ``
    flash_attn_with_kvcache`` pair, ``flash_attn/utils/generation.py:158-163``
    + ``modules/mha.py:502-541``).

    ``cache_kv``: ``(k_cache, v_cache, k_scale, v_scale[, layer_idx])`` —
    per-layer arenas ``[B, S, Hk, Dh]`` when ``layer_idx`` is absent/None, or
    full ``[L, B, S, Hk, Dh]`` arenas carried through the layer scan.
    Returns ``(attn [B, S, Hq, Dh], (k_cache, v_cache))``.
    """
    k_cache, v_cache, k_scale, v_scale = cache_kv[:4]
    layer_idx = cache_kv[4] if len(cache_kv) > 4 else None
    if k_cache.dtype != kk.dtype:
        # Clip into the storage range before the cast: f32→e4m3fn conversion
        # of an overflowing value yields NaN (e4m3fn has no inf encoding),
        # and one NaN in the cache poisons every later step of the sequence.
        # int8 storage additionally needs round-to-nearest (astype truncates).
        integer = jnp.issubdtype(k_cache.dtype, jnp.integer)
        fmax = (float(jnp.iinfo(k_cache.dtype).max) if integer
                else float(jnp.finfo(k_cache.dtype).max))

        def _q(t, scale, dtype):
            q = jnp.clip(t.astype(jnp.float32) / scale, -fmax, fmax)
            return (jnp.round(q) if integer else q).astype(dtype)

        k_store = _q(kk, k_scale, k_cache.dtype)
        v_store = _q(vv, v_scale, v_cache.dtype)
    else:
        k_store, v_store = kk, vv
    # Hinted scatter append (unique + sorted indices). The hints are
    # load-bearing: a vmapped dynamic_update_slice (or an unhinted
    # .at[].set) lowers to a serialized per-row scatter — measured 20
    # ms/step (78% of the whole step) on the MLA latent arena at
    # 1B/batch 28 on v5e; with the hints the write hits the
    # static-position floor (25.4 -> 5.9 ms/step).
    B, S = k_store.shape[:2]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    pos = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)
    if layer_idx is None:
        # Per-layer arenas [B, S, Hk, Dh] (cache flows through scan xs/ys).
        k_cache = k_cache.at[bidx, pos].set(
            k_store, unique_indices=True, indices_are_sorted=True)
        v_cache = v_cache.at[bidx, pos].set(
            v_store, unique_indices=True, indices_are_sorted=True)
        k_layer, v_layer = k_cache, v_cache
    else:
        # Full arena [L, B, S, Hk, Dh] carried through the scan: in-place
        # dynamic updates on the carry — no per-layer arena copies (the
        # xs→ys form rewrites the whole cache every step; profiled as
        # ~10% of decode time on v5e).
        k_cache = k_cache.at[layer_idx, bidx, pos].set(
            k_store, unique_indices=True, indices_are_sorted=True)
        v_cache = v_cache.at[layer_idx, bidx, pos].set(
            v_store, unique_indices=True, indices_are_sorted=True)
        k_layer = jax.lax.dynamic_index_in_dim(
            k_cache, layer_idx, 0, keepdims=False
        )
        v_layer = jax.lax.dynamic_index_in_dim(
            v_cache, layer_idx, 0, keepdims=False
        )
    # …then attend over the whole (masked) cache.
    k_all = k_layer.astype(q.dtype)
    v_all = v_layer.astype(q.dtype)
    if k_layer.dtype != kk.dtype:
        k_all = k_all * k_scale.astype(q.dtype)
        v_all = v_all * v_scale.astype(q.dtype)
    attn = attention(
        q, k_all, v_all, causal=True, q_offset=start_pos,
        kv_lens=kv_lens, impl=attn_impl, scale=scale,
        alibi_slopes=alibi_slopes, window=window, softcap=softcap,
    )
    return attn, (k_cache, v_cache)


def _layer_body(
    x: jax.Array,
    lp: Dict[str, Any],
    cos: jax.Array,
    sin: jax.Array,
    cfg: ModelConfig,
    cache_kv: Optional[Tuple[jax.Array, jax.Array, jax.Array, jax.Array]],
    start_pos: jax.Array,
    kv_lens: Optional[jax.Array],
    attn_impl: str,
    dots=None,
    dropout_p: float = 0.0,
    dropout_seed=0,
    cp_axis=None,
    cp_mesh=None,
):
    """One decoder layer. Returns (x_out, (new_k, new_v), amaxes).

    ``cache_kv``: (k_cache [B,S,Hk,Dh], v_cache, k_scale, v_scale) for this
    layer, or None for cache-less training/eval forward.
    ``dots``: per-site dot closures for the FP8 training path (see
    ``_make_train_dots``); None = plain/prequantized dots, no amaxes.
    """
    B, S, D = x.shape
    Hq, Hk, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if dots is None:
        dots = {s: (lambda x, w: (_dot(x, w), None)) for s in DOT_SITES}
    amaxes = {}

    # --- attention block ---
    h = rmsnorm(x, lp["norm_attn"], cfg.rms_eps)
    qkv, amaxes["attn_qkv"] = dots["attn_qkv"](h, lp["wqkv"])
    if "bqkv" in lp:
        qkv = qkv + lp["bqkv"].astype(qkv.dtype)
    q, kk, vv = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1)
    q = q.reshape(B, S, Hq, Dh)
    kk = kk.reshape(B, S, Hk, Dh)
    vv = vv.reshape(B, S, Hk, Dh)
    if "q_norm" in lp:
        # Qwen3 per-head QK-norm (before RoPE, matching HF Qwen3Attention).
        q = rmsnorm(q, lp["q_norm"], cfg.rms_eps)
        kk = rmsnorm(kk, lp["k_norm"], cfg.rms_eps)
    if cfg.alibi:
        # Baichuan-13B: ALiBi positional bias instead of RoPE
        # (baichuan.py:141-144 sets rotary_emb_fraction=0, use_alibi=True).
        from llm_fp8_tpu.ops.attention import default_alibi_slopes

        slopes = default_alibi_slopes(Hq)
    else:
        slopes = None
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)

    if cache_kv is None:
        attn = attention(
            q, kk, vv, causal=True, kv_lens=kv_lens, impl=attn_impl,
            alibi_slopes=slopes, window=cfg.sliding_window,
            dropout_p=dropout_p, dropout_seed=dropout_seed,
            cp_axis=cp_axis, cp_mesh=cp_mesh,
        )
        new_kv = (kk, vv)
    else:
        # Append new K/V at each sequence's own start_pos (continuous
        # batching: per-slot positions), quantizing if the cache is FP8,
        # then attend over the whole (masked) cache — shared machinery,
        # see cache_append_attend above.
        attn, new_kv = cache_append_attend(
            q, kk, vv, cache_kv, start_pos, kv_lens,
            attn_impl=attn_impl, alibi_slopes=slopes,
            window=cfg.sliding_window,
        )

    # Tag for the 'dots' remat policy: the flash kernel's output is not a
    # "dot", so the policy saves it by name (free when remat is off).
    attn = checkpoint_name(attn, "attn_out")
    attn = attn.reshape(B, S, Hq * Dh)
    o, amaxes["attn_out"] = dots["attn_out"](attn, lp["wo"])
    x = x + o

    # --- MLP block (SwiGLU, fused gate|up like TE's fc1) ---
    h = rmsnorm(x, lp["norm_mlp"], cfg.rms_eps)
    gate_up, amaxes["mlp_gate_up"] = dots["mlp_gate_up"](h, lp["w_gate_up"])
    gate, up = jnp.split(gate_up, 2, axis=-1)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    down, amaxes["mlp_down"] = dots["mlp_down"](h, lp["w_down"])
    x = x + down
    return x, new_kv, amaxes


def forward(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: ModelConfig,
    *,
    cache: Optional[KVCache] = None,
    start_pos: jax.Array | int = 0,
    kv_lens: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    unroll: int = 1,
    compute_dtype=jnp.bfloat16,
    return_kv: bool = False,
    remat: bool = False,
    dropout_p: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    cp_axis: Optional[str] = None,
    cp_mesh=None,
    return_hidden: bool = False,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Forward pass: ``tokens [B, S] -> (logits [B, S, V], updated cache)``.

    ``return_hidden``: skip the lm_head and return the final-norm output
    ``[B, S, D]`` instead of logits — the chunked-cross-entropy training
    path projects to vocab chunk-by-chunk itself
    (:func:`llm_fp8_tpu.training.losses.chunked_causal_lm_loss`).

    ``cp_axis``/``cp_mesh``: shard the sequence over a mesh axis and run
    ring attention (context parallelism) — training/eval path only.

    Three usages:
      * training/eval: ``cache=None`` — full causal self-attention.
      * prefill: pass a fresh ``cache``; K/V written at ``start_pos``.
      * decode: ``S == 1`` with ``start_pos = cache.lens`` semantics
        (``kv_lens`` masks the unwritten tail of the arena).

    ``return_kv`` (cache=None only): additionally return the per-layer
    K/V ``([L, B, S, Hk, Dh], [L, B, S, Hk, Dh])`` — the paged engine's
    prefill uses this to scatter into its page pool.
    """
    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    B, S = tokens.shape

    # start_pos: scalar, or [B] per-sequence (continuous-batching decode).
    start_pos = jnp.broadcast_to(jnp.asarray(start_pos, jnp.int32), (B,))
    positions = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)  # [B, S, Dh/2]

    lp_stack = params["layers"]

    if cache is None:
        # Per-layer seed offset: without it every layer would drop the same
        # (b, h, i, j) attention entries (attention dropout,
        # flash_attn_func dropout_p — vary dropout_seed per train step).
        seed0 = jnp.asarray(dropout_seed, jnp.int32)
        L = jax.tree_util.tree_leaves(lp_stack)[0].shape[0]

        def body(x, lp_l):
            lp, li = lp_l
            x, kv, _ = _layer_body(
                x, lp, cos, sin, cfg, None, start_pos, kv_lens, attn_impl,
                dropout_p=dropout_p, dropout_seed=seed0 + li * 7919,
                cp_axis=cp_axis, cp_mesh=cp_mesh,
            )
            return x, (kv if return_kv else None)

        policy = _remat_policy(remat)
        if policy is not None:
            body = jax.checkpoint(body, policy=policy)
        x, kv_out = jax.lax.scan(
            body, x, (lp_stack, jnp.arange(L, dtype=jnp.int32)),
            unroll=unroll,
        )
        new_cache = kv_out if return_kv else None
    else:

        # The cache rides the scan *carry* (full [L, ...] arenas) so updates
        # are in-place dynamic slices, not per-layer xs→ys copies.
        def body(carry, lp_l):
            x, ck, cv = carry
            lp, (k_s, v_s, l) = lp_l
            x, (ck, cv), _ = _layer_body(
                x, lp, cos, sin, cfg, (ck, cv, k_s, v_s, l), start_pos,
                kv_lens, attn_impl,
            )
            return (x, ck, cv), None

        L = cache.k.shape[0]
        xs = (lp_stack, (cache.k_scale, cache.v_scale,
                         jnp.arange(L, dtype=jnp.int32)))
        (x, new_k, new_v), _ = jax.lax.scan(
            body, (x, cache.k, cache.v), xs, unroll=unroll
        )
        new_cache = KVCache(
            k=new_k, v=new_v,
            lens=jnp.maximum(cache.lens, start_pos + S),
            k_scale=cache.k_scale, v_scale=cache.v_scale,
        )

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    if return_hidden:
        return x, new_cache
    logits = _lm_head(params, x, cfg)
    return logits, new_cache


def lm_head_weight(params, cfg) -> jax.Array:
    """The ``[D, V]`` lm_head matrix as a plain array (tied → ``embed.T``).

    For the chunked-CE training path, which fuses the vocab projection into
    the loss. Raises on quantized (serving-layout) params — training params
    are raw.
    """
    if cfg.tie_word_embeddings or "lm_head" not in params:
        w = params["embed"]
        if isinstance(w, QTensor):
            raise TypeError("chunked CE needs unquantized embed weights")
        return w.T
    lm = params["lm_head"]
    if isinstance(lm, QTensor):
        raise TypeError("chunked CE needs an unquantized lm_head")
    return lm


def _lm_head(params, x, cfg):
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.dot(
            x, params["embed"].T.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        lm = params["lm_head"]
        logits = (
            qdot(x, lm, out_dtype=jnp.float32)
            if isinstance(lm, QTensor)
            else jnp.dot(x, lm.astype(x.dtype), preferred_element_type=jnp.float32)
        )
    return logits.astype(jnp.float32)


def forward_paged(
    params: Dict[str, Any],
    tokens: jax.Array,  # [B, 1] — one decode token per slot
    cfg: ModelConfig,
    k_pages: jax.Array,  # [P, L, Hk, Dh, page]
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] int32
    lens: jax.Array,  # [B] tokens already in cache (new token goes at lens)
    *,
    kv_scale: float = 1.0,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-token decode over the paged KV pool.

    Appends each slot's new K/V into its current page (quantizing when the
    pool is fp8) and attends via the paged flash kernel. The pools ride the
    scan carry, so appends are in-place dynamic updates.

    Returns ``(logits [B, 1, V], k_pages, v_pages)``.
    """
    from llm_fp8_tpu.kernels.paged_attention import paged_attention

    B, S = tokens.shape
    assert S == 1, "forward_paged is the decode step"
    P, L, Hk, Dh, page_size = k_pages.shape
    Hq = cfg.num_heads

    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    if cfg.alibi:
        # Baichuan-13B: ALiBi bias inside the paged kernel, no RoPE.
        from llm_fp8_tpu.ops.attention import alibi_slopes_list

        slopes, cos, sin = tuple(alibi_slopes_list(Hq)), None, None
    else:
        slopes = None
        positions = lens[:, None]
        inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta,
                                    cfg.rope_scaling)
        cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)

    def body(carry, lp_l):
        x, kp, vp = carry
        lp, l = lp_l
        h = rmsnorm(x, lp["norm_attn"], cfg.rms_eps)
        qkv = _dot(h, lp["wqkv"])
        if "bqkv" in lp:
            qkv = qkv + lp["bqkv"].astype(qkv.dtype)
        q, kk, vv = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1)
        q = q.reshape(B, 1, Hq, Dh)
        kk = kk.reshape(B, 1, Hk, Dh)
        if "q_norm" in lp:
            q = rmsnorm(q, lp["q_norm"], cfg.rms_eps)
            kk = rmsnorm(kk, lp["k_norm"], cfg.rms_eps)
        if not cfg.alibi:
            q = apply_rope(q, cos, sin)
            kk = apply_rope(kk, cos, sin)
        vv = vv.reshape(B, 1, Hk, Dh)

        # Quantize + append happen INSIDE the kernel (one aligned 128-lane
        # tile RMW on the sequence's current page): the XLA scatter/DUS
        # with a dynamic lane-dim offset copies the whole multi-GB pool
        # per layer per step — measured ~100 ms/decode-step at 8k/B8, the
        # entire long-context decode budget (r5; same fix as the arena
        # kernel's in-kernel append, r2).
        attn, kp, vp = paged_attention(
            q[:, 0], kp, vp, lens + 1, page_tables, l, kv_scale=kv_scale,
            alibi_slopes=slopes, window=cfg.sliding_window,
            new_k=kk[:, 0], new_v=vv[:, 0],
        )
        x = x + _dot(attn.reshape(B, 1, Hq * Dh), lp["wo"])

        h = rmsnorm(x, lp["norm_mlp"], cfg.rms_eps)
        gate_up = _dot(h, lp["w_gate_up"])
        gate, up = jnp.split(gate_up, 2, axis=-1)
        h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        x = x + _dot(h, lp["w_down"])
        return (x, kp, vp), None

    xs = (params["layers"], jnp.arange(L, dtype=jnp.int32))
    (x, k_pages, v_pages), _ = jax.lax.scan(body, (x, k_pages, v_pages), xs)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return _lm_head(params, x, cfg), k_pages, v_pages


def forward_decode_arena(
    params: Dict[str, Any],
    tokens: jax.Array,  # [B, 1] — one decode token per slot
    cfg: ModelConfig,
    k_arena: jax.Array,  # [L, B, Hk, Dh, S] lane-major fp8 (or bf16) arena
    v_arena: jax.Array,
    lens: jax.Array,  # [B] tokens already in cache (new token goes at lens)
    *,
    kv_scale=1.0,  # float, or (k_scales [Hk], v_scales [Hk]) per-head arrays
    window: int | None = None,
    softcap: float | None = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-token decode over the *transposed* KV arena via the fused
    fp8 decode kernel.

    This is the optimized fp8-KV serving path: the arena is stored
    lane-major ``[L, B, Hk, Dh, S]`` and the Pallas kernel
    (:func:`llm_fp8_tpu.kernels.decode_attention.decode_attention_arena`)
    dequantizes K/V per-chunk in VMEM — the whole-arena XLA dequant that
    collapsed fp8-KV to 0.37x in round 1 never happens. Quantize + append of
    the single new token also happen *inside* the kernel (one aligned
    128-lane tile RMW per sequence — the XLA scatter into the lane-major
    arena measured ~4 ms/step at B=32); only rotary stays in XLA.
    Matches ``flash_attn_with_kvcache`` semantics
    (``flash_attn/modules/mha.py:502-541``).

    Returns ``(logits [B, 1, V], k_arena, v_arena)``.
    """
    from llm_fp8_tpu.kernels.decode_attention import decode_attention_arena

    B, S_tok = tokens.shape
    assert S_tok == 1, "forward_decode_arena is the decode step"
    L, _, Hk, Dh, S = k_arena.shape
    Hq = cfg.num_heads

    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    if cfg.alibi:
        # Baichuan-13B: ALiBi bias inside the arena kernel, no RoPE.
        from llm_fp8_tpu.ops.attention import alibi_slopes_list

        slopes, cos, sin = tuple(alibi_slopes_list(Hq)), None, None
    else:
        slopes = None
        positions = lens[:, None]
        inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta,
                                    cfg.rope_scaling)
        cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)

    k_sc, v_sc = (kv_scale if isinstance(kv_scale, tuple)
                  else (kv_scale, kv_scale))

    def body(carry, lp_l):
        x, ka, va = carry
        lp, l = lp_l
        h = rmsnorm(x, lp["norm_attn"], cfg.rms_eps)
        qkv = _dot(h, lp["wqkv"])
        if "bqkv" in lp:
            qkv = qkv + lp["bqkv"].astype(qkv.dtype)
        q, kk, vv = jnp.split(qkv, [cfg.q_dim, cfg.q_dim + cfg.kv_dim], axis=-1)
        q = q.reshape(B, 1, Hq, Dh)
        kk = kk.reshape(B, 1, Hk, Dh)
        if "q_norm" in lp:
            q = rmsnorm(q, lp["q_norm"], cfg.rms_eps)
            kk = rmsnorm(kk, lp["k_norm"], cfg.rms_eps)
        vv = vv.reshape(B, 1, Hk, Dh)

        # Rotary fused into the arena kernel (flash_attn_with_kvcache's
        # in-kernel rotary, flash_attn_interface.py:1464+): q and the new K
        # rotate in VMEM next to the quantize+append — no pre-rotated
        # round-trip of the new token through HBM.
        attn, ka, va = decode_attention_arena(
            q[:, 0], ka, va, lens + 1, l,
            new_k=kk[:, 0], new_v=vv[:, 0],
            rope_cos_sin=(None if cfg.alibi else (cos[:, 0], sin[:, 0])),
            k_scale=k_sc, v_scale=v_sc,
            window=window, softcap=softcap, alibi_slopes=slopes,
        )
        x = x + _dot(attn.reshape(B, 1, Hq * Dh), lp["wo"])

        h = rmsnorm(x, lp["norm_mlp"], cfg.rms_eps)
        gate_up = _dot(h, lp["w_gate_up"])
        gate, up = jnp.split(gate_up, 2, axis=-1)
        h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
        x = x + _dot(h, lp["w_down"])
        return (x, ka, va), None

    xs = (params["layers"], jnp.arange(L, dtype=jnp.int32))
    (x, k_arena, v_arena), _ = jax.lax.scan(body, (x, k_arena, v_arena), xs)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return _lm_head(params, x, cfg), k_arena, v_arena


def forward_fp8_train(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg: ModelConfig,
    recipes: RecipeSet,
    scales: Dict[str, Tuple[jax.Array, jax.Array]],
    sinks: Dict[str, jax.Array],
    *,
    attn_impl: str = "auto",
    unroll: int = 1,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    cp_axis: Optional[str] = None,
    cp_mesh=None,
    return_hidden: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """FP8 training forward: quantize-both-operands GEMMs with delayed scales.

    Functional equivalent of running the reference's decoder under its two
    ``fp8_autocast`` scopes (``te_llama.py:76-81``): each of the four GEMM
    sites per layer runs through :func:`llm_fp8_tpu.quant.fp8_dot` with the
    recipe the set assigns to its role.

    ``scales[site]`` = (x_scale [L], w_scale [L]) delayed scalars per layer;
    ``sinks[site]`` = zeros [L] — differentiate the loss w.r.t. these to
    receive the backward-pass amaxes (see quant.dot module docs).

    Returns ``(logits [B,S,V] f32, amaxes {site: DotAmaxes stacked [L]})``.
    """
    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    B, S = tokens.shape
    positions = jnp.arange(S, dtype=jnp.int32)[None, :]
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)
    zero = jnp.asarray(0, jnp.int32)

    def body(x, per_layer):
        lp, layer_scales, layer_sinks = per_layer
        dots = _make_train_dots(recipes, layer_scales, layer_sinks)
        x, _, amaxes = _layer_body(
            x, lp, cos, sin, cfg, None, zero, None, attn_impl, dots=dots,
            cp_axis=cp_axis, cp_mesh=cp_mesh,
        )
        return x, amaxes

    policy = _remat_policy(remat)
    if policy is not None:
        # Per-layer rematerialization: trade recompute for activation memory
        # (the reference's gradient-checkpointing knob,
        # train_multi_gpu.py:421-430 — here a jax.checkpoint policy on the
        # scan body; FP8 residuals are already saved quantized).
        body = jax.checkpoint(body, policy=policy)

    xs = (params["layers"], scales, sinks)
    x, amaxes = jax.lax.scan(body, x, xs, unroll=unroll)

    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    if return_hidden:
        return x, amaxes
    return _lm_head(params, x, cfg), amaxes
