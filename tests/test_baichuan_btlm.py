"""Baichuan and BTLM zoo entries.

Neither architecture has a native transformers class (both are
trust_remote_code models), so — unlike the other zoo families — parity is
checked against transparent hand-rolled jnp references written out in this
file, plus structural checks on the W_pack remap (reference remaps:
``flash_attn/models/baichuan.py:97-144``, ``flash_attn/models/btlm.py``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models.config import get_config
from llm_fp8_tpu.models.gpt2 import (
    GPT2_REGISTRY, gpt2_forward, init_gpt2_params, pack_btlm_state_dict,
)
from llm_fp8_tpu.models.hf_loader import (
    export_hf_state_dict, pack_hf_state_dict,
)
from llm_fp8_tpu.models.llama import forward, init_kv_cache, init_params
from llm_fp8_tpu.ops.attention import attention_ref, default_alibi_slopes


CFG = get_config("debug-baichuan")


def _hf_baichuan_sd(key):
    """Random HF-layout Baichuan state dict (W_pack fused QKV)."""
    ks = jax.random.split(key, 32)
    it = iter(ks)
    D, I, V = CFG.hidden_size, CFG.intermediate_size, CFG.vocab_size
    sd = {
        "model.embed_tokens.weight": jax.random.normal(next(it), (V, D)) * 0.02,
        "model.norm.weight": jnp.ones((D,)) + 0.1 * jax.random.normal(next(it), (D,)),
        "lm_head.weight": jax.random.normal(next(it), (V, D)) * 0.02,
    }
    for i in range(CFG.num_layers):
        p = f"model.layers.{i}."
        sd[p + "self_attn.W_pack.weight"] = (
            jax.random.normal(next(it), (3 * D, D)) * 0.05
        )
        sd[p + "self_attn.o_proj.weight"] = (
            jax.random.normal(next(it), (D, D)) * 0.05
        )
        sd[p + "mlp.gate_proj.weight"] = jax.random.normal(next(it), (I, D)) * 0.05
        sd[p + "mlp.up_proj.weight"] = jax.random.normal(next(it), (I, D)) * 0.05
        sd[p + "mlp.down_proj.weight"] = jax.random.normal(next(it), (D, I)) * 0.05
        sd[p + "input_layernorm.weight"] = jnp.ones((D,))
        sd[p + "post_attention_layernorm.weight"] = jnp.ones((D,))
    return sd


def _baichuan_ref(sd, tokens):
    """Transparent Baichuan forward: RMSNorm → W_pack attn (ALiBi, no rope)
    → SwiGLU MLP, all plain jnp with attention_ref."""
    D, Dh, H = CFG.hidden_size, CFG.head_dim, CFG.num_heads
    B, S = tokens.shape
    slopes = default_alibi_slopes(H)

    def rms(x, w):
        var = jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True)
        return (x * jax.lax.rsqrt(var + CFG.rms_eps) * w).astype(x.dtype)

    x = jnp.take(sd["model.embed_tokens.weight"], tokens, axis=0)
    for i in range(CFG.num_layers):
        p = f"model.layers.{i}."
        h = rms(x, sd[p + "input_layernorm.weight"])
        qkv = h @ sd[p + "self_attn.W_pack.weight"].T
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = attention_ref(
            q.reshape(B, S, H, Dh), k.reshape(B, S, H, Dh),
            v.reshape(B, S, H, Dh), causal=True, alibi_slopes=slopes,
        )
        x = x + a.reshape(B, S, D) @ sd[p + "self_attn.o_proj.weight"].T
        h = rms(x, sd[p + "post_attention_layernorm.weight"])
        gate = h @ sd[p + "mlp.gate_proj.weight"].T
        up = h @ sd[p + "mlp.up_proj.weight"].T
        x = x + (jax.nn.silu(gate) * up) @ sd[p + "mlp.down_proj.weight"].T
    x = rms(x, sd["model.norm.weight"])
    return x @ sd["lm_head.weight"].T


def test_baichuan_wpack_parity():
    sd = _hf_baichuan_sd(jax.random.PRNGKey(0))
    params = pack_hf_state_dict(sd, CFG, dtype=jnp.float32)
    tokens = jnp.arange(24, dtype=jnp.int32).reshape(2, 12) % CFG.vocab_size
    got, _ = forward(params, tokens, CFG, attn_impl="ref",
                     compute_dtype=jnp.float32)
    want = _baichuan_ref(sd, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_baichuan_wpack_export_roundtrip():
    sd = _hf_baichuan_sd(jax.random.PRNGKey(1))
    params = pack_hf_state_dict(sd, CFG, dtype=jnp.float32)
    back = export_hf_state_dict(params, CFG)
    np.testing.assert_allclose(
        back["model.layers.0.self_attn.W_pack.weight"],
        np.asarray(sd["model.layers.0.self_attn.W_pack.weight"]),
        rtol=1e-6, atol=1e-6,
    )
    reparams = pack_hf_state_dict(
        {k: jnp.asarray(v) for k, v in back.items()}, CFG, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(reparams["layers"]["wqkv"]),
        np.asarray(params["layers"]["wqkv"]), rtol=1e-6, atol=1e-6,
    )


def test_baichuan_alibi_cache_decode_parity():
    """ALiBi bias depends on absolute positions — incremental decode with a
    KV cache must reproduce the one-shot forward's tokens."""
    params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    B, S = 2, 10
    tokens = (
        jax.random.randint(jax.random.PRNGKey(3), (B, S), 0, CFG.vocab_size)
    ).astype(jnp.int32)
    full, _ = forward(params, tokens, CFG, attn_impl="ref",
                      compute_dtype=jnp.float32)

    cache = init_kv_cache(CFG, B, 32, dtype=jnp.float32)
    pre = 6
    logits, cache = forward(
        params, tokens[:, :pre], CFG, cache=cache, start_pos=0,
        kv_lens=jnp.full((B,), pre, jnp.int32), attn_impl="ref",
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, :pre]), rtol=2e-3, atol=2e-3
    )
    for t in range(pre, S):
        step, cache = forward(
            params, tokens[:, t : t + 1], CFG, cache=cache,
            start_pos=jnp.full((B,), t, jnp.int32),
            kv_lens=jnp.full((B,), t + 1, jnp.int32), attn_impl="ref",
            compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, t]),
            rtol=2e-3, atol=2e-3,
        )


BTLM = GPT2_REGISTRY["debug-btlm"]


def _hf_btlm_sd(key):
    """Random HF-layout BTLM state dict (Conv1D [in, out] weights)."""
    ks = iter(jax.random.split(key, 40))
    D, I, V = BTLM.hidden_size, BTLM.intermediate_size, BTLM.vocab_size
    sd = {
        "transformer.wte.weight": jax.random.normal(next(ks), (V, D)) * 0.02,
        "transformer.ln_f.weight": jnp.ones((D,)),
        "transformer.ln_f.bias": jnp.zeros((D,)),
    }
    for i in range(BTLM.num_layers):
        p = f"transformer.h.{i}."
        sd[p + "ln_1.weight"] = jnp.ones((D,))
        sd[p + "ln_1.bias"] = jnp.zeros((D,))
        sd[p + "ln_2.weight"] = jnp.ones((D,))
        sd[p + "ln_2.bias"] = jnp.zeros((D,))
        sd[p + "attn.c_attn.weight"] = jax.random.normal(next(ks), (D, 3 * D)) * 0.05
        sd[p + "attn.c_attn.bias"] = jax.random.normal(next(ks), (3 * D,)) * 0.01
        sd[p + "attn.c_proj.weight"] = jax.random.normal(next(ks), (D, D)) * 0.05
        sd[p + "attn.c_proj.bias"] = jnp.zeros((D,))
        sd[p + "mlp.c_fc.weight"] = jax.random.normal(next(ks), (D, I)) * 0.05
        sd[p + "mlp.c_fc.bias"] = jnp.zeros((I,))
        sd[p + "mlp.c_fc2.weight"] = jax.random.normal(next(ks), (D, I)) * 0.05
        sd[p + "mlp.c_fc2.bias"] = jnp.zeros((I,))
        sd[p + "mlp.c_proj.weight"] = jax.random.normal(next(ks), (I, D)) * 0.05
        sd[p + "mlp.c_proj.bias"] = jnp.zeros((D,))
    return sd


def _btlm_ref(sd, tokens):
    """Transparent BTLM forward: muP embed scale, LN, fused c_attn with
    1/d-scaled ALiBi attention, SwiGLU (c_fc gate · c_fc2 up), muP logits
    scale — the semantics the reference maps onto its GPT model
    (``btlm.py:81-100``, ``gpt.py:65,431,596-598``)."""
    D, Dh, H = BTLM.hidden_size, BTLM.head_dim, BTLM.num_heads
    B, S = tokens.shape
    slopes = default_alibi_slopes(H)

    def ln(x, w, b):
        m = jnp.mean(x, -1, keepdims=True)
        v = jnp.var(x, -1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + BTLM.ln_eps) * w + b

    x = jnp.take(sd["transformer.wte.weight"], tokens, axis=0)
    x = x * BTLM.mup_embeddings_multiplier
    for i in range(BTLM.num_layers):
        p = f"transformer.h.{i}."
        h = ln(x, sd[p + "ln_1.weight"], sd[p + "ln_1.bias"])
        qkv = h @ sd[p + "attn.c_attn.weight"] + sd[p + "attn.c_attn.bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = attention_ref(
            q.reshape(B, S, H, Dh), k.reshape(B, S, H, Dh),
            v.reshape(B, S, H, Dh), causal=True, alibi_slopes=slopes,
            scale=1.0 / Dh,
        )
        x = x + a.reshape(B, S, D) @ sd[p + "attn.c_proj.weight"] + sd[
            p + "attn.c_proj.bias"
        ]
        h = ln(x, sd[p + "ln_2.weight"], sd[p + "ln_2.bias"])
        gate = h @ sd[p + "mlp.c_fc.weight"] + sd[p + "mlp.c_fc.bias"]
        up = h @ sd[p + "mlp.c_fc2.weight"] + sd[p + "mlp.c_fc2.bias"]
        x = x + (jax.nn.silu(gate) * up) @ sd[p + "mlp.c_proj.weight"] + sd[
            p + "mlp.c_proj.bias"
        ]
    x = ln(x, sd["transformer.ln_f.weight"], sd["transformer.ln_f.bias"])
    logits = x @ sd["transformer.wte.weight"].T
    return logits * (BTLM.mup_output_multiplier * BTLM.mup_width_scale)


def test_btlm_parity():
    sd = _hf_btlm_sd(jax.random.PRNGKey(5))
    params = pack_btlm_state_dict(sd, BTLM)
    tokens = jnp.arange(24, dtype=jnp.int32).reshape(2, 12) % BTLM.vocab_size
    got = gpt2_forward(params, tokens, BTLM, attn_impl="ref")
    want = _btlm_ref(sd, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_btlm_random_init_runs():
    params = init_gpt2_params(BTLM, jax.random.PRNGKey(6))
    # ALiBi config carries only a placeholder position row.
    assert params["wpe"].shape[0] == 1
    logits = gpt2_forward(params, jnp.ones((1, 8), jnp.int32), BTLM,
                          attn_impl="ref")
    assert logits.shape == (1, 8, BTLM.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_registry_shapes():
    assert get_config("baichuan-13b").alibi
    assert not get_config("baichuan-7b").alibi
    assert get_config("baichuan-7b").fused_wpack
    assert GPT2_REGISTRY["btlm-3b"].intermediate_size == 6826
