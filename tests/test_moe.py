"""Mixtral-family MoE tests: HF parity, dispatch semantics, quantization,
KV-cache decode, EP sharding.

Reference idiom (SURVEY.md §4): model families diff against the upstream HF
implementation on identical weights. The MoE family is beyond-reference
(the reference has no MoE/EP) but is held to the same testing bar.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.moe import (
    MOE_REGISTRY,
    MoEConfig,
    init_moe_params,
    moe_forward,
    pack_mixtral_state_dict,
    quantize_moe_params,
    load_balance_loss,
)

CFG = MOE_REGISTRY["debug-mixtral"]
# Lossless routing for parity tests (HF never drops tokens).
CFG_FULL = __import__("dataclasses").replace(CFG, capacity_factor=-1.0)


def hf_mixtral_and_state(cfg: MoEConfig, seed=0):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(seed)
    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        num_local_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_dropout=0.0,
        sliding_window=None,
    )
    model = MixtralForCausalLM(hf_cfg)
    model.eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    return model, sd


def hf_logits(model, tokens: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        out = model(torch.from_numpy(tokens))
    return out.logits.float().numpy()


class TestHFParity:
    def test_mixtral_logits_fp32(self):
        model, sd = hf_mixtral_and_state(CFG_FULL)
        params = pack_mixtral_state_dict(sd, CFG_FULL, dtype=jnp.float32)
        tokens = (np.arange(24, dtype=np.int32).reshape(2, 12) * 7
                  ) % CFG_FULL.vocab_size
        want = hf_logits(model, tokens)
        got, _ = moe_forward(params, jnp.asarray(tokens), CFG_FULL,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    def test_default_capacity_matches_hf_when_balanced(self):
        # capacity_factor=2.0 (the production default) must agree with HF
        # whenever no expert overflows; random-init routers are near-uniform,
        # so a short batch stays under capacity.
        model, sd = hf_mixtral_and_state(CFG, seed=3)
        params = pack_mixtral_state_dict(sd, CFG, dtype=jnp.float32)
        tokens = (np.arange(16, dtype=np.int32).reshape(2, 8) * 5
                  ) % CFG.vocab_size
        want = hf_logits(model, tokens)
        got, _ = moe_forward(params, jnp.asarray(tokens), CFG,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


class TestDispatchSemantics:
    def test_capacity_drop_zeroes_overflow(self):
        # Force every token onto expert 0 with capacity C=2: the first two
        # tokens (token-order priority) get the expert's output, the
        # overflow tokens get a zero MLP delta — GShard drop semantics.
        from llm_fp8_tpu.models.moe import _moe_mlp

        cfg = __import__("dataclasses").replace(
            CFG, capacity_factor=0.5, num_experts=2, num_experts_per_tok=1
        )  # T=8, K=1, E=2 → per=4, C=int(4·0.5)=2
        T, D = 8, cfg.hidden_size
        h = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (T, D),
                                      jnp.float32)) + 0.1
        w_router = jnp.zeros((D, 2), jnp.float32).at[0, 0].set(100.0)
        params = init_moe_params(cfg, jax.random.PRNGKey(1),
                                 dtype=jnp.float32)
        lp = params["layers"]
        y, _ = _moe_mlp(h, w_router, lp["w_gate_up"][0], lp["w_down"][0],
                        cfg)
        # h[:,0] > 0 everywhere → all tokens pick expert 0.
        wg, wd = lp["w_gate_up"][0, 0], lp["w_down"][0, 0]
        gate, up = jnp.split(h @ wg, 2, axis=-1)
        want = (jax.nn.silu(gate) * up) @ wd
        np.testing.assert_allclose(np.asarray(y[:2]), np.asarray(want[:2]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y[2:]), 0.0, atol=0)

    def test_single_expert_reduces_to_dense_mlp(self):
        # k = E = 1: the routed block must equal a plain SwiGLU MLP exactly
        # (routing weight renormalizes to 1.0; dispatch keeps every token).
        from llm_fp8_tpu.models.moe import _moe_mlp

        cfg = __import__("dataclasses").replace(
            CFG_FULL, num_experts=1, num_experts_per_tok=1
        )
        key = jax.random.PRNGKey(1)
        h = jax.random.normal(key, (16, cfg.hidden_size), jnp.float32)
        params = init_moe_params(cfg, key, dtype=jnp.float32)
        lp = params["layers"]
        y, _ = _moe_mlp(h, lp["w_router"][0], lp["w_gate_up"][0],
                        lp["w_down"][0], cfg)

        wg, wd = lp["w_gate_up"][0, 0], lp["w_down"][0, 0]
        gate, up = jnp.split(h @ wg, 2, axis=-1)
        want = (jax.nn.silu(gate) * up) @ wd
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_load_balance_loss_uniform_is_one(self):
        # Perfectly uniform routing gives aux = E * E * (1/E * 1/E) = 1.
        T, E, K = 64, 4, 1
        probs = jnp.full((T, E), 1.0 / E)
        topi = (jnp.arange(T) % E).reshape(T, 1)
        aux = load_balance_loss(probs, topi, E)
        np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)

    def test_aux_returned_and_finite(self):
        params = init_moe_params(CFG_FULL, jax.random.PRNGKey(2),
                                 dtype=jnp.float32)
        tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6)
        logits, _, aux = moe_forward(
            params, tokens, CFG_FULL, compute_dtype=jnp.float32,
            attn_impl="ref", return_router_aux=True,
        )
        assert aux.shape == ()
        assert float(aux) >= 1.0 - 1e-6  # E·Σf·P is minimized at 1 (uniform)


class TestDecode:
    def test_kv_cache_decode_matches_full_forward(self):
        from llm_fp8_tpu.models import init_kv_cache

        params = init_moe_params(CFG_FULL, jax.random.PRNGKey(4),
                                 dtype=jnp.float32)
        B, S = 2, 10
        tokens = jnp.asarray(
            (np.arange(B * S).reshape(B, S) * 3) % CFG_FULL.vocab_size,
            jnp.int32,
        )
        full_logits, _ = moe_forward(params, tokens, CFG_FULL,
                                     compute_dtype=jnp.float32,
                                     attn_impl="ref")

        cache = init_kv_cache(CFG_FULL, B, 16, dtype=jnp.float32)
        pre_logits, cache = moe_forward(
            params, tokens[:, :6], CFG_FULL, cache=cache, start_pos=0,
            kv_lens=jnp.full((B,), 6, jnp.int32),
            compute_dtype=jnp.float32, attn_impl="ref",
        )
        np.testing.assert_allclose(
            np.asarray(pre_logits), np.asarray(full_logits[:, :6]),
            rtol=2e-4, atol=2e-4,
        )
        logits = pre_logits[:, -1:]
        for t in range(6, S):
            logits, cache = moe_forward(
                params, tokens[:, t : t + 1], CFG_FULL, cache=cache,
                start_pos=jnp.full((B,), t, jnp.int32),
                kv_lens=jnp.full((B,), t + 1, jnp.int32),
                compute_dtype=jnp.float32, attn_impl="ref",
            )
            np.testing.assert_allclose(
                np.asarray(logits[:, 0]), np.asarray(full_logits[:, t]),
                rtol=5e-4, atol=5e-4,
            )


class TestQuantized:
    def test_quantize_moe_params_bounded_error(self):
        from llm_fp8_tpu.quant import recipe_set_by_name

        params = init_moe_params(CFG_FULL, jax.random.PRNGKey(5),
                                 dtype=jnp.float32)
        tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6)
        ref, _ = moe_forward(params, tokens, CFG_FULL,
                             compute_dtype=jnp.float32, attn_impl="ref")
        for name in ("int8", "default"):
            qp = quantize_moe_params(params, recipe_set_by_name(name))
            got, _ = moe_forward(qp, tokens, CFG_FULL,
                                 compute_dtype=jnp.float32, attn_impl="ref")
            err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
            scale = np.max(np.abs(np.asarray(ref))) + 1e-6
            assert err / scale < (0.05 if name == "int8" else 0.15), (
                name, err, scale)

    def test_resolver_finds_moe(self):
        from llm_fp8_tpu.models import resolve_model

        entry = resolve_model("debug-mixtral")
        assert entry.cfg is CFG
        params = entry.init_fn(entry.cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
        logits, _ = entry.forward_fn(
            params, jnp.arange(6, dtype=jnp.int32).reshape(1, 6), entry.cfg,
            compute_dtype=jnp.float32, attn_impl="ref",
        )
        assert logits.shape == (1, 6, CFG.vocab_size)
