"""Gemma-2 family tests: HF parity (softcaps + alternating windows active),
KV-cache decode, quantization, resolver/serving integration."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.gemma import (
    GEMMA_REGISTRY,
    GemmaConfig,
    init_gemma_params,
    gemma_forward,
    pack_gemma2_state_dict,
)

CFG = GEMMA_REGISTRY["debug-gemma2"]


def hf_gemma2_and_state(cfg: GemmaConfig, seed=0):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(seed)
    hf_cfg = Gemma2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=cfg.tie_word_embeddings,
        sliding_window=cfg.sliding_window,
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        attn_logit_softcapping=cfg.attn_logit_softcap,
        final_logit_softcapping=cfg.final_logit_softcap,
        hidden_activation="gelu_pytorch_tanh",
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    model = Gemma2ForCausalLM(hf_cfg)
    model.eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    return model, sd


def hf_logits(model, tokens: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(tokens)).logits.float().numpy()


class TestHFParity:
    def test_gemma2_logits_fp32(self):
        model, sd = hf_gemma2_and_state(CFG)
        params = pack_gemma2_state_dict(sd, CFG, dtype=jnp.float32)
        # seq 16 > window 6: layer 0's sliding window genuinely masks.
        tokens = (np.arange(16, dtype=np.int32)[None, :] * 7
                  ) % CFG.vocab_size
        want = hf_logits(model, tokens)
        got, _ = gemma_forward(params, jnp.asarray(tokens), CFG,
                               compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_softcap_and_window_change_logits(self):
        # Remove the caps / window and the logits must move — proving the
        # features are live, not silently dropped.
        import dataclasses as dc

        model, sd = hf_gemma2_and_state(CFG, seed=2)
        params = pack_gemma2_state_dict(sd, CFG, dtype=jnp.float32)
        tokens = (np.arange(16, dtype=np.int32)[None, :] * 3
                  ) % CFG.vocab_size
        base, _ = gemma_forward(params, jnp.asarray(tokens), CFG,
                                compute_dtype=jnp.float32, attn_impl="ref")
        # Random-init attention logits are small, so the production caps are
        # near-identity; prove liveliness by *tightening* them instead.
        for variant in (
            dc.replace(CFG, attn_logit_softcap=0.05),
            dc.replace(CFG, final_logit_softcap=0.5),
            dc.replace(CFG, sliding_window=2),
        ):
            alt, _ = gemma_forward(params, jnp.asarray(tokens), variant,
                                   compute_dtype=jnp.float32,
                                   attn_impl="ref")
            assert np.abs(np.asarray(alt) - np.asarray(base)).max() > 1e-3
        capped, _ = gemma_forward(
            params, jnp.asarray(tokens),
            dc.replace(CFG, final_logit_softcap=0.5),
            compute_dtype=jnp.float32, attn_impl="ref",
        )
        assert np.abs(np.asarray(capped)).max() <= 0.5 + 1e-6
        assert np.abs(np.asarray(base)).max() > 0.5  # base exceeds the cap


class TestDecode:
    def test_kv_cache_decode_matches_full(self):
        from llm_fp8_tpu.models import init_kv_cache

        params = init_gemma_params(CFG, jax.random.PRNGKey(4),
                                   dtype=jnp.float32)
        B, S = 2, 12
        tokens = jnp.asarray(
            (np.arange(B * S).reshape(B, S) * 5) % CFG.vocab_size, jnp.int32
        )
        full, _ = gemma_forward(params, tokens, CFG,
                                compute_dtype=jnp.float32, attn_impl="ref")
        cache = init_kv_cache(CFG, B, 16, dtype=jnp.float32)
        logits, cache = gemma_forward(
            params, tokens[:, :8], CFG, cache=cache, start_pos=0,
            kv_lens=jnp.full((B,), 8, jnp.int32),
            compute_dtype=jnp.float32, attn_impl="ref",
        )
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, :8]),
                                   rtol=1e-4, atol=1e-4)
        for t in range(8, S):
            lens = jnp.full((B,), t, jnp.int32)
            step, cache = gemma_forward(
                params, tokens[:, t:t + 1], CFG, cache=cache,
                start_pos=lens, kv_lens=lens + 1,
                compute_dtype=jnp.float32, attn_impl="ref",
            )
            np.testing.assert_allclose(np.asarray(step[:, 0]),
                                       np.asarray(full[:, t]),
                                       rtol=5e-4, atol=5e-4)


class TestIntegration:
    def test_resolver_and_quantization(self):
        from llm_fp8_tpu.models import resolve_model
        from llm_fp8_tpu.quant import recipe_set_by_name

        entry = resolve_model("debug-gemma2")
        params = entry.init_fn(entry.cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
        tokens = jnp.arange(12, dtype=jnp.int32).reshape(2, 6)
        ref, _ = entry.forward_fn(params, tokens, entry.cfg,
                                  compute_dtype=jnp.float32, attn_impl="ref")
        qp = entry.quantize_fn(params, recipe_set_by_name("int8"))
        got, _ = entry.forward_fn(qp, tokens, entry.cfg,
                                  compute_dtype=jnp.float32, attn_impl="ref")
        err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
        # Final softcap bounds logits to ±30, so absolute error is small.
        assert err < 0.6, err

    def test_odd_layer_count_rejected(self):
        import dataclasses as dc

        with pytest.raises(ValueError):
            dc.replace(CFG, num_layers=3)
