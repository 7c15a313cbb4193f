"""Qwen3-MoE family: Qwen3 QK-norm attention + Mixtral-shape routed experts
with ``norm_topk_prob`` (HF ``modeling_qwen3_moe.py`` — "only diff with
mixtral sparse moe block"). HF logit parity, cached decode, export round
trip, engine serving."""
import dataclasses as dc

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.moe import (
    MOE_REGISTRY,
    init_moe_params,
    moe_forward,
    pack_qwen3_moe_state_dict,
    export_qwen3_moe_state_dict,
)

CFG = MOE_REGISTRY["debug-qwen3moe"]


def hf_qwen3_moe(cfg, seed=0):
    import torch
    from transformers.models.qwen3_moe import (
        Qwen3MoeConfig, Qwen3MoeForCausalLM,
    )

    torch.manual_seed(seed)
    hf_cfg = Qwen3MoeConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size * 4,  # dense width: unused
        moe_intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        num_experts=cfg.num_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        norm_topk_prob=cfg.norm_topk_prob,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_bias=False,
        attn_implementation="eager",
    )
    model = Qwen3MoeForCausalLM(hf_cfg)
    model.eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    return model, sd


def hf_logits(model, tokens):
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(tokens)).logits.float().numpy()


class TestHFParity:
    def test_logits_fp32(self):
        model, sd = hf_qwen3_moe(CFG)
        params = pack_qwen3_moe_state_dict(sd, CFG, dtype=jnp.float32)
        tokens = (np.arange(24, dtype=np.int32)[None, :] * 7) % CFG.vocab_size
        want = hf_logits(model, tokens)
        got, _ = moe_forward(params, jnp.asarray(tokens), CFG,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_norm_topk_prob_false_matches_hf(self):
        # Qwen2-MoE-style gating (no renormalization) must also track HF.
        cfg = dc.replace(CFG, norm_topk_prob=False)
        model, sd = hf_qwen3_moe(cfg, seed=2)
        params = pack_qwen3_moe_state_dict(sd, cfg, dtype=jnp.float32)
        tokens = (np.arange(16, dtype=np.int32)[None, :] * 5) % cfg.vocab_size
        want = hf_logits(model, tokens)
        got, _ = moe_forward(params, jnp.asarray(tokens), cfg,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)
        # …and differ from the renormalized gate on the same weights.
        alt, _ = moe_forward(params, jnp.asarray(tokens), CFG,
                             compute_dtype=jnp.float32, attn_impl="ref")
        assert float(jnp.max(jnp.abs(alt - got))) > 1e-4

    def test_qk_norm_weights_are_live(self):
        model, sd = hf_qwen3_moe(CFG, seed=3)
        params = pack_qwen3_moe_state_dict(sd, CFG, dtype=jnp.float32)
        tokens = (np.arange(12, dtype=np.int32)[None, :] * 3) % CFG.vocab_size
        base, _ = moe_forward(params, jnp.asarray(tokens), CFG,
                              compute_dtype=jnp.float32, attn_impl="ref")
        import copy

        p2 = copy.deepcopy(params)
        p2["layers"]["q_norm"] = p2["layers"]["q_norm"] * 2.0
        alt, _ = moe_forward(p2, jnp.asarray(tokens), CFG,
                             compute_dtype=jnp.float32, attn_impl="ref")
        assert float(jnp.max(jnp.abs(alt - base))) > 1e-4


class TestDecodeAndServing:
    def test_cached_decode_matches_full_forward(self):
        from llm_fp8_tpu.models.llama import init_kv_cache

        cfg = dc.replace(CFG, capacity_factor=0.0)
        params = init_moe_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
        T = 10
        tokens = (np.arange(T, dtype=np.int32)[None, :] * 5) % cfg.vocab_size
        tokens = jnp.asarray(tokens)
        full, _ = moe_forward(params, tokens, cfg,
                              compute_dtype=jnp.float32, attn_impl="ref")
        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        pre = 4
        out_pre, cache = moe_forward(
            params, tokens[:, :pre], cfg, cache=cache, start_pos=0,
            kv_lens=jnp.array([pre]), compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(out_pre),
                                   np.asarray(full[:, :pre]),
                                   rtol=2e-3, atol=2e-3)
        for t in range(pre, T):
            step, cache = moe_forward(
                params, tokens[:, t:t + 1], cfg, cache=cache,
                start_pos=jnp.array([t]), kv_lens=jnp.array([t + 1]),
                compute_dtype=jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(step[:, 0]), np.asarray(full[:, t]),
                rtol=2e-3, atol=2e-3,
            )

    def test_serves_through_engine(self):
        from llm_fp8_tpu.serving.engine import (
            Engine, EngineConfig, SamplingParams,
        )

        params = init_moe_params(CFG, jax.random.PRNGKey(2))
        eng = Engine(
            params, CFG,
            EngineConfig(max_slots=2, max_seq_len=64,
                         prefill_buckets=(16,), kv_dtype="bf16"),
            forward_fn=moe_forward,
        )
        eng.add_request(np.asarray([3, 1, 4, 1, 5], np.int32),
                        SamplingParams(max_new_tokens=6))
        out = eng.run()
        assert len(out[0].output) == 6

    def test_resolver_and_quantization(self):
        from llm_fp8_tpu.models import resolve_model
        from llm_fp8_tpu.quant.recipe import recipe_set_by_name

        entry = resolve_model("debug-qwen3moe")
        params = entry.init_fn(entry.cfg, jax.random.PRNGKey(1))
        tokens = jnp.asarray((np.arange(8, dtype=np.int32)[None, :] * 3)
                             % entry.cfg.vocab_size)
        base, _ = entry.forward_fn(params, tokens, entry.cfg)
        qp = entry.quantize_fn(params, recipe_set_by_name("int8"))
        got, _ = entry.forward_fn(qp, tokens, entry.cfg)
        err = float(jnp.max(jnp.abs(got - base)))
        spread = float(jnp.max(jnp.abs(base))) + 1e-6
        assert err / spread < 0.25


class TestExport:
    def test_export_reloads_in_transformers(self):
        import torch
        from transformers.models.qwen3_moe import (
            Qwen3MoeConfig, Qwen3MoeForCausalLM,
        )

        params = init_moe_params(CFG, jax.random.PRNGKey(4),
                                 dtype=jnp.float32)
        sd = export_qwen3_moe_state_dict(params, CFG)
        hf_cfg = Qwen3MoeConfig(
            vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
            intermediate_size=CFG.intermediate_size * 4,
            moe_intermediate_size=CFG.intermediate_size,
            num_hidden_layers=CFG.num_layers,
            num_attention_heads=CFG.num_heads,
            num_key_value_heads=CFG.num_kv_heads, head_dim=CFG.head_dim,
            num_experts=CFG.num_experts,
            num_experts_per_tok=CFG.num_experts_per_tok,
            norm_topk_prob=CFG.norm_topk_prob, decoder_sparse_step=1,
            mlp_only_layers=[], rope_theta=CFG.rope_theta,
            rms_norm_eps=CFG.rms_eps,
            max_position_embeddings=CFG.max_position_embeddings,
            tie_word_embeddings=CFG.tie_word_embeddings,
            attention_bias=False, attn_implementation="eager",
        )
        model = Qwen3MoeForCausalLM(hf_cfg)
        missing, unexpected = model.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
        )
        assert not unexpected
        assert all("inv_freq" in m for m in missing)
        model.eval()
        tokens = (np.arange(10, dtype=np.int32)[None, :] * 7
                  ) % CFG.vocab_size
        want = hf_logits(model, tokens)
        got, _ = moe_forward(params, jnp.asarray(tokens), CFG,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_pack_round_trips_export(self):
        params = init_moe_params(CFG, jax.random.PRNGKey(6),
                                 dtype=jnp.float32)
        sd = {k: jnp.asarray(v) for k, v in
              export_qwen3_moe_state_dict(params, CFG).items()}
        back = pack_qwen3_moe_state_dict(sd, CFG, dtype=jnp.float32)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
            params, back,
        )
