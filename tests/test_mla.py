"""DeepSeek-V2 MLA family tests: HF logit parity (both gate variants and
both q paths), absorbed-latent cached decode vs the expanded forward,
quantization, resolver/serving integration, HF export round-trip."""
import dataclasses as dc

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.mla import (
    MLA_REGISTRY,
    MLAConfig,
    init_mla_params,
    mla_forward,
    pack_deepseek_state_dict,
    export_deepseek_state_dict,
    quantize_mla_params,
)

CFG = MLA_REGISTRY["debug-mla"]
CFG_Q = MLA_REGISTRY["debug-mla-q"]


def hf_deepseek_and_state(cfg: MLAConfig, seed=0):
    import torch
    from transformers.models.deepseek_v2 import (
        DeepseekV2Config, DeepseekV2ForCausalLM,
    )

    torch.manual_seed(seed)
    hf_cfg = DeepseekV2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        moe_intermediate_size=cfg.moe_intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_heads,
        n_routed_experts=cfg.num_experts,
        n_shared_experts=cfg.n_shared_experts,
        num_experts_per_tok=cfg.num_experts_per_tok,
        first_k_dense_replace=cfg.first_k_dense_replace,
        routed_scaling_factor=cfg.routed_scaling_factor,
        topk_method=cfg.topk_method,
        n_group=cfg.n_group,
        topk_group=cfg.topk_group,
        q_lora_rank=cfg.q_lora_rank,
        kv_lora_rank=cfg.kv_lora_rank,
        qk_nope_head_dim=cfg.qk_nope_head_dim,
        qk_rope_head_dim=cfg.qk_rope_head_dim,
        v_head_dim=cfg.v_head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_bias=False,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    model = DeepseekV2ForCausalLM(hf_cfg)
    model.eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    return model, sd


def hf_logits(model, tokens: np.ndarray) -> np.ndarray:
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(tokens)).logits.float().numpy()


class TestHFParity:
    def test_mla_logits_fp32(self):
        model, sd = hf_deepseek_and_state(CFG)
        params = pack_deepseek_state_dict(sd, CFG, dtype=jnp.float32)
        tokens = (np.arange(24, dtype=np.int32)[None, :] * 7) % CFG.vocab_size
        want = hf_logits(model, tokens)
        got, _ = mla_forward(params, jnp.asarray(tokens), CFG,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_mla_q_lora_group_limited_logits_fp32(self):
        # Exercises the low-rank q path, the group-limited gate, and a
        # routed scaling factor != 1.
        model, sd = hf_deepseek_and_state(CFG_Q, seed=3)
        params = pack_deepseek_state_dict(sd, CFG_Q, dtype=jnp.float32)
        tokens = (np.arange(20, dtype=np.int32)[None, :] * 11
                  ) % CFG_Q.vocab_size
        want = hf_logits(model, tokens)
        got, _ = mla_forward(params, jnp.asarray(tokens), CFG_Q,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_scaling_factor_is_live(self):
        # Crank the routed scale and the logits must move.
        model, sd = hf_deepseek_and_state(CFG, seed=5)
        params = pack_deepseek_state_dict(sd, CFG, dtype=jnp.float32)
        tokens = (np.arange(12, dtype=np.int32)[None, :] * 3
                  ) % CFG.vocab_size
        base, _ = mla_forward(params, jnp.asarray(tokens), CFG,
                              compute_dtype=jnp.float32, attn_impl="ref")
        alt_cfg = dc.replace(CFG, routed_scaling_factor=4.0)
        alt, _ = mla_forward(params, jnp.asarray(tokens), alt_cfg,
                             compute_dtype=jnp.float32, attn_impl="ref")
        assert float(jnp.max(jnp.abs(alt - base))) > 1e-3


class TestLatentDecode:
    @pytest.mark.parametrize("name", ["debug-mla", "debug-mla-q"])
    def test_cached_decode_matches_full_forward(self, name):
        """Prefill + step-by-step absorbed-latent decode must reproduce the
        expanded full-forward logits (the MLA absorption identity)."""
        from llm_fp8_tpu.models.llama import init_kv_cache

        # Lossless capacity for the uncached reference: the cached/serving
        # path always runs lossless, so the comparison must too (the group-
        # limited gate concentrates assignments enough to overflow the
        # training-path capacity at this tiny scale).
        cfg = dc.replace(MLA_REGISTRY[name], capacity_factor=0.0)
        params = init_mla_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
        T = 12
        tokens = (np.arange(T, dtype=np.int32)[None, :] * 5) % cfg.vocab_size
        tokens = jnp.asarray(tokens)
        full, _ = mla_forward(params, tokens, cfg,
                              compute_dtype=jnp.float32, attn_impl="ref")

        cache = init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
        assert cache.k.shape[-1] == cfg.kv_lora_rank
        assert cache.v.shape[-1] == cfg.qk_rope_head_dim
        pre = 5
        out_pre, cache = mla_forward(
            params, tokens[:, :pre], cfg, cache=cache, start_pos=0,
            kv_lens=jnp.array([pre]), compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(out_pre),
                                   np.asarray(full[:, :pre]),
                                   rtol=2e-3, atol=2e-3)
        for t in range(pre, T):
            step, cache = mla_forward(
                params, tokens[:, t:t + 1], cfg, cache=cache,
                start_pos=jnp.array([t]), kv_lens=jnp.array([t + 1]),
                compute_dtype=jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(step[:, 0]), np.asarray(full[:, t]),
                rtol=2e-3, atol=2e-3,
            )

    def test_latent_cache_is_compressed(self):
        """The cache stores kv_lora_rank + rope dims per token — not the
        H*(dn+dr) + H*dv an expanded per-head cache would need."""
        from llm_fp8_tpu.models.llama import init_kv_cache

        cache = init_kv_cache(CFG, 1, 16, dtype=jnp.bfloat16)
        latent = (cache.k.shape[-1] + cache.v.shape[-1]) * cache.k.shape[-2]
        expanded = CFG.num_heads * (CFG.qk_head_dim + CFG.v_head_dim)
        assert latent == CFG.kv_lora_rank + CFG.qk_rope_head_dim
        assert latent * 3 < expanded  # ≥3x compression even at debug scale


class TestSharded:
    """MLA sharded-vs-single-device parity (SURVEY.md §4 idiom) on the
    virtual 8-device mesh: tp splits the per-head projections (wq/wq_b/
    w_kv_b column-parallel, w_kv_a row-parallel), ep splits the DeepSeekMoE
    expert stacks."""

    @pytest.mark.parametrize(
        "mesh_kw",
        [dict(tp=4), dict(ep=2, tp=2), dict(dp=2, tp=2), dict(ep=4)],
        ids=["tp4_fsdp2", "ep2tp2_fsdp2", "dp2tp2_fsdp2", "ep4_fsdp2"],
    )
    @pytest.mark.parametrize("name", ["debug-mla", "debug-mla-q"])
    def test_sharded_matches_single_device(self, mesh_kw, name):
        from jax.sharding import NamedSharding
        from llm_fp8_tpu.parallel import (
            MeshConfig, make_mesh, shard_params, batch_spec, param_specs,
        )

        cfg = MLA_REGISTRY[name]
        params = init_mla_params(cfg, jax.random.PRNGKey(11),
                                 dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(12), (4, 16), 0,
                                    cfg.vocab_size)
        want, _ = mla_forward(params, tokens, cfg,
                              compute_dtype=jnp.float32, attn_impl="ref")

        mesh = make_mesh(MeshConfig(**mesh_kw))
        specs = param_specs(params, mesh)
        if mesh.shape["tp"] > 1:
            assert "tp" in str(specs["moe_layers"]["w_kv_b"])
        if 1 < mesh.shape["ep"] <= cfg.num_experts:
            assert "ep" in str(specs["moe_layers"]["w_gate_up"])
        sharded = shard_params(params, mesh)
        tok = jax.device_put(tokens, NamedSharding(mesh, batch_spec()))

        @jax.jit
        def f(p, t):
            logits, _ = mla_forward(p, t, cfg, compute_dtype=jnp.float32,
                                    attn_impl="ref")
            return logits

        got = f(sharded, tok)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


class TestIntegration:
    def test_resolver_and_quantization(self):
        from llm_fp8_tpu.models import resolve_model
        from llm_fp8_tpu.quant.recipe import recipe_set_by_name

        entry = resolve_model("debug-mla")
        params = entry.init_fn(entry.cfg, jax.random.PRNGKey(1))
        tokens = jnp.asarray((np.arange(8, dtype=np.int32)[None, :] * 3)
                             % entry.cfg.vocab_size)
        base, _ = entry.forward_fn(params, tokens, entry.cfg)
        qp = entry.quantize_fn(params, recipe_set_by_name("default"))
        got, _ = entry.forward_fn(qp, tokens, entry.cfg)
        err = float(jnp.max(jnp.abs(got - base)))
        spread = float(jnp.max(jnp.abs(base))) + 1e-6
        assert err / spread < 0.25  # quantized logits stay in family

    def test_serves_through_engine(self):
        from llm_fp8_tpu.serving.engine import Engine, EngineConfig

        cfg = MLA_REGISTRY["debug-mla"]
        params = init_mla_params(cfg, jax.random.PRNGKey(2))
        eng = Engine(
            params, cfg,
            EngineConfig(max_slots=2, max_seq_len=64,
                         prefill_buckets=(16,), kv_dtype="bf16"),
            forward_fn=mla_forward,
        )
        from llm_fp8_tpu.serving.engine import SamplingParams

        prompt = [3, 1, 4, 1, 5]
        eng.add_request(np.asarray(prompt, np.int32),
                        SamplingParams(max_new_tokens=6))
        out = eng.run()
        toks = out[0].output
        assert len(toks) == 6

        # Token parity vs direct greedy decode through the family forward.
        from llm_fp8_tpu.models.llama import init_kv_cache

        cache = init_kv_cache(cfg, 1, 64)
        t = jnp.asarray([prompt], jnp.int32)
        logits, cache = mla_forward(params, t, cfg, cache=cache,
                                    start_pos=0,
                                    kv_lens=jnp.array([len(prompt)]))
        want = []
        last = jnp.argmax(logits[0, -1])
        for i in range(6):
            want.append(int(last))
            step, cache = mla_forward(
                params, last[None, None].astype(jnp.int32), cfg,
                cache=cache, start_pos=jnp.array([len(prompt) + i]),
                kv_lens=jnp.array([len(prompt) + i + 1]),
            )
            last = jnp.argmax(step[0, -1])
        assert toks == want

    def test_export_reloads_in_transformers(self, tmp_path):
        import torch
        from transformers.models.deepseek_v2 import (
            DeepseekV2Config, DeepseekV2ForCausalLM,
        )

        cfg = MLA_REGISTRY["debug-mla"]
        params = init_mla_params(cfg, jax.random.PRNGKey(4),
                                 dtype=jnp.float32)
        sd = export_deepseek_state_dict(params, cfg)
        hf_cfg = DeepseekV2Config(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            moe_intermediate_size=cfg.moe_intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_heads,
            n_routed_experts=cfg.num_experts,
            n_shared_experts=cfg.n_shared_experts,
            num_experts_per_tok=cfg.num_experts_per_tok,
            first_k_dense_replace=cfg.first_k_dense_replace,
            routed_scaling_factor=cfg.routed_scaling_factor,
            topk_method=cfg.topk_method,
            q_lora_rank=cfg.q_lora_rank, kv_lora_rank=cfg.kv_lora_rank,
            qk_nope_head_dim=cfg.qk_nope_head_dim,
            qk_rope_head_dim=cfg.qk_rope_head_dim,
            v_head_dim=cfg.v_head_dim, rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_eps,
            max_position_embeddings=cfg.max_position_embeddings,
            tie_word_embeddings=cfg.tie_word_embeddings,
            attention_bias=False, attn_implementation="eager",
        )
        model = DeepseekV2ForCausalLM(hf_cfg)
        missing, unexpected = model.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
        )
        assert not unexpected
        # Only non-persistent buffers (rotary inv_freq) may be missing.
        assert all("inv_freq" in m for m in missing)
        model.eval()
        tokens = (np.arange(10, dtype=np.int32)[None, :] * 7
                  ) % cfg.vocab_size
        want = hf_logits(model, tokens)
        got, _ = mla_forward(params, jnp.asarray(tokens), cfg,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_trainer_runs_and_loss_decreases(self):
        from llm_fp8_tpu.training import TrainConfig, Trainer

        trainer = Trainer(
            CFG,
            TrainConfig(learning_rate=5e-3, warmup_steps=2, total_steps=30,
                        recipes="bf16"),
            attn_impl="ref",
            forward_fn=mla_forward,
        )
        params = init_mla_params(CFG, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
        state = trainer.init_state(params)
        tok = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 CFG.vocab_size)
        batch = {"input_ids": tok, "attention_mask": jnp.ones_like(tok)}
        losses = []
        for _ in range(25):
            state, metrics = trainer.train_step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[::6]

    def test_router_and_kv_b_receive_gradient(self):
        from llm_fp8_tpu.training import TrainConfig, Trainer

        trainer = Trainer(
            CFG,
            TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=4,
                        recipes="bf16"),
            attn_impl="ref",
            forward_fn=mla_forward,
        )
        params = init_mla_params(CFG, jax.random.PRNGKey(3),
                                 dtype=jnp.float32)
        tok = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0,
                                 CFG.vocab_size)
        batch = {"input_ids": tok, "attention_mask": jnp.ones_like(tok)}
        grads = jax.grad(
            lambda p: trainer._forward_loss(p, None, batch, {})[0]
        )(params)
        for leaf in ("w_router", "w_gate_up", "w_shared_gate_up"):
            g = np.asarray(grads["moe_layers"][leaf])
            assert np.abs(g).max() > 0.0, leaf
        g = np.asarray(grads["moe_layers"]["w_kv_b"])
        assert np.abs(g).max() > 0.0

    def test_pack_round_trips_export(self):
        cfg = MLA_REGISTRY["debug-mla-q"]
        params = init_mla_params(cfg, jax.random.PRNGKey(6),
                                 dtype=jnp.float32)
        sd = {k: jnp.asarray(v) for k, v in
              export_deepseek_state_dict(params, cfg).items()}
        back = pack_deepseek_state_dict(sd, cfg, dtype=jnp.float32)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6),
            params, back,
        )
