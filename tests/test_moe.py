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
        for name in ("int8", "default", "mxfp8"):
            qp = quantize_moe_params(params, recipe_set_by_name(name))
            got, _ = moe_forward(qp, tokens, CFG_FULL,
                                 compute_dtype=jnp.float32, attn_impl="ref")
            err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
            scale = np.max(np.abs(np.asarray(ref))) + 1e-6
            assert err / scale < (0.05 if name == "int8" else 0.15), (
                name, err, scale)
            if name == "mxfp8":
                # Block recipe must actually produce block-scaled experts.
                gu = qp["layers"]["w_gate_up"]
                assert getattr(gu, "block_size", None) == 32

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


class TestExpertParallel:
    """EP-sharded forward vs single-device — the reference-style sharded/
    unsharded comparison (SURVEY.md §4) on the ``ep`` mesh axis."""

    @pytest.mark.parametrize(
        "mesh_kw",
        # fsdp = -1 absorbs the leftover devices of the 8-device mesh, so
        # every case also exercises ep × fsdp composition.
        [dict(ep=4), dict(ep=2, tp=2), dict(dp=2, ep=2),
         dict(ep=8, fsdp=1)],
        ids=["ep4_fsdp2", "ep2tp2_fsdp2", "dp2ep2_fsdp2", "ep8_replfallback"],
    )
    def test_ep_sharded_matches_single_device(self, mesh_kw):
        from jax.sharding import NamedSharding
        from llm_fp8_tpu.parallel import (
            MeshConfig, make_mesh, shard_params, batch_spec, param_specs,
        )

        params = init_moe_params(CFG_FULL, jax.random.PRNGKey(7),
                                 dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(8), (4, 16), 0,
                                    CFG_FULL.vocab_size)
        want, _ = moe_forward(params, tokens, CFG_FULL,
                              compute_dtype=jnp.float32, attn_impl="ref")

        mesh = make_mesh(MeshConfig(**mesh_kw))
        # The expert axis must actually shard over ep (E=4 divisible).
        specs = param_specs(params, mesh)
        gu_spec = specs["layers"]["w_gate_up"]
        if 1 < mesh.shape["ep"] <= CFG_FULL.num_experts:
            assert "ep" in str(gu_spec), gu_spec
        sharded = shard_params(params, mesh)
        tok = jax.device_put(tokens, NamedSharding(mesh, batch_spec()))

        @jax.jit
        def f(p, t):
            logits, _ = moe_forward(p, t, CFG_FULL,
                                    compute_dtype=jnp.float32,
                                    attn_impl="ref")
            return logits

        got = f(sharded, tok)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


class TestMoETraining:
    def test_trainer_runs_and_loss_decreases(self):
        from llm_fp8_tpu.training import TrainConfig, Trainer

        cfg = CFG  # production capacity_factor (2.0)
        trainer = Trainer(
            cfg,
            TrainConfig(learning_rate=5e-3, warmup_steps=2, total_steps=30,
                        recipes="bf16"),
            attn_impl="ref",
            forward_fn=moe_forward,
        )
        params = init_moe_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
        state = trainer.init_state(params)
        tok = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0,
                                 cfg.vocab_size)
        batch = {"input_ids": tok,
                 "attention_mask": jnp.ones_like(tok)}
        losses = []
        for _ in range(25):
            state, metrics = trainer.train_step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses[::6]

    def test_router_receives_gradient(self):
        # The router weight gets gradient through the combine weights and
        # the load-balancing aux term; it must be nonzero under the Trainer
        # loss (a silently-dead router would never learn to route).
        from llm_fp8_tpu.training import TrainConfig, Trainer

        trainer = Trainer(
            CFG,
            TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=4,
                        recipes="bf16"),
            attn_impl="ref",
            forward_fn=moe_forward,
        )
        params = init_moe_params(CFG, jax.random.PRNGKey(3),
                                 dtype=jnp.float32)
        tok = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0,
                                 CFG.vocab_size)
        batch = {"input_ids": tok, "attention_mask": jnp.ones_like(tok)}
        grads = jax.grad(
            lambda p: trainer._forward_loss(p, None, batch, {})[0]
        )(params)
        g_router = np.asarray(grads["layers"]["w_router"])
        assert np.abs(g_router).max() > 0.0
        g_experts = np.asarray(grads["layers"]["w_gate_up"])
        assert np.abs(g_experts).max() > 0.0


class TestGroupedDispatch:
    def test_grouped_lossless_matches_hf(self):
        # Multiple routing groups (G > 1) with lossless capacity must still
        # reproduce HF exactly — grouping only bounds memory, not routing.
        cfg = __import__("dataclasses").replace(
            CFG_FULL, moe_group_size=4
        )  # T = 2*12 = 24 → G = 6 groups
        model, sd = hf_mixtral_and_state(cfg)
        params = pack_mixtral_state_dict(sd, cfg, dtype=jnp.float32)
        tokens = (np.arange(24, dtype=np.int32).reshape(2, 12) * 11
                  ) % cfg.vocab_size
        want = hf_logits(model, tokens)
        got, _ = moe_forward(params, jnp.asarray(tokens), cfg,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_padding_tokens_do_not_claim_capacity(self):
        # All 16 tokens (8 masked junk FIRST, then 8 real) route to expert
        # 0 with capacity C=8 — exactly the real-token count. If the mask
        # failed, the junk rows would claim every capacity slot (token-order
        # priority) and the real rows would come back zero.
        from llm_fp8_tpu.models.moe import _moe_mlp

        cfg = __import__("dataclasses").replace(
            CFG, capacity_factor=1.0, num_experts=2, num_experts_per_tok=1,
            moe_group_size=16,
        )  # g=16, K=1, E=2 → per=8, C=8
        D = cfg.hidden_size
        key = jax.random.PRNGKey(0)
        h_real = jnp.abs(jax.random.normal(key, (8, D), jnp.float32)) + 0.1
        junk = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (8, D),
                                         jnp.float32)) + 0.1
        w_router = jnp.zeros((D, 2), jnp.float32).at[0, 0].set(100.0)
        params = init_moe_params(cfg, jax.random.PRNGKey(1),
                                 dtype=jnp.float32)
        lp = params["layers"]

        h_pad = jnp.concatenate([junk, h_real])
        mask = jnp.concatenate([jnp.zeros((8,)), jnp.ones((8,))])
        y_pad, _ = _moe_mlp(h_pad, w_router, lp["w_gate_up"][0],
                            lp["w_down"][0], cfg, token_mask=mask)
        # Dense expert-0 reference on the real rows (routing weight = 1.0).
        wg, wd = lp["w_gate_up"][0, 0], lp["w_down"][0, 0]
        gate, up = jnp.split(h_real @ wg, 2, axis=-1)
        want = (jax.nn.silu(gate) * up) @ wd
        np.testing.assert_allclose(np.asarray(y_pad[8:]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y_pad[:8]), 0.0, atol=0)

    def test_aux_matches_hf_load_balancing(self):
        # Our load_balance_loss vs transformers' load_balancing_loss_func
        # on the same random logits, with and without an attention mask.
        import torch
        from transformers.models.mixtral.modeling_mixtral import (
            load_balancing_loss_func,
        )

        T, E, K = 24, 4, 2
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(T, E)).astype(np.float32)
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        topv, topi = jax.lax.top_k(probs, K)

        want = float(load_balancing_loss_func(
            (torch.from_numpy(logits),), num_experts=E, top_k=K,
        ))
        got = float(load_balance_loss(probs, topi, E))
        np.testing.assert_allclose(got, want, rtol=1e-5)

        # Masked: HF wants attention_mask [batch, seq]; use batch=2.
        mask_np = np.ones((2, T // 2), dtype=np.int64)
        mask_np[0, -3:] = 0
        want_m = float(load_balancing_loss_func(
            (torch.from_numpy(logits),), num_experts=E, top_k=K,
            attention_mask=torch.from_numpy(mask_np),
        ))
        got_m = float(load_balance_loss(
            probs, topi, E, jnp.asarray(mask_np.reshape(-1))
        ))
        np.testing.assert_allclose(got_m, want_m, rtol=1e-5)

    def test_uniform_aux_is_k(self):
        # HF semantics: uniform routing yields K (no division by top_k).
        T, E, K = 64, 4, 2
        probs = jnp.full((T, E), 1.0 / E)
        # Distinct experts per slot for a clean uniform assignment.
        topi = jnp.stack([(jnp.arange(T) % E),
                          ((jnp.arange(T) + 1) % E)], axis=1)
        aux = load_balance_loss(probs, topi, E)
        np.testing.assert_allclose(float(aux), float(K), rtol=1e-6)


class TestZooCheckpointLoader:
    def test_load_zoo_checkpoint_mixtral_from_disk(self, tmp_path):
        # save_pretrained → load_zoo_checkpoint → logits parity: the unified
        # disk path (safetensors read + family pack dispatch).
        from llm_fp8_tpu.models import load_zoo_checkpoint

        model, _ = hf_mixtral_and_state(CFG_FULL, seed=9)
        model.save_pretrained(tmp_path / "ckpt", safe_serialization=True)
        params = load_zoo_checkpoint("debug-mixtral", str(tmp_path / "ckpt"),
                                     dtype=jnp.float32)
        tokens = (np.arange(12, dtype=np.int32).reshape(1, 12) * 13
                  ) % CFG_FULL.vocab_size
        want = hf_logits(model, tokens)
        got, _ = moe_forward(params, jnp.asarray(tokens), CFG_FULL,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_unknown_name_raises(self):
        from llm_fp8_tpu.models import load_zoo_checkpoint

        with pytest.raises(ValueError):
            load_zoo_checkpoint("not-a-model", "/nonexistent")


class TestExportHF:
    def test_export_reloads_in_transformers(self, tmp_path):
        # params → export_hf → MixtralForCausalLM.from_pretrained →
        # logit parity: the ModelSaver round trip for the MoE family.
        import torch
        from transformers import MixtralForCausalLM
        from llm_fp8_tpu.training.checkpoint import export_hf

        params = init_moe_params(CFG_FULL, jax.random.PRNGKey(11),
                                 dtype=jnp.float32)
        out = export_hf(params, CFG_FULL, str(tmp_path / "hf"))
        model = MixtralForCausalLM.from_pretrained(out)
        model.eval()

        tokens = (np.arange(10, dtype=np.int32).reshape(1, 10) * 17
                  ) % CFG_FULL.vocab_size
        want, _ = moe_forward(params, jnp.asarray(tokens), CFG_FULL,
                              compute_dtype=jnp.float32, attn_impl="ref")
        got = hf_logits(model, tokens)
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4,
                                   atol=2e-4)


class TestMoEServingSharded:
    def test_ep_sharded_engine_matches_single_device(self):
        # Expert-parallel serving: the shared Engine with the MoE forward on
        # an ep×fsdp×tp mesh must emit the same tokens as the single-device
        # engine (the sharded-vs-unsharded idiom at the serving level).
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device mesh (CPU run)")
        from llm_fp8_tpu.parallel import MeshConfig, make_mesh, shard_params
        from llm_fp8_tpu.serving import Engine, EngineConfig, SamplingParams

        params = init_moe_params(CFG_FULL, jax.random.PRNGKey(21),
                                 dtype=jnp.float32)
        prompt = np.arange(1, 11, dtype=np.int32)
        ecfg = EngineConfig(max_slots=2, max_seq_len=64,
                            kv_dtype=jnp.float32, prefill_buckets=(16,),
                            attn_impl="ref")

        eng1 = Engine(params, CFG_FULL, ecfg, forward_fn=moe_forward)
        want = eng1.add_request(prompt, SamplingParams(max_new_tokens=6))
        eng1.run()

        mesh = make_mesh(MeshConfig(dp=1, fsdp=2, ep=2, tp=2))
        eng2 = Engine(shard_params(params, mesh), CFG_FULL, ecfg,
                      mesh=mesh, forward_fn=moe_forward)
        got = eng2.add_request(prompt, SamplingParams(max_new_tokens=6))
        eng2.run()
        assert got.output == want.output
