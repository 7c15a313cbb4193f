"""Training-harness tests: FP8 train step, delayed state, loss, data, stability."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.models import get_config, init_params
from llm_fp8_tpu.models.llama import forward_fp8_train, forward, DOT_SITES
from llm_fp8_tpu.quant import recipe_set_by_name
from llm_fp8_tpu.training import (
    TrainConfig,
    Trainer,
    causal_lm_loss,
    make_batches,
    StabilityTracker,
    init_train_quant_state,
    forward_scales,
    make_sinks,
)
from llm_fp8_tpu.training.data import DataManager, DataConfig, synthetic_examples

CFG = get_config("debug-tiny")


def batch_of(seed=0, B=4, S=32):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, CFG.vocab_size, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[:, -4:] = 0  # padded tail
    return {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)}


class TestLoss:
    def test_matches_manual(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16))
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 16)
        loss, n = causal_lm_loss(logits, tokens)
        assert n == 2 * 7
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        manual = -jnp.mean(
            jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1)
        )
        np.testing.assert_allclose(float(loss), float(manual), rtol=1e-5)

    def test_mask_excludes_padding(self):
        logits = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16))
        tokens = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, 16)
        mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]])
        loss_m, n_m = causal_lm_loss(logits, tokens, mask)
        assert n_m == 3
        # Only first 3 transitions count.
        loss_f, _ = causal_lm_loss(logits[:, :4], tokens[:, :4])
        np.testing.assert_allclose(float(loss_m), float(loss_f), rtol=1e-5)


class TestChunkedLoss:
    """chunked_causal_lm_loss ≡ lm_head + causal_lm_loss, value and grads."""

    def _setup(self, B=2, S=13, D=16, V=37, seed=0):
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        h = jax.random.normal(ks[0], (B, S, D), jnp.float32)
        w = jax.random.normal(ks[1], (D, V), jnp.float32) * 0.3
        tokens = jax.random.randint(ks[2], (B, S), 0, V)
        mask = (jax.random.uniform(ks[3], (B, S)) > 0.25).astype(jnp.int32)
        return h, w, tokens, mask

    @pytest.mark.parametrize("num_chunks", [2, 4, 5])  # 5: B*(S-1)%5 != 0
    @pytest.mark.parametrize("zl,ls", [(0.0, 0.0), (1e-3, 0.1)])
    def test_matches_unchunked(self, num_chunks, zl, ls):
        from llm_fp8_tpu.training.losses import chunked_causal_lm_loss

        h, w, tokens, mask = self._setup()

        def ref(h, w):
            logits = (h @ w).astype(jnp.float32)
            return causal_lm_loss(
                logits, tokens, mask, z_loss=zl, label_smoothing=ls
            )[0]

        def chunked(h, w):
            return chunked_causal_lm_loss(
                h, w, tokens, mask, num_chunks=num_chunks,
                z_loss=zl, label_smoothing=ls,
            )[0]

        l_ref, (dh_ref, dw_ref) = jax.value_and_grad(ref, argnums=(0, 1))(h, w)
        l_c, (dh_c, dw_c) = jax.value_and_grad(chunked, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(float(l_c), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dh_c), np.asarray(dh_ref),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dw_c), np.asarray(dw_ref),
                                   rtol=2e-4, atol=1e-6)

    def test_token_count_matches(self):
        from llm_fp8_tpu.training.losses import chunked_causal_lm_loss

        h, w, tokens, mask = self._setup(seed=3)
        _, n_ref = causal_lm_loss((h @ w), tokens, mask)
        _, n_c = chunked_causal_lm_loss(h, w, tokens, mask, num_chunks=3)
        assert int(n_ref) == int(n_c)

    def test_ignore_index(self):
        from llm_fp8_tpu.training.losses import chunked_causal_lm_loss
        from llm_fp8_tpu.training.losses import IGNORE_INDEX

        h, w, tokens, _ = self._setup(seed=5)
        tokens = tokens.at[:, 4:7].set(IGNORE_INDEX)
        l_ref, n_ref = causal_lm_loss((h @ w), tokens)
        l_c, n_c = chunked_causal_lm_loss(h, w, tokens, num_chunks=4)
        assert int(n_ref) == int(n_c)
        np.testing.assert_allclose(float(l_c), float(l_ref), rtol=1e-5)

    @pytest.mark.parametrize("recipes", ["bf16", "default"])
    def test_trainer_parity(self, recipes):
        """Full train step with ce_chunks matches the materialized path."""
        batch = batch_of()
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        losses = {}
        for chunks in (0, 4):
            tr = Trainer(CFG, TrainConfig(
                recipes=recipes, warmup_steps=1, total_steps=10,
                ce_chunks=chunks,
            ))
            # Fresh copy: the train step donates its state buffers.
            state = tr.init_state(jax.tree_util.tree_map(jnp.copy, params))
            for _ in range(3):
                state, m = tr.train_step(state, batch)
            losses[chunks] = float(m["loss"])
            assert int(m["finite"]) == 1
        np.testing.assert_allclose(losses[4], losses[0], rtol=5e-3)

    def test_trainer_eval_parity(self):
        batch = batch_of(seed=2)
        params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
        evals = {}
        for chunks in (0, 4):
            tr = Trainer(CFG, TrainConfig(ce_chunks=chunks))
            evals[chunks] = tr.evaluate(params, [batch])["eval_loss"]
        np.testing.assert_allclose(evals[4], evals[0], rtol=1e-4)


class TestFp8TrainStep:
    @pytest.mark.parametrize("recipes", ["bf16", "default", "hybrid", "mxfp8",
                                         "int8_train"])
    def test_loss_decreases(self, recipes):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        trainer = Trainer(
            CFG,
            TrainConfig(learning_rate=5e-3, warmup_steps=1, total_steps=30,
                        recipes=recipes),
            attn_impl="ref",
        )
        state = trainer.init_state(params)
        batch = batch_of()
        losses = []
        for _ in range(15):
            state, m = trainer.train_step(state, batch)
            losses.append(float(m["loss"]))
        assert all(math.isfinite(l) for l in losses)
        assert losses[-1] < losses[0] * 0.9, losses

    def test_delayed_state_updates(self):
        recipes = recipe_set_by_name("default")
        params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
        trainer = Trainer(
            CFG, TrainConfig(recipes="default", warmup_steps=1), attn_impl="ref"
        )
        state = trainer.init_state(params)
        assert "mlp_down" in state.qstate and "attn_qkv" in state.qstate
        s0 = state.qstate["mlp_down"]["x"].scale.copy()
        state, _ = trainer.train_step(state, batch_of(1))
        state, _ = trainer.train_step(state, batch_of(2))
        # After steps, histories hold real amaxes and scales moved off init.
        assert float(jnp.max(state.qstate["mlp_down"]["x"].history)) > 0
        assert not np.allclose(
            np.asarray(state.qstate["mlp_down"]["x"].scale), np.asarray(s0)
        )
        # Backward amaxes (sink-gradient carrier) also observed.
        assert float(jnp.max(state.qstate["mlp_down"]["g"].history)) > 0

    def test_nonfinite_guard_skips_update(self):
        params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
        trainer = Trainer(CFG, TrainConfig(warmup_steps=1), attn_impl="ref")
        state = trainer.init_state(params)
        bad = batch_of()
        # Poison the final norm so every logit (and the loss) is NaN.
        poisoned = dict(state.params)
        poisoned["final_norm"] = state.params["final_norm"].at[0].set(jnp.nan)
        from llm_fp8_tpu.training.trainer import TrainState

        state_bad = TrainState(poisoned, state.opt_state, state.qstate, state.step)
        # Host copies before the step: donate_argnums invalidates the input.
        expected_norm = np.asarray(poisoned["final_norm"])
        step0 = int(state.step)
        new_state, m = trainer.train_step(state_bad, bad)
        assert int(m["finite"]) == 0
        # Params unchanged (skip-step), but step counter advanced.
        np.testing.assert_array_equal(
            np.asarray(new_state.params["final_norm"]), expected_norm
        )
        assert int(new_state.step) == step0 + 1

    def test_grad_accum_equivalent(self):
        # K micro-steps with accum == 1 step on the concatenated batch.
        params = init_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
        big = batch_of(0, B=8, S=32)
        halves = [
            {k: v[:4] for k, v in big.items()},
            {k: v[4:] for k, v in big.items()},
        ]
        cfg = TrainConfig(learning_rate=1e-2, warmup_steps=1, total_steps=10,
                          schedule="constant")

        t1 = Trainer(CFG, cfg, attn_impl="ref")
        s1 = t1.init_state(jax.tree_util.tree_map(jnp.copy, params))
        s1, _ = t1.train_step(s1, big)

        import dataclasses as dc

        t2 = Trainer(CFG, dc.replace(cfg, grad_accum=2), attn_impl="ref")
        s2 = t2.init_state(jax.tree_util.tree_map(jnp.copy, params))
        for h in halves:
            s2, _ = t2.train_step(s2, h)
        np.testing.assert_allclose(
            np.asarray(s1.params["final_norm"]),
            np.asarray(s2.params["final_norm"]),
            rtol=1e-4, atol=1e-5,
        )

    @pytest.mark.parametrize("policy", [True, "dots"])
    def test_remat_same_loss_and_grads(self, policy):
        params = init_params(CFG, jax.random.PRNGKey(8), dtype=jnp.float32)
        batch = batch_of(3)
        import dataclasses as dc

        base = TrainConfig(learning_rate=1e-3, warmup_steps=1,
                           recipes="default")
        a = Trainer(CFG, base, attn_impl="ref")
        b = Trainer(CFG, dc.replace(base, remat=policy), attn_impl="ref")
        sa = a.init_state(jax.tree_util.tree_map(jnp.copy, params))
        sb = b.init_state(jax.tree_util.tree_map(jnp.copy, params))
        sa, ma = a.train_step(sa, batch)
        sb, mb = b.train_step(sb, batch)
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sa.params["final_norm"]),
            np.asarray(sb.params["final_norm"]), rtol=1e-5, atol=1e-6,
        )

    def test_fp8_forward_close_to_bf16(self):
        params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
        recipes = recipe_set_by_name("default")
        qstate = init_train_quant_state(CFG, recipes)
        # Warm the delayed scales with one observation pass to avoid the
        # first-step scale=1 transient.
        batch = batch_of(4)
        logits_fp8, _ = forward_fp8_train(
            params, batch["input_ids"], CFG, recipes,
            forward_scales(qstate, CFG), make_sinks(CFG),
            attn_impl="ref", compute_dtype=jnp.float32,
        )
        logits_ref, _ = forward(
            params, batch["input_ids"], CFG, attn_impl="ref",
            compute_dtype=jnp.float32,
        )
        rel = np.linalg.norm(np.asarray(logits_fp8 - logits_ref)) / np.linalg.norm(
            np.asarray(logits_ref)
        )
        assert rel < 0.1, rel


class TestData:
    class _FakeTok:
        pad_token_id = 0
        eos_token_id = 0

        def __call__(self, text, truncation=True, max_length=None):
            ids = [ord(c) % 250 + 3 for c in text][:max_length]
            return {"input_ids": ids}

    def test_template_and_split(self):
        cfg = DataConfig(max_seq_length=64, num_of_samples=None, test_size=0.1)
        dm = DataManager(cfg, self._FakeTok())
        train, test = dm.build(synthetic_examples(50))
        assert len(train) == 45 and len(test) == 5
        assert all(len(s) <= 64 for s in train)

    def test_batches_static_shape(self):
        cfg = DataConfig(max_seq_length=60, batch_size=4)
        dm = DataManager(cfg, self._FakeTok())
        train, _ = dm.build(synthetic_examples(20))
        bs = list(dm.batches(train, 4, shuffle=False))
        assert all(b["input_ids"].shape == (4, 64) for b in bs)  # 60 -> 64
        assert all(b["attention_mask"].sum() > 0 for b in bs)

    def test_template_bytes(self):
        # Perplexity comparability: template text matches the reference's.
        from llm_fp8_tpu.training import CHAT_TEMPLATE

        t = CHAT_TEMPLATE.format(problem="P?", solution="S.")
        assert t.startswith("<|begin_of_text|><|start_header_id|>system")
        assert "\\boxed{}" in t
        assert "P?" in t and "S.<|eot_id|>" in t


class TestStability:
    def test_report_fields(self):
        tr = StabilityTracker("fp8-layerwise")
        rng = np.random.RandomState(0)
        for i in range(200):
            tr.track_step(
                2.0 * math.exp(-i / 60) + rng.randn() * 0.01,
                grad_norm=1.0 + rng.rand() * 0.1, lr=1e-5,
            )
        rep = tr.report()
        assert rep["steps"] == 200
        assert rep["loss_stats"]["std"] > 0
        assert rep["convergence_rate"] > 0
        assert 0 <= rep["oscillation_index"] <= 1
        assert rep["variance_stability_ratio"] < 1  # decaying loss stabilizes
        assert rep["non_finite_steps"] == 0

    def test_nonfinite_counted(self):
        tr = StabilityTracker()
        tr.track_step(float("nan"))
        tr.track_step(1.0)
        assert tr.report()["non_finite_steps"] == 1

    def test_activation_series(self):
        # Activation mean/std series (reference train_fp8.py:459-461).
        tr = StabilityTracker()
        for i in range(30):
            tr.track_step(1.0, activation_mean=0.01 * i, activation_std=1.0)
        tr.track_step(1.0, activation_mean=float("nan"))  # dropped
        rep = tr.report()
        assert len(tr.activation_mean) == 30
        assert rep["activation_mean_stats"]["max"] == pytest.approx(0.29)
        assert rep["activation_std_stats"]["mean"] == pytest.approx(1.0)

    def test_train_step_emits_activation_stats(self):
        # The jitted step computes mean/std of the final-norm hidden states
        # — they must be finite and match a direct forward's hidden stats.
        from llm_fp8_tpu.models.llama import forward as llama_forward

        trainer = Trainer(CFG, TrainConfig(learning_rate=1e-4))
        params = init_params(CFG, jax.random.PRNGKey(0))
        b = batch_of()
        # Reference stats first: train_step donates (deletes) the state.
        hidden, _ = llama_forward(
            params, b["input_ids"], CFG, return_hidden=True)
        h32 = np.asarray(hidden, np.float32)
        state = trainer.init_state(params)
        _, m = trainer.train_step(state, b)
        am, astd = float(m["activation_mean"]), float(m["activation_std"])
        assert math.isfinite(am) and math.isfinite(astd) and astd > 0
        np.testing.assert_allclose(am, h32.mean(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(astd, h32.std(), rtol=1e-3)


class TestAttentionDropout:
    """Training with attention dropout (flash_attn_func's dropout_p —
    round-1 gap; reference csrc/flash_attn/src/dropout.h)."""

    def test_train_with_dropout_loss_decreases(self):
        cfg = get_config("debug-tiny")
        trainer = Trainer(
            cfg,
            TrainConfig(recipes="bf16", warmup_steps=1, total_steps=50,
                        learning_rate=5e-3, attention_dropout=0.1),
            attn_impl="ref",
        )
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        state = trainer.init_state(params)
        batch = {
            "input_ids": jax.random.randint(
                jax.random.PRNGKey(1), (4, 32), 1, cfg.vocab_size
            ),
            "attention_mask": jnp.ones((4, 32), jnp.int32),
        }
        losses = []
        for _ in range(12):
            state, m = trainer.train_step(state, batch)
            assert bool(m["finite"])
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses

    def test_dropout_changes_loss_vs_no_dropout(self):
        cfg = get_config("debug-tiny")
        batch = {
            "input_ids": jax.random.randint(
                jax.random.PRNGKey(3), (2, 32), 1, cfg.vocab_size
            ),
            "attention_mask": jnp.ones((2, 32), jnp.int32),
        }

        def loss_with(rate):
            # Fresh params each run: the train step donates its input state.
            params = init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
            t = Trainer(
                cfg,
                TrainConfig(recipes="bf16", attention_dropout=rate),
                attn_impl="ref",
            )
            s = t.init_state(params)
            _, m = t.train_step(s, batch)
            return float(m["loss"])

        assert loss_with(0.0) != loss_with(0.5)

    def test_eval_has_no_dropout(self):
        # evaluate() runs the plain forward — dropout must not perturb eval.
        cfg = get_config("debug-tiny")
        params = init_params(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
        batch = {
            "input_ids": jax.random.randint(
                jax.random.PRNGKey(5), (2, 32), 1, cfg.vocab_size
            ),
        }
        t1 = Trainer(cfg, TrainConfig(recipes="bf16", attention_dropout=0.5),
                     attn_impl="ref")
        t1.init_state(params)
        t2 = Trainer(cfg, TrainConfig(recipes="bf16"), attn_impl="ref")
        t2.init_state(params)
        e1 = t1.evaluate(params, [batch])
        e2 = t2.evaluate(params, [batch])
        assert e1["eval_loss"] == e2["eval_loss"]


class TestPartialEvalBatch:
    def test_drop_last_false_pads_with_masked_rows(self):
        from llm_fp8_tpu.training.data import make_batches

        seqs = [np.arange(1, 6, dtype=np.int32)] * 5  # 5 seqs, batch 4
        full = list(make_batches(seqs, 4, max_len=8, drop_last=False))
        assert len(full) == 2
        tail = full[1]
        assert tail["input_ids"].shape == (4, 16)
        assert tail["attention_mask"][0].sum() == 5   # one real row
        assert tail["attention_mask"][1:].sum() == 0  # padded rows masked out
        dropped = list(make_batches(seqs, 4, max_len=8))
        assert len(dropped) == 1

    def test_eval_runs_on_tiny_split(self):
        # An eval split smaller than one batch must still produce tokens.
        from llm_fp8_tpu.training import TrainConfig, Trainer
        from llm_fp8_tpu.training.data import make_batches
        from llm_fp8_tpu.models import get_config, init_params

        cfg = get_config("debug-tiny")
        trainer = Trainer(cfg, TrainConfig(total_steps=2, recipes="bf16"),
                          attn_impl="ref")
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
        seqs = [np.arange(1, 9, dtype=np.int32)] * 3  # 3 seqs < batch 8
        ev = trainer.evaluate(
            params, make_batches(seqs, 8, max_len=16, drop_last=False)
        )
        assert ev["eval_tokens"] > 0
        assert np.isfinite(ev["eval_loss"])
