"""Auxiliary subsystems: checkpointing, fault-tolerant data, varlen, monitor."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.models import get_config, init_params, forward
from llm_fp8_tpu.ops.varlen import unpad_input, pad_input, pack_sequences, cu_seqlens
from llm_fp8_tpu.training import TrainConfig, Trainer
from llm_fp8_tpu.training.checkpoint import CheckpointManager, export_hf
from llm_fp8_tpu.training.data import ResumableBatches
from llm_fp8_tpu.utils.monitor import estimate_memory_gb, StepTimer

CFG = get_config("debug-tiny")


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        trainer = Trainer(CFG, TrainConfig(warmup_steps=1), attn_impl="ref")
        state = trainer.init_state(params)
        batch = {
            "input_ids": jnp.ones((2, 16), jnp.int32),
            "attention_mask": jnp.ones((2, 16), jnp.int32),
        }
        state, _ = trainer.train_step(state, batch)

        cm = CheckpointManager(str(tmp_path / "ckpts"), keep=2)
        cm.save(state, int(state.step), eval_loss=1.5)
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = cm.restore(template)
        np.testing.assert_array_equal(
            np.asarray(restored.params["final_norm"]),
            np.asarray(state.params["final_norm"]),
        )
        assert int(restored.step) == int(state.step)

    def test_cleanup_and_best(self, tmp_path):
        params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
        trainer = Trainer(CFG, TrainConfig(warmup_steps=1), attn_impl="ref")
        state = trainer.init_state(params)
        cm = CheckpointManager(str(tmp_path / "c"), keep=2)
        for step, loss in [(1, 3.0), (2, 1.0), (3, 2.0)]:
            cm.save(state, step, eval_loss=loss)
        names = sorted(os.listdir(tmp_path / "c"))
        assert "ckpt_1" not in names  # cleaned
        assert "ckpt_best" in names  # step 2 had the best loss
        assert "ckpt_2" in names and "ckpt_3" in names

    def test_hf_export_reloads_in_transformers(self, tmp_path):
        import torch
        from transformers import LlamaForCausalLM

        params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
        out = str(tmp_path / "hf")
        export_hf(params, CFG, out)
        model = LlamaForCausalLM.from_pretrained(out)
        tokens = np.arange(10, dtype=np.int64)[None]
        with torch.no_grad():
            hf_logits = model(torch.from_numpy(tokens)).logits.numpy()
        ours, _ = forward(params, jnp.asarray(tokens, jnp.int32), CFG,
                          compute_dtype=jnp.float32, attn_impl="ref")
        # TPU f32 matmuls run at default (bf16-pass) precision.
        tol = 2e-2 if jax.default_backend() == "tpu" else 2e-4
        np.testing.assert_allclose(np.asarray(ours), hf_logits,
                                   rtol=tol, atol=tol)


class TestResumableData:
    def _seqs(self):
        rng = np.random.RandomState(0)
        return [rng.randint(1, 100, rng.randint(5, 30)).astype(np.int32)
                for _ in range(37)]

    def test_resume_mid_epoch(self):
        seqs = self._seqs()
        a = ResumableBatches(seqs, 4, max_len=32, seed=7)
        it = iter(a)
        consumed = [next(it)["input_ids"] for _ in range(3)]
        saved = a.state_dict()

        b = ResumableBatches(seqs, 4, max_len=32, seed=0)
        b.load_state_dict(saved)
        rest_b = [x["input_ids"] for x in iter(b)]
        rest_a = [x["input_ids"] for x in it]
        assert len(rest_a) == len(rest_b)
        for x, y in zip(rest_a, rest_b):
            np.testing.assert_array_equal(x, y)

    def test_epochs_reshuffle(self):
        seqs = self._seqs()
        a = ResumableBatches(seqs, 4, max_len=32, seed=3)
        e0 = [x["input_ids"].copy() for x in iter(a)]
        e1 = [x["input_ids"].copy() for x in iter(a)]
        assert a.epoch == 2
        assert not all(np.array_equal(x, y) for x, y in zip(e0, e1))


class TestVarlen:
    def test_unpad_pad_roundtrip(self):
        x = jnp.arange(24, dtype=jnp.float32).reshape(2, 4, 3)
        mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 0]])
        packed, idx, n = unpad_input(x, mask)
        assert int(n) == 5
        restored = pad_input(packed, idx, 2, 4)
        np.testing.assert_array_equal(
            np.asarray(restored * mask[..., None]),
            np.asarray(x * mask[..., None]),
        )

    def test_pack_sequences(self):
        seqs = [np.array([1, 2, 3]), np.array([4, 5]), np.array([6] * 10)]
        toks, seg, pos = pack_sequences(seqs, total_len=8)
        np.testing.assert_array_equal(toks[:5], [1, 2, 3, 4, 5])
        np.testing.assert_array_equal(seg[:5], [1, 1, 1, 2, 2])
        np.testing.assert_array_equal(pos[:5], [0, 1, 2, 0, 1])
        assert np.all(seg[5:] == 0)  # third sequence dropped

    def test_cu_seqlens(self):
        np.testing.assert_array_equal(cu_seqlens([3, 2, 5]), [0, 3, 5, 10])


class TestMonitor:
    def test_memory_estimator(self):
        # 1B params bf16 + AdamW on 8 devices with sharding: ~1.5GB/device.
        gb = estimate_memory_gb(10 ** 9, n_devices=8, shard_params=True)
        assert 1.0 < gb < 2.0
        gb_1dev = estimate_memory_gb(10 ** 9)
        assert 11.0 < gb_1dev < 13.0  # 12 bytes/param

    def test_step_timer(self):
        t = StepTimer()
        t.step(100)
        t.step(100)
        r = t.rates()
        assert r["tokens_per_s"] > 0 and r["steps_per_s"] > 0


class TestBenchParamsParity:
    """Guard bench.py's direct-in-FP8 param builder against layout drift.

    ``bench._fake_quantized_params`` hand-builds LAYERWISE-quantized params
    (the bf16 intermediate of init+quantize would OOM at 8B scale); if
    ``quantize_params`` ever changes its layout the 8B bench would only fail
    at runtime on the chip. This pins the two to the same pytree structure,
    shapes and dtypes on a debug config.
    """

    def test_structure_matches_quantize_params(self):
        import dataclasses
        import bench

        from llm_fp8_tpu.models.llama import quantize_params as qp
        from llm_fp8_tpu.quant.recipe import recipe_set_by_name

        # 8B-shaped (untied lm_head, no qkv bias / qk-norm) at debug size.
        cfg = dataclasses.replace(
            get_config("debug-tiny"), tie_word_embeddings=False
        )
        real = qp(
            init_params(cfg, jax.random.PRNGKey(0)),
            recipe_set_by_name("default"),
        )
        fake = bench._fake_quantized_params(cfg)

        real_spec = [
            (jax.tree_util.keystr(path), leaf.shape, leaf.dtype)
            for path, leaf in jax.tree_util.tree_flatten_with_path(real)[0]
        ]
        fake_spec = [
            (jax.tree_util.keystr(path), leaf.shape, leaf.dtype)
            for path, leaf in jax.tree_util.tree_flatten_with_path(fake)[0]
        ]
        assert real_spec == fake_spec
