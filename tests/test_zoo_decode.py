"""KV-cache decode parity for the GPT-2 and NeoX model families.

The reference gives every zoo decoder the same ``generate()`` runtime
(``flash_attn/utils/generation.py:99-208``: InferenceParams prefill + single
-token decode). Here the equivalent contract is: ``family_forward(...,
cache=KVCache)`` must reproduce, position by position, the logits of the
cache-less full forward — prefill exact, then each decode step exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.models import init_kv_cache
from llm_fp8_tpu.models.gpt2 import GPT2_REGISTRY, init_gpt2_params, gpt2_forward
from llm_fp8_tpu.models.neox import NEOX_REGISTRY, init_neox_params, neox_forward
from llm_fp8_tpu.models.moe import MOE_REGISTRY, init_moe_params, moe_forward

B, PREFILL, TOTAL, ARENA = 2, 9, 13, 32

FAMILIES = {
    "debug-gpt2": (GPT2_REGISTRY, init_gpt2_params, gpt2_forward),
    "debug-opt": (GPT2_REGISTRY, init_gpt2_params, gpt2_forward),
    "debug-bigcode": (GPT2_REGISTRY, init_gpt2_params, gpt2_forward),
    "debug-btlm": (GPT2_REGISTRY, init_gpt2_params, gpt2_forward),  # ALiBi+muP
    "debug-neox": (NEOX_REGISTRY, init_neox_params, neox_forward),
    "debug-neox-seq": (NEOX_REGISTRY, init_neox_params, neox_forward),
    "debug-falcon": (NEOX_REGISTRY, init_neox_params, neox_forward),  # MQA
    "debug-gptj": (NEOX_REGISTRY, init_neox_params, neox_forward),
    "debug-mixtral": (MOE_REGISTRY, init_moe_params, moe_forward),  # MoE
    "debug-qwen3moe": (MOE_REGISTRY, init_moe_params, moe_forward),  # QK-norm MoE
}


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_decode_matches_full_forward(name):
    registry, init_fn, fwd = FAMILIES[name]
    cfg = registry[name]
    params = init_fn(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (B, TOTAL), 0, cfg.vocab_size
    )

    full = fwd(params, tokens, cfg, attn_impl="ref",
               compute_dtype=jnp.float32)
    # The MoE family returns (logits, cache) even cache-less.
    full = full[0] if isinstance(full, tuple) else full

    cache = init_kv_cache(cfg, B, ARENA, dtype=jnp.float32)
    lens = jnp.full((B,), PREFILL, jnp.int32)
    logits_p, cache = fwd(
        params, tokens[:, :PREFILL], cfg, cache=cache, start_pos=0,
        kv_lens=lens, attn_impl="ref", compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, :PREFILL]),
        rtol=1e-4, atol=1e-4,
    )

    for t in range(PREFILL, TOTAL):
        lens = jnp.full((B,), t, jnp.int32)
        step, cache = fwd(
            params, tokens[:, t:t + 1], cfg, cache=cache, start_pos=lens,
            kv_lens=lens + 1, attn_impl="ref", compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, t]),
            rtol=1e-4, atol=1e-4, err_msg=f"{name} decode step {t}",
        )


@pytest.mark.parametrize("name", ["debug-neox", "debug-btlm"])
def test_engine_serves_zoo_families(name):
    """The continuous-batching Engine drives non-Llama families via
    forward_fn (one generate() for the whole zoo) — greedy tokens must match
    a manual prefill+decode loop with the same cache."""
    from llm_fp8_tpu.models import resolve_model
    from llm_fp8_tpu.serving import Engine, EngineConfig, SamplingParams

    entry = resolve_model(name)
    cfg = entry.cfg
    params = entry.init_fn(cfg, jax.random.PRNGKey(4), dtype=jnp.float32)
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (12,), 1, cfg.vocab_size)
    )
    n_new = 6

    eng = Engine(
        params, cfg,
        EngineConfig(max_slots=2, max_seq_len=64, kv_dtype=jnp.bfloat16,
                     prefill_buckets=(16, 32)),
        forward_fn=entry.forward_fn,
    )
    eng.add_request(prompt, SamplingParams(max_new_tokens=n_new))
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == n_new

    # Manual greedy loop over the same bf16 cache (bucket-padded like the
    # engine's prefill so the compiled graphs are numerically identical).
    cache = init_kv_cache(cfg, 1, 16, dtype=jnp.bfloat16)
    padded = np.zeros((16,), np.int32)
    padded[:len(prompt)] = prompt
    logits, cache = entry.forward_fn(
        params, jnp.asarray(padded)[None], cfg, cache=cache, start_pos=0,
        kv_lens=jnp.asarray([len(prompt)], jnp.int32),
    )
    # Re-home the 16-slot prefill cache into a 64-slot arena (engine shape).
    big = init_kv_cache(cfg, 1, 64, dtype=jnp.bfloat16)
    big = type(big)(
        k=big.k.at[:, :, :16].set(cache.k), v=big.v.at[:, :, :16].set(cache.v),
        lens=cache.lens, k_scale=cache.k_scale, v_scale=cache.v_scale,
    )
    toks = [int(np.argmax(np.asarray(logits[0, len(prompt) - 1])))]
    pos = len(prompt)
    for _ in range(n_new - 1):
        lg, big = entry.forward_fn(
            params, jnp.asarray([[toks[-1]]], jnp.int32), cfg, cache=big,
            start_pos=jnp.asarray([pos], jnp.int32),
            kv_lens=jnp.asarray([pos + 1], jnp.int32),
        )
        toks.append(int(np.argmax(np.asarray(lg[0, 0]))))
        pos += 1
    assert done[0].output == toks, (done[0].output, toks)


@pytest.mark.parametrize("recipes,bound", [
    ("default", 0.05),
    ("int8", 0.05),
    # MXFP8's po2 block scales lose up to half a bit per 32-elem block vs
    # float per-channel scales; the tiny random-init debug model amplifies
    # that into a slightly larger relative logit error.
    ("mxfp8", 0.07),
])
def test_zoo_quantized_forward_close(recipes, bound):
    """quantize_zoo_params bakes per-channel/MX scales into the GPT-2/NeoX
    layer leaves; logits must stay close to the unquantized forward."""
    from llm_fp8_tpu.models import quantize_zoo_params
    from llm_fp8_tpu.quant import recipe_set_by_name

    registry, init_fn, fwd = FAMILIES["debug-neox"]
    cfg = registry["debug-neox"]
    params = init_fn(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    qparams = quantize_zoo_params(params, recipe_set_by_name(recipes))
    tokens = jax.random.randint(jax.random.PRNGKey(9), (2, 16), 0, 256)
    ref = fwd(params, tokens, cfg, attn_impl="ref", compute_dtype=jnp.float32)
    got = fwd(qparams, tokens, cfg, attn_impl="ref",
              compute_dtype=jnp.float32)
    rel = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < bound, rel


@pytest.mark.parametrize("name", ["debug-neox", "debug-gpt2"])
def test_trainer_trains_zoo_families(name):
    """One Trainer for the zoo: bf16 training (with 'dots' remat and
    attention dropout plumbed) drives the GPT-2/NeoX families via
    forward_fn; loss must fall on a memorizable batch."""
    from llm_fp8_tpu.models import resolve_model
    from llm_fp8_tpu.training import TrainConfig, Trainer

    entry = resolve_model(name)
    params = entry.init_fn(entry.cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    tr = Trainer(
        entry.cfg,
        TrainConfig(recipes="bf16", learning_rate=1e-3, warmup_steps=1,
                    total_steps=100, remat="dots"),
        attn_impl="ref", forward_fn=entry.forward_fn,
    )
    state = tr.init_state(params)
    batch = {
        "input_ids": jax.random.randint(
            jax.random.PRNGKey(7), (4, 32), 0, entry.cfg.vocab_size
        ),
        "attention_mask": jnp.ones((4, 32), jnp.int32),
    }
    losses = []
    for _ in range(8):
        state, m = tr.train_step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_trainer_fp8_zoo_raises():
    from llm_fp8_tpu.models import resolve_model
    from llm_fp8_tpu.training import TrainConfig, Trainer

    entry = resolve_model("debug-neox")
    with pytest.raises(ValueError, match="Llama/Qwen"):
        Trainer(entry.cfg, TrainConfig(recipes="default"),
                forward_fn=entry.forward_fn)


def test_fp8_kv_cache_decode_neox():
    """FP8 arenas work for the non-llama families through the shared
    cache_append_attend (quantize-on-store, descale-on-attend)."""
    cfg = NEOX_REGISTRY["debug-neox"]
    params = init_neox_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, 8), 0, 256)

    c16 = init_kv_cache(cfg, B, ARENA, dtype=jnp.float32)
    c8 = init_kv_cache(cfg, B, ARENA, dtype=jnp.float8_e4m3fn)
    lens = jnp.full((B,), 8, jnp.int32)
    l16, _ = neox_forward(params, tokens, cfg, cache=c16, start_pos=0,
                          kv_lens=lens, attn_impl="ref",
                          compute_dtype=jnp.float32)
    l8, _ = neox_forward(params, tokens, cfg, cache=c8, start_pos=0,
                         kv_lens=lens, attn_impl="ref",
                         compute_dtype=jnp.float32)
    # fp8 K/V storage: logits stay close, top-1 essentially unchanged.
    agree = np.mean(
        np.argmax(np.asarray(l8[:, -1]), -1)
        == np.argmax(np.asarray(l16[:, -1]), -1)
    )
    assert agree >= 0.99
