"""Engine-integrated speculative decoding (serving/spec_engine.py).

The reference's ``decode_speculative`` lives inside the same generation
runtime as its batching loop (``flash_attn/utils/generation.py:269-565``);
these tests pin the engine-level contract: speculative slots commit exactly
the tokens plain greedy slots would, under continuous batching (queueing +
mid-stream admission), for weak and perfect drafts, in both the greedy and
the rejection-sampling verify paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.models import get_config, init_params
from llm_fp8_tpu.serving import Engine, EngineConfig, SamplingParams, SpecEngine

CFG = get_config("debug-tiny")

ECFG = EngineConfig(
    max_slots=2, max_seq_len=256, kv_dtype=jnp.float32,
    prefill_buckets=(16, 32), attn_impl="ref",
)


@pytest.fixture(scope="module")
def models():
    target = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    return target, draft


def _prompts(n, rng):
    return [rng.integers(1, CFG.vocab_size, rng.integers(4, 14)).astype(np.int32)
            for _ in range(n)]


def _run(engine, prompts, max_new=12):
    sp = SamplingParams(max_new_tokens=max_new)
    reqs = [engine.add_request(p, sp) for p in prompts]
    engine.run()
    return [r.output for r in reqs]


def test_greedy_bitmatch_weak_draft(models):
    """3 requests through 2 slots: queueing + mid-stream admission; the
    speculative engine's committed streams bit-match plain greedy."""
    target, draft = models
    prompts = _prompts(3, np.random.default_rng(0))
    want = _run(Engine(target, CFG, ECFG), prompts)
    spec = SpecEngine(target, CFG, draft, CFG, ECFG, gamma=3)
    got = _run(spec, prompts)
    assert got == want
    # A random draft must see rejections somewhere.
    assert any(a < 3 for a in spec.accepted_histogram)


def test_perfect_draft_accepts_everything(models):
    target, _ = models
    prompts = _prompts(2, np.random.default_rng(1))
    want = _run(Engine(target, CFG, ECFG), prompts)
    spec = SpecEngine(target, CFG, target, CFG, ECFG, gamma=4)
    got = _run(spec, prompts)
    assert got == want
    # Self-draft agrees everywhere: full-gamma acceptance each round
    # (except possibly the final truncated round).
    assert max(spec.accepted_histogram) == 4


def test_sampled_path_topk1_reduces_to_greedy(models):
    """temperature>0 with top_k=1 exercises the rejection-sampling verify
    lane end-to-end, but both filtered distributions are one-hot — the
    committed stream must still bit-match plain greedy decoding."""
    target, draft = models
    prompts = _prompts(2, np.random.default_rng(2))
    want = _run(Engine(target, CFG, ECFG), prompts)
    spec = SpecEngine(target, CFG, draft, CFG, ECFG,
                      gamma=3, temperature=0.7, top_k=1)
    got = _run(spec, prompts)
    assert got == want


def test_sampled_path_runs_and_stays_in_vocab(models):
    target, draft = models
    spec = SpecEngine(target, CFG, draft, CFG, ECFG,
                      gamma=3, temperature=0.9, top_k=8, seed=3)
    outs = _run(spec, _prompts(2, np.random.default_rng(3)), max_new=10)
    for o in outs:
        assert len(o) == 10
        assert all(0 <= t < CFG.vocab_size for t in o)


def test_eos_stops_midblock(models):
    """An EOS committed mid-speculative-block retires the slot at the EOS,
    discarding the rest of the block — same truncation plain greedy gives."""
    target, draft = models
    prompts = _prompts(1, np.random.default_rng(4))
    base = Engine(target, CFG, ECFG, eos_token_id=None)
    [full] = _run(base, prompts, max_new=12)
    eos = full[5]  # force a stop mid-stream
    want = full[: full.index(eos) + 1]
    spec = SpecEngine(target, CFG, draft, CFG, ECFG, gamma=3,
                      eos_token_id=eos)
    [got] = _run(spec, prompts, max_new=12)
    assert got == want


def test_burst_rounds_match_single_round(models):
    """N speculative rounds chained in one dispatch (decode_burst budget)
    commit exactly what per-round dispatching commits — the lax.scan chain
    changes dispatch granularity only (r5: spec got the burst medicine)."""
    import dataclasses

    target, draft = models
    prompts = _prompts(3, np.random.default_rng(7))
    single_cfg = dataclasses.replace(ECFG, decode_burst=1)
    want = _run(SpecEngine(target, CFG, draft, CFG, single_cfg, gamma=3),
                prompts, max_new=14)
    burst = SpecEngine(target, CFG, draft, CFG, ECFG, gamma=3)
    assert burst._spec_rounds() == 1  # no active slots yet
    got = _run(burst, prompts, max_new=14)
    assert got == want
    # The burst engine must actually have chained rounds (histogram grows
    # by several rounds per host step when slots are active).
    assert burst.rounds_total >= 4
