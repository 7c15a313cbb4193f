"""Split-KV attention + LSE combine vs single-pass reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.ops.attention import attention_ref
from llm_fp8_tpu.ops.split_kv import combine_partials, split_kv_attention


def mk(key, B, Sq, Sk, Hq, Hk, D):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return (
        jax.random.normal(ks[0], (B, Sq, Hq, D), jnp.float32),
        jax.random.normal(ks[1], (B, Sk, Hk, D), jnp.float32),
        jax.random.normal(ks[2], (B, Sk, Hk, D), jnp.float32),
    )


@pytest.mark.parametrize("num_splits", [2, 4])
@pytest.mark.parametrize("causal", [True, False])
def test_matches_single_pass(num_splits, causal):
    q, k, v = mk(0, 2, 256, 512, 4, 2, 64)
    got = split_kv_attention(q, k, v, num_splits=num_splits, causal=causal)
    want = attention_ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_decode_with_ragged_lens():
    # Single-token decode over a long cache, ragged lengths spanning splits.
    q, k, v = mk(1, 3, 1, 512, 4, 2, 64)
    lens = jnp.array([100, 300, 512], jnp.int32)
    got = split_kv_attention(q, k, v, num_splits=4, causal=True,
                             q_offset=lens - 1, kv_lens=lens)
    want = attention_ref(q, k, v, causal=True, q_offset=lens - 1,
                         kv_lens=lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_combine_ignores_empty_chunks():
    outs = jnp.stack([jnp.ones((1, 1, 2, 4)), jnp.full((1, 1, 2, 4), 7.0)])
    lses = jnp.stack([jnp.zeros((1, 1, 2)), jnp.full((1, 1, 2), -jnp.inf)])
    got = combine_partials(outs, lses)
    np.testing.assert_allclose(np.asarray(got), 1.0)
