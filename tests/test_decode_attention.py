"""Decode fast-path attention vs the golden reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.ops.attention import attention, attention_ref, decode_attention


def mk(key, B, S, Hq, Hk, D):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return (
        jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32),
        jax.random.normal(ks[1], (B, S, Hk, D), jnp.float32),
        jax.random.normal(ks[2], (B, S, Hk, D), jnp.float32),
    )


class TestDecodeAttention:
    @pytest.mark.parametrize("Hq,Hk", [(8, 8), (8, 2), (4, 1)])
    def test_ragged_lens_match_reference(self, Hq, Hk):
        q, k, v = mk(0, 3, 256, Hq, Hk, 64)
        lens = jnp.array([10, 100, 256], jnp.int32)
        off = lens - 1
        got = decode_attention(q, k, v, kv_lens=lens, q_offset=off)
        want = attention_ref(q, k, v, causal=True, kv_lens=lens, q_offset=off)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_window(self):
        q, k, v = mk(1, 2, 128, 4, 2, 64)
        lens = jnp.array([128, 64], jnp.int32)
        off = lens - 1
        got = decode_attention(q, k, v, kv_lens=lens, q_offset=off, window=32)
        want = attention_ref(q, k, v, causal=True, kv_lens=lens, q_offset=off,
                             window=32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_auto_dispatch_uses_decode_for_single_token(self):
        # attention(impl="auto") on Sq==1 must equal the reference exactly.
        q, k, v = mk(2, 2, 64, 4, 2, 32)
        lens = jnp.array([30, 64], jnp.int32)
        got = attention(q, k, v, causal=True, kv_lens=lens, q_offset=lens - 1,
                        impl="auto")
        want = attention_ref(q, k, v, causal=True, kv_lens=lens,
                             q_offset=lens - 1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_empty_slot_produces_zeros(self):
        q, k, v = mk(3, 2, 64, 4, 2, 32)
        lens = jnp.array([0, 64], jnp.int32)  # slot 0 inactive
        got = decode_attention(q, k, v, kv_lens=lens, q_offset=lens - 1)
        assert np.all(np.isfinite(np.asarray(got)))
        np.testing.assert_allclose(np.asarray(got)[0], 0.0)


def test_kv_start_leftpad_semantics():
    """cache_leftpad parity (flash_attn_interface.py:1464+ semantics): a
    left-padded cache with kv_start must equal attention over the compacted
    (unpadded) cache, in both the decode fast path and its split variant."""
    import numpy as np

    rng = np.random.default_rng(3)
    B, S, Hq, Hk, D = 2, 128, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    starts = jnp.array([16, 48], jnp.int32)
    lens = jnp.array([100, 128], jnp.int32)
    got = decode_attention(q, k, v, q_offset=lens - 1, kv_lens=lens,
                           kv_start=starts)
    got_split = decode_attention(q, k, v, q_offset=lens - 1, kv_lens=lens,
                                 kv_start=starts, num_splits=4)
    # Golden: compact each sequence's [start, len) slice to the front.
    want = []
    for b in range(B):
        s0, s1 = int(starts[b]), int(lens[b])
        kc = jnp.zeros_like(k[b]).at[: s1 - s0].set(k[b, s0:s1])
        vc = jnp.zeros_like(v[b]).at[: s1 - s0].set(v[b, s0:s1])
        want.append(decode_attention(
            q[b : b + 1], kc[None], vc[None],
            q_offset=jnp.asarray([s1 - s0 - 1], jnp.int32),
            kv_lens=jnp.asarray([s1 - s0], jnp.int32),
        ))
    want = jnp.concatenate(want, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_split), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
