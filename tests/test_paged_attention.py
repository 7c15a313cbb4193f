"""Paged-attention kernel vs the contiguous-cache reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.kernels.paged_attention import paged_attention
from llm_fp8_tpu.ops.attention import attention_ref


def build_paged(key, B, Hq, Hk, D, page, max_pages, lengths, dtype=jnp.float32):
    """Random contiguous K/V per sequence scattered into shuffled pages."""
    rng = np.random.RandomState(key)
    P = B * max_pages + 3  # physical pool larger than needed
    # pool-first layout [P, L=1, Hk, D, page]
    k_pages = np.zeros((P, 1, Hk, D, page), np.float32)
    v_pages = np.zeros((P, 1, Hk, D, page), np.float32)
    tables = np.zeros((B, max_pages), np.int32)
    k_contig = rng.randn(B, max_pages * page, Hk, D).astype(np.float32)
    v_contig = rng.randn(B, max_pages * page, Hk, D).astype(np.float32)
    perm = rng.permutation(P)
    nxt = 0
    for b in range(B):
        n_pages = -(-int(lengths[b]) // page)
        for i in range(n_pages):
            pg = int(perm[nxt]); nxt += 1
            tables[b, i] = pg
            chunk = slice(i * page, (i + 1) * page)
            k_pages[pg, 0] = k_contig[b, chunk].transpose(1, 2, 0)
            v_pages[pg, 0] = v_contig[b, chunk].transpose(1, 2, 0)
    return (
        jnp.asarray(k_pages, dtype), jnp.asarray(v_pages, dtype),
        jnp.asarray(tables), jnp.asarray(k_contig), jnp.asarray(v_contig),
    )


class TestPagedAttention:
    @pytest.mark.parametrize("Hq,Hk", [(8, 8), (8, 2), (4, 1)])
    def test_matches_reference(self, Hq, Hk):
        B, D, page, max_pages = 3, 64, 128, 4
        lengths = np.array([100, 256, 512], np.int32)
        kp, vp, tables, kc, vc = build_paged(0, B, Hq, Hk, D, page, max_pages,
                                             lengths)
        q = jax.random.normal(jax.random.PRNGKey(1), (B, Hq, D), jnp.float32)
        got = paged_attention(q, kp, vp, jnp.asarray(lengths), tables)
        want = attention_ref(
            q[:, None], kc, vc, causal=True,
            q_offset=jnp.asarray(lengths) - 1,
            kv_lens=jnp.asarray(lengths),
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )

    def test_fp8_pages(self):
        B, Hq, Hk, D, page, max_pages = 2, 4, 2, 64, 128, 3
        lengths = np.array([130, 384], np.int32)
        kp, vp, tables, kc, vc = build_paged(
            2, B, Hq, Hk, D, page, max_pages, lengths, dtype=jnp.float8_e4m3fn
        )
        q = jax.random.normal(jax.random.PRNGKey(3), (B, Hq, D), jnp.float32)
        got = paged_attention(q, kp, vp, jnp.asarray(lengths), tables)
        want = attention_ref(
            q[:, None], kc, vc, causal=True,
            q_offset=jnp.asarray(lengths) - 1, kv_lens=jnp.asarray(lengths),
        )[:, 0]
        # fp8 pages quantize K/V at ~6% relative error.
        rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(
            np.asarray(want)
        )
        assert rel < 0.1, rel

    @pytest.mark.parametrize("Hq,Hk", [(8, 8), (8, 2)])
    def test_alibi(self, Hq, Hk):
        """ALiBi bias in the paged kernel (Baichuan-13B paged serving)."""
        from llm_fp8_tpu.ops.attention import alibi_slopes_list

        B, D, page, max_pages = 2, 64, 128, 3
        lengths = np.array([130, 384], np.int32)
        kp, vp, tables, kc, vc = build_paged(7, B, Hq, Hk, D, page, max_pages,
                                             lengths)
        q = jax.random.normal(jax.random.PRNGKey(8), (B, Hq, D), jnp.float32)
        slopes = tuple(alibi_slopes_list(Hq))
        got = paged_attention(q, kp, vp, jnp.asarray(lengths), tables,
                              alibi_slopes=slopes)
        want = attention_ref(
            q[:, None], kc, vc, causal=True,
            q_offset=jnp.asarray(lengths) - 1, kv_lens=jnp.asarray(lengths),
            alibi_slopes=jnp.asarray(slopes, jnp.float32),
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
        )

    def test_zero_length_sequence(self):
        B, Hq, Hk, D, page, max_pages = 2, 4, 2, 64, 128, 2
        lengths = np.array([0, 128], np.int32)
        kp, vp, tables, kc, vc = build_paged(4, B, Hq, Hk, D, page, max_pages,
                                             np.array([128, 128], np.int32))
        q = jax.random.normal(jax.random.PRNGKey(5), (B, Hq, D), jnp.float32)
        got = paged_attention(q, kp, vp, jnp.asarray(lengths), tables)
        assert np.all(np.isfinite(np.asarray(got)))
        np.testing.assert_allclose(np.asarray(got)[0], 0.0)


class TestPagedWindowSoftcap:
    """Feature parity with the arena kernels: sliding window + softcap
    (reference paged decode supports window_size/softcap,
    hopper/flash_attn_interface.py:631-662)."""

    @pytest.mark.parametrize("window,softcap", [(64, None), (None, 25.0),
                                                (64, 25.0)])
    def test_matches_reference(self, window, softcap):
        B, Hq, Hk, D, page, max_pages = 2, 4, 2, 64, 128, 4
        lengths = np.array([512, 300], np.int32)
        kp, vp, tables, kc, vc = build_paged(
            5, B, Hq, Hk, D, page, max_pages, lengths
        )
        q = jax.random.normal(jax.random.PRNGKey(6), (B, Hq, D), jnp.float32)
        got = paged_attention(
            q, kp, vp, jnp.asarray(lengths), tables,
            window=window, softcap=softcap,
        )
        want = attention_ref(
            q[:, None], kc, vc, causal=True,
            q_offset=jnp.asarray(lengths) - 1,
            kv_lens=jnp.asarray(lengths),
            window=window, softcap=softcap,
        )[:, 0]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2,
            err_msg=f"window={window} softcap={softcap}",
        )
