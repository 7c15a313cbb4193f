"""Flash-attention kernel vs the golden reference.

Replicates the reference's kernel-test idiom
(``flash-attention-2.8.0/tests/test_flash_attn.py``): parametrize over
seqlen × heads × causal × feature axes, compare against the fp32 reference
implementation, plus determinism-by-repetition (their
``test_flash_attn_race_condition``, ``tests/test_flash_attn.py:2199``).

On CPU the kernel runs in Pallas interpreter mode (exact semantics, slow);
on TPU (LLM_FP8_TEST_TPU=1) it runs compiled.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.ops.attention import attention_ref
from llm_fp8_tpu.kernels.flash_attention import flash_attention


def make_qkv(key, B, Sq, Sk, Hq, Hk, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(kq, (B, Sq, Hq, D), dtype)
    k = jax.random.normal(kk, (B, Sk, Hk, D), dtype)
    v = jax.random.normal(kv, (B, Sk, Hk, D), dtype)
    return q, k, v


def assert_close(got, want, dtype):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    # On TPU the MXU computes f32 matmuls at default (bf16-passes) precision,
    # so f32 tolerances there match bf16; CPU interpreter mode is exact-ish.
    loose = dtype == jnp.bfloat16 or jax.default_backend() == "tpu"
    atol = 2e-2 if loose else 2e-5
    np.testing.assert_allclose(got, want, rtol=2e-2 if loose else 1e-4, atol=atol)


class TestFlashForward:
    @pytest.mark.parametrize("causal", [True, False])
    @pytest.mark.parametrize(
        "B,Sq,Sk,Hq,Hk,D",
        [
            (1, 128, 128, 2, 2, 64),   # MHA, single tile
            (2, 256, 256, 4, 2, 64),   # GQA, multi-tile
            (1, 128, 384, 2, 1, 64),   # MQA, cross lens
            (1, 512, 512, 2, 2, 64),   # 512-wide tiles (_auto_block default)
        ],
    )
    def test_matches_reference(self, causal, B, Sq, Sk, Hq, Hk, D):
        q, k, v = make_qkv(0, B, Sq, Sk, Hq, Hk, D)
        got = flash_attention(q, k, v, causal=causal)
        want = attention_ref(q, k, v, causal=causal)
        assert_close(got, want, q.dtype)

    def test_unaligned_seq_padding(self):
        # Sq=100, Sk=200: not tile multiples — wrapper pads and un-pads.
        q, k, v = make_qkv(1, 1, 100, 200, 2, 2, 64)
        got = flash_attention(q, k, v, causal=True)
        want = attention_ref(q, k, v, causal=True)
        assert_close(got, want, q.dtype)

    def test_kv_lens_masking(self):
        q, k, v = make_qkv(2, 2, 128, 256, 2, 2, 64)
        lens = jnp.array([100, 256], jnp.int32)
        got = flash_attention(q, k, v, causal=False, kv_lens=lens)
        want = attention_ref(q, k, v, causal=False, kv_lens=lens)
        assert_close(got, want, q.dtype)

    def test_q_offset_decode_semantics(self):
        # Decode: 1 query at absolute position 200 over a 256-cache.
        q, k, v = make_qkv(3, 1, 1, 256, 4, 2, 64)
        lens = jnp.array([201], jnp.int32)
        got = flash_attention(q, k, v, causal=True, q_offset=200, kv_lens=lens)
        want = attention_ref(q, k, v, causal=True, q_offset=200, kv_lens=lens)
        assert_close(got, want, q.dtype)

    def test_sliding_window(self):
        q, k, v = make_qkv(4, 1, 256, 256, 2, 2, 64)
        got = flash_attention(q, k, v, causal=True, window=64)
        want = attention_ref(q, k, v, causal=True, window=64)
        assert_close(got, want, q.dtype)

    def test_softcap(self):
        q, k, v = make_qkv(5, 1, 128, 128, 2, 2, 64)
        got = flash_attention(q, k, v, causal=True, softcap=30.0)
        want = attention_ref(q, k, v, causal=True, softcap=30.0)
        assert_close(got, want, q.dtype)

    @pytest.mark.parametrize("causal", [True, False])
    def test_alibi(self, causal):
        # Per-head slopes, GQA; the reference idiom draws random slopes
        # (tests/test_flash_attn.py:599).
        B, Sq, Sk, Hq, Hk, D = 2, 256, 256, 4, 2, 64
        q, k, v = make_qkv(8, B, Sq, Sk, Hq, Hk, D)
        slopes = jax.random.uniform(jax.random.PRNGKey(99), (B, Hq)) * 0.3
        got = flash_attention(q, k, v, causal=causal, alibi_slopes=slopes)
        want = attention_ref(q, k, v, causal=causal, alibi_slopes=slopes)
        assert_close(got, want, q.dtype)

    def test_alibi_per_head_vector_and_decode_offset(self):
        # [Hq]-shaped slopes broadcast over batch; q_offset aligns a decode
        # step's single query row against the cache (multi-tile KV so the
        # bias crosses tile boundaries).
        from llm_fp8_tpu.ops.attention import (
            decode_attention, default_alibi_slopes,
        )

        q, k, v = make_qkv(9, 2, 1, 384, 4, 4, 64)
        slopes = default_alibi_slopes(4)
        lens = jnp.array([384, 200], jnp.int32)
        got = flash_attention(
            q, k, v, causal=True, q_offset=lens - 1, kv_lens=lens,
            alibi_slopes=slopes,
        )
        want = attention_ref(
            q, k, v, causal=True, q_offset=lens - 1, kv_lens=lens,
            alibi_slopes=slopes,
        )
        assert_close(got, want, q.dtype)
        fast = decode_attention(
            q, k, v, q_offset=lens - 1, kv_lens=lens, alibi_slopes=slopes
        )
        assert_close(fast, want, q.dtype)

    @pytest.mark.parametrize("chunk_size", [64, 100])
    def test_attention_chunk(self, chunk_size):
        """Chunked attention (FA3/FA4 attention_chunk, Llama-4 style): a
        query attends only inside its own length-C chunk. Golden mask built
        independently here (the reference's construct_chunk_mask,
        flash_attn/utils/testing.py:194-224)."""
        B, S, Hq, Hk, D = 2, 256, 4, 2, 64
        q, k, v = make_qkv(20, B, S, S, Hq, Hk, D)

        got = flash_attention(q, k, v, causal=True,
                              attention_chunk=chunk_size)
        want = attention_ref(q, k, v, causal=True,
                             attention_chunk=chunk_size)
        assert_close(got, want, q.dtype)

        # Manual golden: mask = causal & same-chunk, dense softmax.
        qf = q.astype(jnp.float32) * (D ** -0.5)
        kf = jnp.repeat(k.astype(jnp.float32), Hq // Hk, axis=2)
        vf = jnp.repeat(v.astype(jnp.float32), Hq // Hk, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
        pos = np.arange(S)
        m = (pos[None, :] <= pos[:, None]) & (
            (pos[None, :] // chunk_size) == (pos[:, None] // chunk_size)
        )
        logits = jnp.where(jnp.asarray(m)[None, None], logits, -jnp.inf)
        manual = jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), vf
        )
        assert_close(got, manual, q.dtype)

    def test_attention_chunk_decode(self):
        # Decode at absolute position 200 with chunk 128: only keys
        # [128, 200] are visible.
        from llm_fp8_tpu.ops.attention import decode_attention

        q, k, v = make_qkv(21, 1, 1, 256, 4, 2, 64)
        lens = jnp.array([201], jnp.int32)
        got = decode_attention(q, k, v, q_offset=200, kv_lens=lens,
                               attention_chunk=128)
        want = attention_ref(q, k, v, causal=True, q_offset=200,
                             kv_lens=lens, attention_chunk=128)
        assert_close(got[:, 0], want[:, 0], q.dtype)

    def test_attention_chunk_backward(self):
        B, S, Hq, Hk, D = 1, 256, 2, 2, 64
        q, k, v = make_qkv(22, B, S, S, Hq, Hk, D)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, causal=True, attention_chunk=64)
                .astype(jnp.float32) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(
                attention_ref(q, k, v, causal=True, attention_chunk=64)
                .astype(jnp.float32) ** 2
            )

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            assert_close(a, b, q.dtype)

    def test_bf16(self):
        q, k, v = make_qkv(6, 1, 256, 256, 4, 2, 64, jnp.bfloat16)
        got = flash_attention(q, k, v, causal=True)
        want = attention_ref(q, k, v, causal=True)
        assert_close(got, want, jnp.bfloat16)

    def test_head_dim_128(self):
        q, k, v = make_qkv(7, 1, 128, 128, 2, 2, 128)
        got = flash_attention(q, k, v, causal=True)
        want = attention_ref(q, k, v, causal=True)
        assert_close(got, want, q.dtype)

    @pytest.mark.parametrize("causal", [True, False])
    @pytest.mark.parametrize(
        "B,S,Hq,Hk,D",
        [(1, 128, 2, 2, 64), (2, 256, 4, 2, 64), (1, 256, 4, 1, 128),
         # 512x512 tiles: the _auto_block default at training seqlens — the
         # backward holds several [512, 512] f32 intermediates in VMEM.
         (1, 512, 2, 2, 64)],
    )
    def test_backward_matches_reference(self, causal, B, S, Hq, Hk, D):
        q, k, v = make_qkv(20, B, S, S, Hq, Hk, D)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=causal) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_ref(q, k, v, causal=causal) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", g_flash, g_ref):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
            assert rel < 2e-2, (name, rel)

    def test_backward_kv_lens_and_padding(self):
        # Unaligned seq + ragged kv lens: padded tail grads must be exact 0.
        q, k, v = make_qkv(21, 2, 100, 100, 2, 2, 64)
        lens = jnp.array([60, 100], jnp.int32)

        def loss(q, k, v, impl):
            if impl == "flash":
                o = flash_attention(q, k, v, causal=True, kv_lens=lens)
            else:
                o = attention_ref(q, k, v, causal=True, kv_lens=lens)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "flash")
        gr = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, "ref")
        # TPU default-precision matmuls: rare single-element outliers reach
        # ~0.03 on O(0.3) grads; 5e-2 keeps the check meaningful.
        atol = 5e-2 if jax.default_backend() == "tpu" else 2e-3
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=atol
            )
        # dk/dv beyond each sequence's kv_len are zero.
        assert np.allclose(np.asarray(gf[1])[0, 60:], 0.0)

    @pytest.mark.parametrize("causal", [True, False])
    def test_backward_alibi(self, causal):
        q, k, v = make_qkv(23, 2, 256, 256, 4, 2, 64)
        slopes = jax.random.uniform(jax.random.PRNGKey(7), (2, 4)) * 0.3

        def lf(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, causal=causal, alibi_slopes=slopes)
                ** 2
            )

        def lr(q, k, v):
            return jnp.sum(
                attention_ref(q, k, v, causal=causal, alibi_slopes=slopes)
                ** 2
            )

        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            rel = np.linalg.norm(np.asarray(a) - np.asarray(b)) / max(
                np.linalg.norm(np.asarray(b)), 1e-9
            )
            assert rel < 2e-2, (name, rel)

    def test_backward_window(self):
        q, k, v = make_qkv(22, 1, 256, 256, 2, 2, 64)

        def lf(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=True, window=64) ** 2)

        def lr(q, k, v):
            return jnp.sum(attention_ref(q, k, v, causal=True, window=64) ** 2)

        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            rel = np.linalg.norm(np.asarray(a) - np.asarray(b)) / max(
                np.linalg.norm(np.asarray(b)), 1e-9
            )
            assert rel < 2e-2, rel

    @pytest.mark.parametrize("causal", [True, False])
    def test_segment_ids_packed_varlen(self, causal):
        # Three packed sequences per row; attention must not cross segments.
        q, k, v = make_qkv(30, 2, 256, 256, 4, 2, 64)
        seg = np.zeros((2, 256), np.int32)
        seg[0, :100] = 1; seg[0, 100:200] = 2; seg[0, 200:] = 3
        seg[1, :50] = 1; seg[1, 50:] = 2
        seg = jnp.asarray(seg)
        got = flash_attention(q, k, v, causal=causal,
                              q_segment_ids=seg, kv_segment_ids=seg)
        want = attention_ref(q, k, v, causal=causal,
                             q_segment_ids=seg, kv_segment_ids=seg)
        assert_close(got, want, q.dtype)

    def test_segment_ids_backward(self):
        q, k, v = make_qkv(31, 1, 256, 256, 2, 2, 64)
        seg = jnp.asarray(
            np.repeat(np.arange(4, dtype=np.int32), 64)[None, :]
        )

        def lf(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
            ) ** 2)

        def lr(q, k, v):
            return jnp.sum(attention_ref(
                q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
            ) ** 2)

        gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            rel = np.linalg.norm(np.asarray(a) - np.asarray(b)) / max(
                np.linalg.norm(np.asarray(b)), 1e-9
            )
            assert rel < 2e-2, rel

    def test_determinism_by_repetition(self):
        # The reference's race-condition test: repeated runs bit-identical.
        q, k, v = make_qkv(8, 2, 256, 256, 4, 2, 64, jnp.bfloat16)
        first = flash_attention(q, k, v, causal=True)
        for _ in range(3):
            again = flash_attention(q, k, v, causal=True)
            np.testing.assert_array_equal(np.asarray(first), np.asarray(again))


class TestAutoBlock:
    """_auto_block must not pick a tile whose padding dwarfs the work."""

    def test_exact_fills_use_big_tiles(self):
        from llm_fp8_tpu.kernels.flash_attention import _auto_block

        assert _auto_block(512) == 512
        assert _auto_block(1024) == 512
        assert _auto_block(256) == 256
        assert _auto_block(128) == 128
        assert _auto_block(1) == 128

    def test_padding_waste_bounded(self):
        from llm_fp8_tpu.kernels.flash_attention import _auto_block

        # Sk=520: 512-tiles would pad to 1024 (vs 640 at 128) — rejected.
        assert _auto_block(520) in (128, 256)
        # Sq=600: 512-tiles pad to 1024 vs 640 — rejected.
        assert _auto_block(600) in (128, 256)
        for seq in range(1, 2049, 7):
            b = _auto_block(seq)
            pad = -(-seq // b) * b
            base = -(-seq // 128) * 128
            assert pad <= 1.25 * base, (seq, b)


class TestFP8Compute:
    """FA3-semantics fp8-compute attention (hopper/flash_api.cpp:322-341):
    e4m3 q/k/v with per-(batch, kv-head) descales, P requantized to e4m3
    before PV. Contract: the native (fp8-operand dot) and dequant (bf16
    widen) routes agree; both track the fp32 reference on dequantized
    operands within fp8-quantization tolerance."""

    @staticmethod
    def _quantize_per_kvhead(x, Hk):
        # [B, S, H, D] -> e4m3 values + [B, Hk] descale (H groups over Hk).
        B, S, H, D = x.shape
        g = H // Hk
        xg = np.asarray(x, np.float32).reshape(B, S, Hk, g, D)
        amax = np.abs(xg).max(axis=(1, 3, 4))  # [B, Hk]
        descale = amax / 448.0
        q8 = jnp.asarray(
            xg / descale[:, None, :, None, None]
        ).astype(jnp.float8_e4m3fn).reshape(B, S, H, D)
        return q8, jnp.asarray(descale, jnp.float32)

    def _setup(self, seed, B, Sq, Sk, Hq, Hk, D):
        from llm_fp8_tpu.kernels.flash_attention import flash_attention_fp8

        q, k, v = make_qkv(seed, B, Sq, Sk, Hq, Hk, D)
        q8, qd = self._quantize_per_kvhead(q, Hk)
        k8, kd = self._quantize_per_kvhead(k, Hk)
        v8, vd = self._quantize_per_kvhead(v, Hk)
        deq = lambda t8, d, H: (  # noqa: E731
            t8.astype(jnp.float32).reshape(B, -1, Hk, H // Hk, D)
            * d[:, None, :, None, None]
        ).reshape(B, -1, H, D)
        return (flash_attention_fp8, (q8, k8, v8), (qd, kd, vd),
                (deq(q8, qd, Hq), deq(k8, kd, Hk), deq(v8, vd, Hk)))

    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_dequant_reference(self, causal):
        fn, (q8, k8, v8), (qd, kd, vd), (qf, kf, vf) = self._setup(
            40, 2, 128, 256, 4, 2, 64)
        got = fn(q8, k8, v8, q_descale=qd, k_descale=kd, v_descale=vd,
                 causal=causal, fp8_native=False)
        want = attention_ref(qf, kf, vf, causal=causal)
        # e4m3 P-requantization (3 mantissa bits) bounds the extra error.
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=6e-2, atol=6e-2)

    def test_native_and_dequant_routes_agree(self):
        # The same-numerics contract: identical quantized operands through
        # the fp8-operand dot vs the bf16-widen dot.
        fn, (q8, k8, v8), (qd, kd, vd), _ = self._setup(
            41, 1, 128, 128, 4, 2, 64)
        a = fn(q8, k8, v8, q_descale=qd, k_descale=kd, v_descale=vd,
               fp8_native=True, out_dtype=jnp.float32)
        b = fn(q8, k8, v8, q_descale=qd, k_descale=kd, v_descale=vd,
               fp8_native=False, out_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)

    def test_kv_lens_and_decode_offset(self):
        # Ragged decode shape: 1 query over a 256-cache at offset 200.
        fn, (q8, k8, v8), (qd, kd, vd), (qf, kf, vf) = self._setup(
            42, 2, 1, 256, 4, 2, 64)
        lens = jnp.array([201, 128], jnp.int32)
        got = fn(q8, k8, v8, q_descale=qd, k_descale=kd, v_descale=vd,
                 causal=True, q_offset=lens - 1, kv_lens=lens,
                 fp8_native=False)
        want = attention_ref(qf, kf, vf, causal=True, q_offset=lens - 1,
                             kv_lens=lens)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=6e-2, atol=6e-2)


@pytest.mark.fast
def test_fully_masked_rows_emit_zero_and_neginf_lse():
    """Feature-conjunction empty rows (sliding window entirely past a ragged
    kv_len) must produce out=0 / lse=-inf, not an average over masked keys —
    the masked scores are a finite MASK_VALUE, so without the dead-row
    epilogue the row normalizes garbage (caught by the CP ring combine,
    tests/test_ring_attention.py window+kv_lens)."""
    rng = np.random.default_rng(11)
    B, S, Hq, Hk, D = 2, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    kv_lens = jnp.array([64, 256], jnp.int32)
    # Batch 0 rows q >= 64+96-1: window (q-96, q] lies past kv_len 64 → empty.
    got = flash_attention(q, k, v, causal=True, window=96, kv_lens=kv_lens)
    want = attention_ref(q, k, v, causal=True, window=96, kv_lens=kv_lens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    assert np.all(np.asarray(got)[0, 200:] == 0.0)
    # Gradients through empty rows are zero, not NaN.
    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, causal=True, window=96, kv_lens=kv_lens) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
