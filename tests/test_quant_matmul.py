"""Fused dequant-matmul kernel vs the jnp composition (golden)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.quant import quantize, quantize_mx, qdot, E4M3
from llm_fp8_tpu.kernels.quant_matmul import qdot_fused


def rand(seed, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32) * scale


class TestQuantMatmul:
    @pytest.mark.parametrize("mode", ["tensor", "channel", "mx"])
    @pytest.mark.parametrize("M,K,N", [(8, 256, 512), (1, 128, 384), (100, 512, 256)])
    def test_matches_qdot(self, mode, M, K, N):
        x = rand(0, (M, K)).astype(jnp.bfloat16)
        w = rand(1, (K, N), 0.05)
        if mode == "mx":
            wq = quantize_mx(w, E4M3, block_axis=0)
        elif mode == "channel":
            wq = quantize(w, E4M3, axes=(0,))
        else:
            wq = quantize(w, E4M3)
        got = qdot_fused(x, wq)
        want = qdot(x, wq, impl="xla")
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_batched_lead_dims(self):
        x = rand(2, (2, 7, 128)).astype(jnp.bfloat16)
        w = rand(3, (128, 256), 0.05)
        wq = quantize(w, E4M3, axes=(0,))
        got = qdot_fused(x, wq)
        assert got.shape == (2, 7, 256)
        want = qdot(x.reshape(-1, 128), wq, impl="xla").reshape(2, 7, 256)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    @pytest.mark.exact
    def test_bit_twiddle_dequant_exact(self):
        """The select-chain dequant (``exact=True`` / LLM_FP8_DEQUANT=exact)
        must agree with ``astype`` bit-for-bit on every e4m3 value, including
        subnormals and zeros — asserted exactly even on TPU (the conftest
        tolerance floor is disabled by the ``exact`` marker)."""
        from llm_fp8_tpu.kernels.quant_matmul import _dequant_to

        all_bits = jnp.arange(256, dtype=jnp.uint8)
        vals = jax.lax.bitcast_convert_type(all_bits, jnp.float8_e4m3fn)
        vals = jnp.where(jnp.isnan(vals.astype(jnp.float32)), 0.0, vals)
        # bitcast has no eager eval rule — run the helper under jit.
        got = jax.jit(lambda v: _dequant_to(v, jnp.bfloat16, exact=True))(
            vals.reshape(16, 16)
        )
        want = vals.reshape(16, 16).astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )

    @pytest.mark.exact
    def test_ftz_dequant_exact_on_stored_domain(self):
        """The default (fast) dequant route is exact vs ``astype`` on every
        e4m3 code the framework stores: all normals and ±0. Subnormal codes
        — which ``quantize(flush_subnormal=True)`` never emits — flush to 0
        (documented FTZ semantics of ``e4m3_to_bf16_ftz``)."""
        from llm_fp8_tpu.kernels.quant_matmul import _dequant_to

        all_bits = jnp.arange(256, dtype=jnp.uint8)
        vals = jax.lax.bitcast_convert_type(all_bits, jnp.float8_e4m3fn)
        vals = jnp.where(jnp.isnan(vals.astype(jnp.float32)), 0.0, vals)
        got = np.asarray(jax.jit(
            lambda v: _dequant_to(v, jnp.bfloat16, exact=False)
        )(vals.reshape(16, 16)), np.float32).ravel()
        want = np.asarray(
            vals.reshape(16, 16).astype(jnp.bfloat16), np.float32
        ).ravel()
        em = np.arange(256) & 0x7F
        stored = em >= 8  # normal codes
        np.testing.assert_array_equal(got[stored], want[stored])
        # subnormals and zeros → ±0 under FTZ
        np.testing.assert_array_equal(got[~stored], np.zeros(np.sum(~stored)))

    @pytest.mark.exact
    def test_quantize_flush_subnormal_codes(self):
        """``flush_subnormal=True`` leaves no e4m3 subnormal codes in the
        stored payload (the fused kernel's FTZ contract), and touches only
        values below 2^-6 of the channel scale."""
        from llm_fp8_tpu.quant import quantize, quantize_mx, E4M3

        x = rand(11, (64, 96), 1.0)
        # plant values tiny relative to each channel's amax
        x = x.at[0, :].set(1e-6)
        for wq in (
            quantize(x, E4M3, axes=(0,), flush_subnormal=True),
            quantize_mx(x, E4M3, block_axis=0, flush_subnormal=True),
        ):
            bits = np.asarray(
                jax.jit(jax.lax.bitcast_convert_type,
                        static_argnums=1)(wq.qvalue, jnp.uint8))
            em = bits & 0x7F
            assert not np.any((em > 0) & (em < 8)), "subnormal codes stored"
            # flushed entries dequantize to exact zero; everything else
            # matches the unflushed quantization bit-for-bit
            ref = quantize(x, E4M3, axes=(0,), scale=None)
            assert np.all(
                np.asarray(wq.dequantize(jnp.float32))[np.asarray(em) == 0]
                == 0.0
            )

    def test_determinism(self):
        x = rand(4, (16, 256)).astype(jnp.bfloat16)
        wq = quantize(rand(5, (256, 512), 0.05), E4M3, axes=(0,))
        first = qdot_fused(x, wq)
        for _ in range(3):
            np.testing.assert_array_equal(
                np.asarray(first), np.asarray(qdot_fused(x, wq))
            )
