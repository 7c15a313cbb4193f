"""Attention dropout + softcap backward: kernel vs golden reference.

Mirrors the reference's dropout test strategy
(``tests/test_flash_attn.py`` parametrized ``dropout_p`` runs checked
against ``attention_ref`` with the extracted dropout mask, and
``test_flash_attn_race_condition`` determinism-by-repetition): here the
mask is a stateless counter hash shared verbatim by the kernel, the
backward, and the pure-jnp golden, so outputs must agree exactly-ish and
gradients must match analytically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.kernels.flash_attention import flash_attention
from llm_fp8_tpu.kernels._common import dropout_keep_mask
from llm_fp8_tpu.ops.attention import attention_ref


def make_qkv(key, B=2, Sq=160, Sk=160, Hq=4, Hk=2, D=64, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return (
        jax.random.normal(k1, (B, Sq, Hq, D), dtype),
        jax.random.normal(k2, (B, Sk, Hk, D), dtype),
        jax.random.normal(k3, (B, Sk, Hk, D), dtype),
    )


def test_keep_mask_rate_and_determinism():
    seed = jnp.asarray(123, jnp.int32)
    bh = jnp.asarray(5, jnp.int32)
    q_pos = jnp.arange(256, dtype=jnp.int32)[:, None]
    k_pos = jnp.arange(256, dtype=jnp.int32)[None, :]
    for rate in (0.1, 0.5, 0.9):
        keep = dropout_keep_mask(seed, bh, q_pos, k_pos, rate)
        frac = float(jnp.mean(keep.astype(jnp.float32)))
        assert abs(frac - (1 - rate)) < 0.02, (rate, frac)
        again = dropout_keep_mask(seed, bh, q_pos, k_pos, rate)
        np.testing.assert_array_equal(np.asarray(keep), np.asarray(again))
    # Different seeds decorrelate.
    a = dropout_keep_mask(seed, bh, q_pos, k_pos, 0.5)
    b = dropout_keep_mask(seed + 1, bh, q_pos, k_pos, 0.5)
    assert 0.3 < float(jnp.mean((a == b).astype(jnp.float32))) < 0.7


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_dropout_forward_matches_ref(rate):
    q, k, v = make_qkv(jax.random.PRNGKey(0))
    got = flash_attention(q, k, v, causal=True, dropout_p=rate,
                          dropout_seed=7)
    want = attention_ref(q, k, v, causal=True, dropout_p=rate,
                         dropout_seed=7)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_dropout_seed_changes_output_same_seed_repeats():
    q, k, v = make_qkv(jax.random.PRNGKey(1))
    a = np.asarray(flash_attention(q, k, v, dropout_p=0.3, dropout_seed=1))
    a2 = np.asarray(flash_attention(q, k, v, dropout_p=0.3, dropout_seed=1))
    b = np.asarray(flash_attention(q, k, v, dropout_p=0.3, dropout_seed=2))
    np.testing.assert_array_equal(a, a2)
    assert not np.allclose(a, b)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_dropout_grads_match_ref(rate):
    q, k, v = make_qkv(jax.random.PRNGKey(2), Sq=128, Sk=128)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, dropout_p=rate,
                            dropout_seed=11)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def loss_ref(q, k, v):
        o = attention_ref(q, k, v, causal=True, dropout_p=rate,
                          dropout_seed=11)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            a, b, rtol=5e-2, atol=5e-2, err_msg=f"d{name} rate={rate}"
        )


def test_softcap_backward_matches_ref():
    # Round-1 gap: softcap bwd raised NotImplementedError
    # (kernels/flash_attention.py:298-300 then). Now: analytic
    # dz/ds = 1 - tanh^2 threaded through the recompute.
    q, k, v = make_qkv(jax.random.PRNGKey(3), Sq=128, Sk=128)

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v, causal=True, softcap=20.0)
            return jnp.sum(o * jnp.sin(jnp.arange(o.size).reshape(o.shape)))
        return f

    g1 = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(attention_ref), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            a, b, rtol=5e-2, atol=5e-2, err_msg=f"d{name}"
        )


def test_softcap_window_dropout_combined_grads():
    q, k, v = make_qkv(jax.random.PRNGKey(4), Sq=128, Sk=128)
    kwargs = dict(causal=True, window=64, softcap=15.0, dropout_p=0.2,
                  dropout_seed=3)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v, **kwargs) ** 2)
        return f

    o1 = flash_attention(q, k, v, **kwargs)
    o2 = attention_ref(q, k, v, **kwargs)
    np.testing.assert_allclose(o1, o2, rtol=2e-2, atol=2e-2)
    g1 = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(attention_ref), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            a, b, rtol=5e-2, atol=5e-2, err_msg=f"d{name}"
        )


def test_deterministic_flag_accepted():
    q, k, v = make_qkv(jax.random.PRNGKey(5), Sq=64, Sk=64)
    a = flash_attention(q, k, v, deterministic=True)
    b = flash_attention(q, k, v, deterministic=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
