"""Fused residual+RMSNorm kernel vs the jnp composition (fwd + grads)."""
import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.kernels.rmsnorm import rmsnorm_residual_fused
from llm_fp8_tpu.ops.rmsnorm import rmsnorm_residual


def data(key, B=2, S=100, D=256, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], (B, S, D), dtype)
    r = jax.random.normal(ks[1], (B, S, D), dtype)
    w = 1.0 + 0.1 * jax.random.normal(ks[2], (D,), dtype)
    return x, r, w


def test_forward_matches():
    x, r, w = data(0)
    y, s = rmsnorm_residual_fused(x, r, w)
    y_ref, s_ref = rmsnorm_residual(x, r, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match():
    x, r, w = data(1, S=64, D=128)

    def loss_fused(x, r, w):
        y, s = rmsnorm_residual_fused(x, r, w)
        return jnp.sum(y ** 2) + jnp.sum(jnp.sin(s))

    def loss_ref(x, r, w):
        y, s = rmsnorm_residual(x, r, w)
        return jnp.sum(y ** 2) + jnp.sum(jnp.sin(s))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, r, w)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, r, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bf16():
    x, r, w = data(2, dtype=jnp.bfloat16)
    y, s = rmsnorm_residual_fused(x, r, w)
    y_ref, s_ref = rmsnorm_residual(x, r, w)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )
