"""Ring attention vs single-device reference on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from llm_fp8_tpu.ops.attention import attention_ref
from llm_fp8_tpu.parallel.ring_attention import ring_attention


def run_ring(q, k, v, n_dev, causal):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("cp",))
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "cp", causal=causal),
        mesh=mesh,
        in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        out_specs=P(None, "cp"),
        check_rep=False,
    )
    return fn(q, k, v)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("n_dev", [2, 4])
def test_matches_reference(causal, n_dev):
    S = 256 * n_dev  # 256 per chip
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (1, S, 4, 64), jnp.float32)
    k = jax.random.normal(kk, (1, S, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, S, 2, 64), jnp.float32)
    got = run_ring(q, k, v, n_dev, causal)
    want = attention_ref(q, k, v, causal=causal)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("causal", [True, False])
def test_grad_matches_reference(causal):
    """Ring backward (second ring over the flash bwd kernels) vs jax.grad of
    the single-device reference — the long-context *training* capability."""
    n_dev = 4
    S = 128 * n_dev
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (1, S, 4, 64), jnp.float32)
    k = jax.random.normal(kk, (1, S, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, S, 2, 64), jnp.float32)

    def loss_ring(q, k, v):
        out = run_ring(q, k, v, n_dev, causal)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        out = attention_ref(q, k, v, causal=causal)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-2, atol=5e-2,
            err_msg=f"d{name}",
        )


def test_long_context_8way():
    # 8 chips × 128 = 1024 context; causal.
    S = 128 * 8
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (1, S, 2, 64), jnp.float32)
    k = jax.random.normal(kk, (1, S, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, S, 2, 64), jnp.float32)
    got = run_ring(q, k, v, 8, True)
    want = attention_ref(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


# ---------------------------------------------------------------------------
# Round-3 guard lift: window / softcap / ragged kv_lens ride the ring
# (Mistral / Gemma-2 families + ragged batches under context parallelism).
# ---------------------------------------------------------------------------

def run_ring_feat(q, k, v, n_dev, *, causal=True, window=None, softcap=None,
                  kv_lens=None):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("cp",))
    if kv_lens is None:
        fn = shard_map(
            lambda q, k, v: ring_attention(
                q, k, v, "cp", causal=causal, window=window, softcap=softcap),
            mesh=mesh, in_specs=(P(None, "cp"),) * 3,
            out_specs=P(None, "cp"), check_rep=False,
        )
        return fn(q, k, v)
    fn = shard_map(
        lambda q, k, v, lens: ring_attention(
            q, k, v, "cp", causal=causal, window=window, softcap=softcap,
            kv_lens=lens),
        mesh=mesh, in_specs=(P(None, "cp"),) * 3 + (P(None),),
        out_specs=P(None, "cp"), check_rep=False,
    )
    return fn(q, k, v, kv_lens)


@pytest.mark.fast
@pytest.mark.parametrize("feature", ["window", "softcap", "kv_lens",
                                     "window+kv_lens"])
def test_ring_features_match_reference(feature):
    n_dev = 4
    S = 128 * n_dev
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (2, S, 4, 64), jnp.float32)
    k = jax.random.normal(kk, (2, S, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (2, S, 2, 64), jnp.float32)
    kw = {}
    if "window" in feature:
        kw["window"] = 160  # spans chunk boundaries (chunk = 128)
    if feature == "softcap":
        kw["softcap"] = 30.0
    if "kv_lens" in feature:
        # Ragged: one sequence ends mid-chunk-1, the other mid-chunk-3.
        kw["kv_lens"] = jnp.array([200, 450], jnp.int32)
    got = run_ring_feat(q, k, v, n_dev, **kw)
    want = attention_ref(q, k, v, causal=True, **kw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("feature", ["window", "softcap"])
def test_ring_feature_grads_match_reference(feature):
    n_dev = 4
    S = 64 * n_dev
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(kq, (1, S, 4, 64), jnp.float32)
    k = jax.random.normal(kk, (1, S, 2, 64), jnp.float32)
    v = jax.random.normal(kv, (1, S, 2, 64), jnp.float32)
    kw = {"window": 96} if feature == "window" else {"softcap": 30.0}

    def loss_ring(q, k, v):
        return jnp.sum(run_ring_feat(q, k, v, n_dev, **kw) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref(q, k, v, causal=True, **kw) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2)
