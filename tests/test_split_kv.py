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


# ---------------------------------------------------------------------------
# Decode-dispatch split path (ops/attention.py::_decode_attention_split) +
# the occupancy auto-heuristic (ops/split_kv.py::auto_num_splits) — the
# reference's C++ num_splits heuristic surface
# (csrc/flash_attn/flash_api.cpp num_splits_heuristic, hopper/heuristics.h).
# ---------------------------------------------------------------------------
import pytest

from llm_fp8_tpu.ops.attention import decode_attention
from llm_fp8_tpu.ops.split_kv import auto_num_splits


@pytest.mark.fast
@pytest.mark.parametrize("feature", [
    "plain", "ragged", "window", "softcap", "alibi", "chunk"])
def test_decode_split_matches_unsplit(feature):
    rng = np.random.default_rng(7)
    B, S, Hq, Hk, D = 3, 256, 4, 2, 32
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hk, D)), jnp.float32)
    lens = jnp.array([100, 170, 256], jnp.int32)
    kw = dict(q_offset=lens - 1, kv_lens=lens)
    if feature == "window":
        kw["window"] = 64
    elif feature == "softcap":
        kw["softcap"] = 20.0
    elif feature == "alibi":
        kw["alibi_slopes"] = jnp.asarray(rng.uniform(0.01, 0.2, Hq), jnp.float32)
    elif feature == "chunk":
        kw["attention_chunk"] = 64
    elif feature == "ragged":
        kw["kv_lens"] = jnp.array([1, 130, 250], jnp.int32)
        kw["q_offset"] = kw["kv_lens"] - 1
    want = decode_attention(q, k, v, **kw)
    got = decode_attention(q, k, v, num_splits=4, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_auto_num_splits_heuristic():
    # Single-core chip (v5e): never split — the grid runs sequentially.
    assert auto_num_splits(1, 8, 16384, num_cores=1) == 1
    assert auto_num_splits(8, 8, 16384, num_cores=1) == 1
    # Grid already fills the cores: no split.
    assert auto_num_splits(4, 8, 16384, num_cores=2) == 1
    # Megacore (v4/v5p), batch-1 MQA long cache: fill both cores.
    assert auto_num_splits(1, 1, 16384, num_cores=2) == 2
    # Short caches never split below the min chunk.
    assert auto_num_splits(1, 1, 1024, num_cores=2) == 1
    # Splits capped by chunk length and max_splits.
    assert auto_num_splits(1, 1, 4096, num_cores=16) == 4
    assert auto_num_splits(1, 1, 65536, num_cores=64) == 8
