"""Sampling ops: greedy/top-k/top-p semantics (reference generation.py:45-97)."""
import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.ops.sampling import greedy, sample, _top_k_mask, _top_p_mask


def test_greedy():
    logits = jnp.asarray([[0.1, 3.0, -1.0], [2.0, 0.0, 5.0]])
    np.testing.assert_array_equal(np.asarray(greedy(logits)), [1, 2])


def test_temperature_zero_is_greedy():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    got = sample(logits, jax.random.PRNGKey(1), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(greedy(logits)))


def test_top_k_masks_all_but_k():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    masked = _top_k_mask(logits, 2)
    finite = np.isfinite(np.asarray(masked))[0]
    np.testing.assert_array_equal(finite, [False, True, False, False, True])


def test_top_k_sampling_stays_in_top_k():
    logits = jax.random.normal(jax.random.PRNGKey(2), (1, 100))
    top4 = set(np.argsort(np.asarray(logits)[0])[-4:].tolist())
    draws = set()
    for i in range(50):
        t = sample(logits, jax.random.PRNGKey(i), temperature=1.0, top_k=4)
        draws.add(int(t[0]))
    assert draws <= top4 and len(draws) > 1


def test_top_p_keeps_top_token_always():
    # Even with tiny p the argmax must survive (reference semantics).
    logits = jnp.asarray([[0.0, 10.0, 0.0]])
    masked = _top_p_mask(logits, 0.01)
    assert np.isfinite(np.asarray(masked)[0, 1])
    t = sample(logits, jax.random.PRNGKey(0), temperature=1.0, top_p=0.01)
    assert int(t[0]) == 1


def test_top_p_drops_tail():
    # One dominant token (p~0.98) with p=0.5: tail must be masked.
    logits = jnp.asarray([[8.0, 0.0, 0.0, 0.0]])
    masked = np.asarray(_top_p_mask(logits, 0.5))
    assert np.isfinite(masked[0, 0])
    assert not np.isfinite(masked[0, 1:]).any()


def test_distribution_roughly_matches_softmax():
    logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.1]]))
    counts = np.zeros(3)
    for i in range(300):
        counts[int(sample(logits, jax.random.PRNGKey(i))[0])] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=0.08)
