"""Paged engine: generation parity with the straight-line reference decode."""
import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models import get_config, init_params
from llm_fp8_tpu.serving import SamplingParams
from llm_fp8_tpu.serving.paged_engine import PagedEngine, PagedEngineConfig
from tests.test_serving import reference_greedy

CFG = get_config("debug-tiny")

# TPU requires 128-multiple pages (lane-aligned DMA); CPU interpret mode
# tests the small-page configuration too.
PAGE = 128 if jax.default_backend() == "tpu" else 32


def make_engine(params, slots=2, kv_dtype=jnp.float32, num_pages=32):
    return PagedEngine(
        params, CFG,
        PagedEngineConfig(
            max_slots=slots, num_pages=num_pages, page_size=PAGE,
            max_pages_per_seq=8, kv_dtype=kv_dtype,
            prefill_buckets=(PAGE, 2 * PAGE, 4 * PAGE), attn_impl="ref",
        ),
    )


class TestPagedEngine:
    def test_single_request_matches_reference(self):
        params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
        prompt = np.arange(1, 9, dtype=np.int32)
        want = reference_greedy(params, prompt, 8)
        eng = make_engine(params)
        eng.add_request(prompt, SamplingParams(max_new_tokens=8))
        done = eng.run()
        assert done[0].output == want
        assert eng.pages_in_use == 0  # retired request released its pages

    def test_concurrent_isolated_and_page_reuse(self):
        params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
        prompts = [
            np.arange(1, 6, dtype=np.int32),
            ((np.arange(PAGE + 3, dtype=np.int32) * 3) % 200) + 1,  # crosses a page boundary
            np.arange(200, 210, dtype=np.int32),
        ]
        wants = [reference_greedy(params, p, 6) for p in prompts]
        eng = make_engine(params, slots=2)
        for p in prompts:
            eng.add_request(p, SamplingParams(max_new_tokens=6))
        done = sorted(eng.run(), key=lambda r: r.request_id)
        assert [r.output for r in done] == wants
        assert eng.pages_in_use == 0

    def test_decode_across_page_boundary(self):
        # Prompt of PAGE-2 tokens + 8 generated crosses the page edge.
        params = init_params(CFG, jax.random.PRNGKey(2), dtype=jnp.float32)
        prompt = (np.arange(PAGE - 2, dtype=np.int32) % 200) + 1
        want = reference_greedy(params, prompt, 8)
        eng = make_engine(params)
        eng.add_request(prompt, SamplingParams(max_new_tokens=8))
        assert eng.run()[0].output == want

    def test_pool_exhaustion_queues(self):
        params = init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
        # 7 usable pages (8 minus scratch); each request needs 2 pages
        # (PAGE+8 tokens) -> only 3 fit at once.
        eng = make_engine(params, slots=4, num_pages=8)
        prompts = [((np.arange(PAGE + 2, dtype=np.int32) + i) % 200) + 1
                   for i in range(4)]
        wants = [reference_greedy(params, p, 8) for p in prompts]
        for p in prompts:
            eng.add_request(p, SamplingParams(max_new_tokens=8))
        done = sorted(eng.run(), key=lambda r: r.request_id)
        assert [r.output for r in done] == wants
        assert eng.pages_in_use == 0

    def test_fp8_pages_run(self):
        params = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
        eng = make_engine(params, kv_dtype=jnp.float8_e4m3fn)
        req = eng.add_request(np.arange(1, 12, dtype=np.int32),
                              SamplingParams(max_new_tokens=6))
        done = eng.run()
        assert len(done[0].output) == 6
        assert all(0 <= t < CFG.vocab_size for t in done[0].output)

    def test_int8_pages_run(self):
        """int8 pages with an explicit kv_scale (the paged engine's scale is
        deployment-calibrated, unlike the arena engine's auto-calibration);
        values round-to-nearest and saturate at ±127 on store."""
        params = init_params(CFG, jax.random.PRNGKey(4), dtype=jnp.float32)
        eng = PagedEngine(
            params, CFG,
            PagedEngineConfig(
                max_slots=2, page_size=PAGE, num_pages=32,
                max_pages_per_seq=8, kv_dtype=jnp.int8, kv_scale=1 / 16,
                prefill_buckets=(32,), attn_impl="ref",
            ),
        )
        eng.add_request(np.arange(1, 12, dtype=np.int32),
                        SamplingParams(max_new_tokens=6))
        done = eng.run()
        assert len(done[0].output) == 6
        assert all(0 <= t < CFG.vocab_size for t in done[0].output)
        # stored pages must be integers within range (round-trip sanity)
        pages = np.asarray(eng.k_pages.astype(jnp.float32))
        assert np.abs(pages).max() <= 127


class TestDecodeBurst:
    """Burst decode (N steps per dispatch) must be invisible in outputs:
    token-for-token equal to per-step decode (decode_burst=1) on every
    admission/EOS pattern."""

    def _pair(self, params, slots=2, **cfg_kw):
        kw = dict(max_slots=slots, num_pages=32, page_size=PAGE,
                  max_pages_per_seq=8, kv_dtype=jnp.float32,
                  prefill_buckets=(PAGE, 2 * PAGE, 4 * PAGE),
                  attn_impl="ref")
        kw.update(cfg_kw)
        burst = PagedEngine(params, CFG, PagedEngineConfig(**kw))
        step = PagedEngine(params, CFG,
                           PagedEngineConfig(**kw, decode_burst=1))
        return burst, step

    def test_burst_matches_per_step(self):
        params = init_params(CFG, jax.random.PRNGKey(7), dtype=jnp.float32)
        prompts = [np.arange(1, 9, dtype=np.int32),
                   np.arange(40, 61, dtype=np.int32),
                   ((np.arange(PAGE + 5, dtype=np.int32) * 7) % 200) + 1]
        burst, step = self._pair(params)
        for p in prompts:
            burst.add_request(p, SamplingParams(max_new_tokens=20))
            step.add_request(p, SamplingParams(max_new_tokens=20))
        got = sorted(burst.run(), key=lambda r: r.request_id)
        want = sorted(step.run(), key=lambda r: r.request_id)
        assert [r.output for r in got] == [r.output for r in want]
        assert burst.pages_in_use == 0

    def test_eos_mid_burst_truncates(self):
        """A slot hitting EOS inside a burst must stop exactly there; the
        discarded burst tail must not leak into the output or corrupt the
        other slot's stream."""
        params = init_params(CFG, jax.random.PRNGKey(8), dtype=jnp.float32)
        p1 = np.arange(1, 9, dtype=np.int32)
        p2 = np.arange(100, 116, dtype=np.int32)
        # Pick the 3rd generated token of p1 as its EOS so it dies mid-burst.
        probe = PagedEngine(params, CFG, PagedEngineConfig(
            max_slots=1, num_pages=32, page_size=PAGE, max_pages_per_seq=8,
            kv_dtype=jnp.float32, prefill_buckets=(PAGE,), attn_impl="ref"))
        probe.add_request(p1, SamplingParams(max_new_tokens=8))
        eos = probe.run()[0].output[2]
        burst, step = self._pair(params)
        sp = SamplingParams(max_new_tokens=16, stop_token_ids=(eos,))
        for eng in (burst, step):
            eng.add_request(p1, sp)
            eng.add_request(p2, SamplingParams(max_new_tokens=16))
        got = sorted(burst.run(), key=lambda r: r.request_id)
        want = sorted(step.run(), key=lambda r: r.request_id)
        assert [r.output for r in got] == [r.output for r in want]
        assert got[0].output[-1] == eos and len(got[0].output) == 3

    def test_sampled_requests_disable_burst(self):
        """temperature>0 needs per-step host sampling: burst must fall back
        (correctness over speed) and still produce max_new tokens."""
        params = init_params(CFG, jax.random.PRNGKey(9), dtype=jnp.float32)
        burst, _ = self._pair(params, slots=1)
        burst.add_request(np.arange(1, 9, dtype=np.int32),
                          SamplingParams(max_new_tokens=6, temperature=0.8))
        assert burst._burst_size() in (1,)  # pre-admission: no active slots
        done = burst.run()
        assert len(done[0].output) == 6

    def test_waiting_queue_caps_burst(self):
        """With a queued request, bursts cap at 8 so the freed slot is
        refilled promptly; outputs still match per-step exactly."""
        params = init_params(CFG, jax.random.PRNGKey(10), dtype=jnp.float32)
        prompts = [np.arange(1, 7, dtype=np.int32),
                   np.arange(30, 38, dtype=np.int32),
                   np.arange(60, 70, dtype=np.int32)]
        burst, step = self._pair(params, slots=1)  # forces queueing
        for p in prompts:
            burst.add_request(p, SamplingParams(max_new_tokens=12))
            step.add_request(p, SamplingParams(max_new_tokens=12))
        got = sorted(burst.run(), key=lambda r: r.request_id)
        want = sorted(step.run(), key=lambda r: r.request_id)
        assert [r.output for r in got] == [r.output for r in want]
