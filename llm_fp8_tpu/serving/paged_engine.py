"""Paged continuous-batching engine: block-table KV pool + paged flash decode.

The full paged serving stack (BASELINE.json north star: "paged FP8 KV arena,
continuous batching"): the native block allocator
(``csrc/block_allocator.cpp``) hands out refcounted pages from one physical
pool shared by every request and layer; prefill K/V scatters into pages; the
decode step runs :func:`llm_fp8_tpu.models.llama.forward_paged` (append +
paged flash kernel) over all slots at their own positions.

Compared to the arena :class:`~llm_fp8_tpu.serving.engine.Engine`, memory is
allocated per-page as sequences grow instead of ``max_slots × max_seq_len``
up front — fragmentation-free long-context serving (the property the
reference gets from vLLM's paged attention in its deployment study,
``thesis/chapters/c3/c3_methodology.tex:46-52``).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models.config import ModelConfig
from llm_fp8_tpu.models.llama import forward, forward_paged
from llm_fp8_tpu.ops.sampling import greedy, sample

from .block_table import BlockAllocator, SequenceTable
from .engine import Request, SamplingParams

__all__ = ["PagedEngineConfig", "PagedEngine"]


@dataclasses.dataclass(frozen=True)
class PagedEngineConfig:
    max_slots: int = 8
    num_pages: int = 256  # physical pool size
    page_size: int = 128
    max_pages_per_seq: int = 16  # block-table width (max_seq = this × page)
    # "auto": fp8 on fp8-native backends, bf16 on v5e/CPU (docs/PERF_NOTES.md).
    kv_dtype: Any = "auto"
    kv_scale: float = 1.0
    prefill_buckets: tuple = (128, 256, 512, 1024)
    attn_impl: str = "auto"
    # Max decode steps fused into ONE device dispatch (lax.scan burst).
    # Per-token host round-trips dominate decode over a remote tunnel
    # (measured 89 ms/step at 8k context, of which ~84 ms is dispatch+sync);
    # a burst amortizes that across up to this many tokens. Safe because
    # admission reserves pages for prompt+max_new up front, so block tables
    # are static across a burst; EOS inside a burst is handled by host-side
    # truncation of the fetched token block. 1 disables (per-step decode).
    decode_burst: int = 32

    def __post_init__(self):
        for b in self.prefill_buckets:
            if b % self.page_size != 0:
                raise ValueError(
                    f"prefill bucket {b} must be a multiple of page_size "
                    f"{self.page_size} (a bucket smaller than one page would "
                    "silently drop the prompt's K/V)"
                )


class PagedEngine:
    def __init__(
        self,
        params: Dict[str, Any],
        model_cfg: ModelConfig,
        engine_cfg: PagedEngineConfig = PagedEngineConfig(),
        *,
        eos_token_id: Optional[int] = None,
    ):
        from llm_fp8_tpu.utils.backend import resolve_kv_dtype

        self.params = params
        self.cfg = model_cfg
        engine_cfg = dataclasses.replace(
            engine_cfg, kv_dtype=resolve_kv_dtype(engine_cfg.kv_dtype)
        )
        self.ecfg = engine_cfg
        self.eos = eos_token_id
        L, Hk, Dh = model_cfg.num_layers, model_cfg.num_kv_heads, model_cfg.head_dim
        P, page = engine_cfg.num_pages, engine_cfg.page_size
        self.k_pages = jnp.zeros((P, L, Hk, Dh, page), engine_cfg.kv_dtype)
        self.v_pages = jnp.zeros((P, L, Hk, Dh, page), engine_cfg.kv_dtype)
        # Physical page P-1 is the scratch sink: inactive decode slots and
        # prefill bucket-tail chunks write there, never to a live page.
        self.scratch_page = P - 1
        self.allocator = BlockAllocator(P - 1, page)

        B = engine_cfg.max_slots
        self.slot_req: List[Optional[Request]] = [None] * B
        self.slot_tables: List[Optional[SequenceTable]] = [None] * B
        self.slot_lens = np.zeros((B,), np.int32)
        self.slot_last_tok = np.zeros((B,), np.int32)
        self.waiting: List[Request] = []
        self._next_id = 0
        self._rng = jax.random.PRNGKey(0)

        self._prefill = jax.jit(
            self._prefill_impl, static_argnames=("bucket",),
        )
        self._insert = jax.jit(self._insert_impl, static_argnames=("n_pages",),
                               donate_argnums=(0, 1))
        self._decode = jax.jit(self._decode_impl, donate_argnums=(1, 2))
        self._decode_burst = jax.jit(
            self._decode_burst_impl, static_argnames=("steps",),
            donate_argnums=(1, 2),
        )

    # ------------------------------------------------------------------

    def _prefill_impl(self, params, tokens, true_len, *, bucket):
        """Prompt forward returning per-layer K/V for page insertion."""
        logits, kv = forward(
            params, tokens[None, :], self.cfg, kv_lens=true_len[None],
            attn_impl=self.ecfg.attn_impl, return_kv=True,
        )
        k, v = kv  # [L, 1, bucket, Hk, Dh]
        return logits[0, true_len - 1], k[:, 0], v[:, 0]

    def _insert_impl(self, k_pages, v_pages, k_new, v_new, page_ids, *, n_pages):
        """Scatter prefill K/V ([L, bucket, Hk, Dh]) into the pools.

        Page i of the prompt goes to physical page ``page_ids[i]``, stored
        lane-major ([L, Hk, Dh, page]).
        """
        page = self.ecfg.page_size
        scale = self.ecfg.kv_scale

        def put(pools, new):
            # new: [L, bucket, Hk, Dh] -> per page [L, Hk, Dh, page]
            def one(i, pools):
                chunk = jax.lax.dynamic_slice_in_dim(new, i * page, page, 1)
                chunk = chunk.astype(jnp.float32) / scale
                if pools.dtype != new.dtype:
                    # Saturate before the narrow cast (fp8 overflow -> NaN;
                    # int8 astype would wrap), round for integer storage.
                    if jnp.issubdtype(pools.dtype, jnp.integer):
                        fmax = float(jnp.iinfo(pools.dtype).max)
                        chunk = jnp.round(jnp.clip(chunk, -fmax, fmax))
                    else:
                        fmax = float(jnp.finfo(pools.dtype).max)
                        chunk = jnp.clip(chunk, -fmax, fmax)
                chunk = chunk.astype(pools.dtype)
                chunk = chunk.transpose(0, 2, 3, 1)  # [L, Hk, Dh, page]
                return jax.lax.dynamic_update_slice(
                    pools, chunk[None], (page_ids[i], 0, 0, 0, 0)
                )

            return jax.lax.fori_loop(0, n_pages, one, pools)

        return put(k_pages, k_new), put(v_pages, v_new)

    def _decode_impl(self, params, k_pages, v_pages, toks, tables, lens):
        logits, k_pages, v_pages = forward_paged(
            params, toks[:, None], self.cfg, k_pages, v_pages, tables, lens,
            kv_scale=self.ecfg.kv_scale,
        )
        logits = logits[:, 0]
        return logits, jnp.argmax(logits, -1).astype(jnp.int32), k_pages, v_pages

    def _decode_burst_impl(self, params, k_pages, v_pages, toks, tables,
                           lens, *, steps):
        """``steps`` greedy decode steps as ONE dispatch (lax.scan).

        Returns the [steps, slots] token block; the host truncates each
        slot's column at EOS/max_new. Tables are static across the burst
        (pages for prompt+max_new are reserved at admission)."""
        def body(carry, _):
            toks, lens, k_pages, v_pages = carry
            logits, k_pages, v_pages = forward_paged(
                params, toks[:, None], self.cfg, k_pages, v_pages, tables,
                lens, kv_scale=self.ecfg.kv_scale,
            )
            toks = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (toks, lens + 1, k_pages, v_pages), toks

        (toks, lens, k_pages, v_pages), out = jax.lax.scan(
            body, (toks, lens, k_pages, v_pages), None, length=steps
        )
        return out, k_pages, v_pages

    # ------------------------------------------------------------------

    def add_request(self, prompt: np.ndarray,
                    params: SamplingParams = SamplingParams()) -> Request:
        req = Request(
            request_id=self._next_id, prompt=np.asarray(prompt, np.int32),
            params=params, enqueue_time=time.perf_counter(),
        )
        self._next_id += 1
        self.waiting.append(req)
        return req

    def _bucket_for(self, n: int) -> int:
        for b in self.ecfg.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds max bucket")

    def has_work(self) -> bool:
        return bool(self.waiting) or any(r is not None for r in self.slot_req)

    def step(self) -> List[Request]:
        finished: List[Request] = []
        page = self.ecfg.page_size

        # --- admission ---
        for slot in range(self.ecfg.max_slots):
            if not self.waiting or self.slot_req[slot] is not None:
                continue
            req = self.waiting[0]
            n = len(req.prompt)
            total = n + req.params.max_new_tokens
            if (total > self.ecfg.max_pages_per_seq * page
                    or n > self.ecfg.prefill_buckets[-1]):
                # Reject: too long for the table width / any prefill bucket
                # (checked BEFORE popping or allocating — a late _bucket_for
                # raise would abort the loop and leak the allocated pages).
                self.waiting.pop(0)
                req.done = True
                finished.append(req)
                continue
            table = SequenceTable(self.allocator)
            if not table.ensure_capacity(total):
                break  # pool exhausted: wait for running requests to finish
            self.waiting.pop(0)
            bucket = self._bucket_for(n)
            padded = np.zeros((bucket,), np.int32)
            padded[:n] = req.prompt
            last_logits, k_new, v_new = self._prefill(
                self.params, jnp.asarray(padded),
                jnp.asarray(n, jnp.int32), bucket=bucket,
            )
            n_pages = bucket // page
            used = -(-n // page)
            ids = np.full((n_pages,), self.scratch_page, np.int32)
            ids[:used] = table.blocks[:used]
            self.k_pages, self.v_pages = self._insert(
                self.k_pages, self.v_pages, k_new, v_new,
                jnp.asarray(ids), n_pages=n_pages,
            )
            tok = int(self._sample_one(last_logits, req.params))
            req.first_token_time = time.perf_counter()
            req.output.append(tok)
            req.slot = slot
            self.slot_req[slot] = req
            self.slot_tables[slot] = table
            self.slot_lens[slot] = n
            self.slot_last_tok[slot] = tok
            if self._is_stop(req, tok):
                finished.append(self._retire(slot))

        # --- decode ---
        if any(r is not None for r in self.slot_req):
            tables = np.full(
                (self.ecfg.max_slots, self.ecfg.max_pages_per_seq),
                self.scratch_page, np.int32,
            )
            for s, t in enumerate(self.slot_tables):
                if t is not None:
                    tables[s] = t.table(self.ecfg.max_pages_per_seq)
            burst = self._burst_size()
            if burst > 1:
                toks_block, self.k_pages, self.v_pages = self._decode_burst(
                    self.params, self.k_pages, self.v_pages,
                    jnp.asarray(self.slot_last_tok), jnp.asarray(tables),
                    jnp.asarray(self.slot_lens), steps=burst,
                )
                toks_block = np.asarray(toks_block)  # [burst, slots]
                for i in range(burst):
                    for slot, req in enumerate(self.slot_req):
                        if req is None:
                            continue
                        tok = int(toks_block[i, slot])
                        req.output.append(tok)
                        self.slot_lens[slot] += 1
                        self.slot_last_tok[slot] = tok
                        if self._is_stop(req, tok):
                            # Post-EOS burst rows for this slot are discarded
                            # (slot_req[slot] is None from here on); its
                            # device-side page writes stay within the
                            # capacity reserved at admission.
                            finished.append(self._retire(slot))
                return finished
            logits, greedy_toks, self.k_pages, self.v_pages = self._decode(
                self.params, self.k_pages, self.v_pages,
                jnp.asarray(self.slot_last_tok), jnp.asarray(tables),
                jnp.asarray(self.slot_lens),
            )
            greedy_toks = np.asarray(greedy_toks)
            for slot, req in enumerate(self.slot_req):
                if req is None:
                    continue
                if req.params.temperature == 0.0:
                    tok = int(greedy_toks[slot])  # batched argmax
                else:
                    tok = int(self._sample_one(logits[slot], req.params))
                req.output.append(tok)
                self.slot_lens[slot] += 1
                self.slot_last_tok[slot] = tok
                if self._is_stop(req, tok):
                    finished.append(self._retire(slot))
        return finished

    _BURST_BUCKETS = (32, 16, 8, 4, 2)

    def _burst_size(self) -> int:
        """Largest safe burst: greedy-only slots, capped by every active
        slot's remaining token budget (page capacity is reserved to
        max_new, so staying under `remaining` can never overflow a table),
        by the config cap, and bucketed to bound recompiles. Admission
        latency: a non-empty waiting queue caps the burst at one bucket (8)
        so freed slots are refilled promptly."""
        active = [r for r in self.slot_req if r is not None]
        if not active or any(r.params.temperature != 0.0 for r in active):
            return 1
        n = min(r.params.max_new_tokens - len(r.output) for r in active)
        n = min(n, self.ecfg.decode_burst)
        if self.waiting:
            n = min(n, 8)
        for b in self._BURST_BUCKETS:
            if b <= n:
                return b
        return 1

    def run(self) -> List[Request]:
        done: List[Request] = []
        while self.has_work():
            done.extend(self.step())
        return done

    # ------------------------------------------------------------------

    def _sample_one(self, logits, p: SamplingParams):
        if p.temperature == 0.0:
            return greedy(logits[None, :])[0]
        self._rng, key = jax.random.split(self._rng)
        return sample(logits[None, :], key, temperature=p.temperature,
                      top_k=p.top_k, top_p=p.top_p)[0]

    def _is_stop(self, req: Request, tok: int) -> bool:
        if len(req.output) >= req.params.max_new_tokens:
            return True
        if self.eos is not None and tok == self.eos:
            return True
        return tok in req.params.stop_token_ids

    def _retire(self, slot: int) -> Request:
        req = self.slot_req[slot]
        req.done = True
        req.finish_time = time.perf_counter()
        req.slot = -1
        self.slot_req[slot] = None
        self.slot_tables[slot].free()
        self.slot_tables[slot] = None
        self.slot_lens[slot] = 0
        self.slot_last_tok[slot] = 0
        return req

    @property
    def pages_in_use(self) -> int:
        # The allocator manages num_pages - 1 (one reserved scratch page).
        return (self.ecfg.num_pages - 1) - self.allocator.num_free
