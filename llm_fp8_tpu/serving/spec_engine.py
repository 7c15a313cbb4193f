"""Speculative decoding inside the continuous-batching engine.

The reference runs ``decode_speculative`` inside the *same* generation
runtime as its batching loop (``flash_attn/utils/generation.py:269-565``):
the draft model proposes ``gamma`` tokens, the target verifies all of them
in one forward against its KV cache, and rejection bookkeeping rewinds the
cache logically. This module is that capability over :class:`Engine`'s slot
arena — every active slot speculates *in the same jitted step*:

* **draft lane**: a second KV arena (one slot per engine slot) holds the
  draft model's cache; a ``lax.scan`` of ``gamma`` batched single-token
  decode steps proposes tokens for every slot at once, plus one final
  ingest-only feed so both arenas always cover the same positions.
* **verify lane**: ONE target forward over the ``[slots, gamma+1]`` block
  (``[last_committed, p_1..p_gamma]``) with per-slot ragged ``start_pos`` —
  the hinted-scatter cache append places each slot's rows at its own
  offset, and ``kv_lens`` masks the ragged batch.
* **accept/reject on-device**: greedy mode commits the longest
  argmax-agreeing prefix (output bit-identical to plain greedy decoding —
  engine-level test ``tests/test_spec_engine.py``); sampled mode runs the
  vectorized Leviathan accept test ``u * q(x) < p(x)`` per slot with a
  residual-distribution correction draw, preserving the target's filtered
  sampling distribution exactly (``generation.py:364-379`` semantics).

Cache rewind is free: acceptance only moves each slot's logical length;
stale rows past it are masked by ``kv_lens`` and overwritten by the next
round's scatter (which always spans them — the next round writes
``new_len .. new_len+gamma`` and ``new_len >= old_len+1``).

Rounds chain on-device: ``decode_burst`` (a token budget) buys
``decode_burst // (gamma+1)`` speculative rounds per dispatch under one
``lax.scan`` — the host truncates per-slot at EOS/budget after the burst,
the same contract as ``Engine._decode_burst_impl``. This removes the
per-round host round-trip that dominated the r4 measurement.

Reachable from ``cli/serve.py`` via ``--draft_model`` (+ ``--gamma``).
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models.config import ModelConfig
from llm_fp8_tpu.models.llama import KVCache, forward, init_kv_cache
from llm_fp8_tpu.ops.sampling import filtered_logits, filtered_probs
from llm_fp8_tpu.serving.engine import Engine, EngineConfig, Request

__all__ = ["SpecEngine"]


class SpecEngine(Engine):
    """Continuous-batching engine with a draft-model speculative lane.

    ``temperature == 0`` (default): greedy-exact — committed tokens are
    bit-identical to :class:`Engine` greedy decoding of the target alone.
    ``temperature > 0`` (+ optional ``top_k``/``top_p``): rejection-sampling
    verification; each committed token is marginally distributed as the
    target's filtered distribution. Sampling config is engine-level (it is
    baked into the compiled spec step, like the reference's
    ``decode_speculative(top_k=, top_p=, temperature=)`` call signature);
    per-request ``SamplingParams`` govern stopping only.
    """

    _use_arena = False  # verify feeds (gamma+1)-token blocks → generic path

    def __init__(
        self,
        params: Dict[str, Any],
        model_cfg: ModelConfig,
        draft_params: Dict[str, Any],
        draft_cfg: ModelConfig,
        engine_cfg: EngineConfig = EngineConfig(),
        *,
        gamma: int = 4,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        eos_token_id: Optional[int] = None,
        mesh=None,
        forward_fn=None,
        draft_forward_fn=None,
        seed: int = 0,
    ):
        assert model_cfg.vocab_size == draft_cfg.vocab_size, (
            "target and draft must share a vocabulary")
        super().__init__(
            params, model_cfg, engine_cfg,
            eos_token_id=eos_token_id, mesh=mesh, forward_fn=forward_fn,
        )
        self.dparams = draft_params
        self.dcfg = draft_cfg
        self._dforward = (draft_forward_fn if draft_forward_fn is not None
                          else forward)
        self.gamma = int(gamma)
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        B, S = self.ecfg.max_slots, self.ecfg.max_seq_len
        # Draft cache in bf16: the draft is small, and quantizing it buys
        # nothing once the target dominates HBM traffic.
        self.dcache: KVCache = init_kv_cache(draft_cfg, B, S,
                                             dtype=jnp.bfloat16)
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from llm_fp8_tpu.parallel.sharding import adapt_spec, kv_cache_spec

            spec = NamedSharding(
                self.mesh, adapt_spec(kv_cache_spec(), self.dcache.k.shape,
                                      self.mesh))
            self.dcache = KVCache(
                jax.device_put(self.dcache.k, spec),
                jax.device_put(self.dcache.v, spec),
                self.dcache.lens, self.dcache.k_scale, self.dcache.v_scale,
            )
        self._rng_key = jax.random.PRNGKey(seed)
        self._draft_prefill = jax.jit(
            self._draft_prefill_impl, static_argnames=("bucket",),
            donate_argnums=(1,),
        )
        self._spec_step = jax.jit(
            self._spec_burst_impl, static_argnames=("steps",),
            donate_argnums=(2, 3),
        )
        # Telemetry: recent per-round accepted-proposal counts (capped so a
        # long-lived server doesn't grow it unboundedly) plus running
        # aggregates covering the full lifetime.
        from collections import deque

        self.accepted_histogram: deque = deque(maxlen=4096)
        self.accepted_total = 0
        self.rounds_total = 0

    # ------------------------------------------------------------------
    # jitted compute
    # ------------------------------------------------------------------

    def _draft_prefill_impl(self, dparams, dcache, tokens, true_len, slot,
                            *, bucket):
        """Prefill the draft arena slot with the same prompt (mirror of
        ``Engine._prefill_impl``; the draft's prefill logits are unused —
        the first committed token always comes from the target)."""
        one = init_kv_cache(self.dcfg, 1, bucket, dtype=jnp.bfloat16)
        _, one = self._dforward(
            dparams, tokens[None, :], self.dcfg, cache=one, start_pos=0,
            kv_lens=true_len[None], attn_impl=self.ecfg.attn_impl,
        )
        k = dcache.k.at[:, slot, :bucket].set(one.k[:, 0])
        v = dcache.v.at[:, slot, :bucket].set(one.v[:, 0])
        return KVCache(k, v, dcache.lens.at[slot].set(true_len),
                       dcache.k_scale, dcache.v_scale)

    def _spec_burst_impl(self, tparams, dparams, tcache, dcache, toks, lens,
                         key, *, steps):
        """``steps`` speculative rounds chained as ONE dispatch.

        The r4 measurement showed the per-round host round-trip (not the
        draft math) made speculation lose to plain burst decode over the
        remote-dispatch link; chaining rounds under ``lax.scan`` gives the
        speculative path the same per-dispatch amortization as
        ``Engine._decode_burst_impl`` (engine.py:404-419). Outputs stack a
        leading ``[steps]`` axis; the host walks rounds in order and
        truncates per-slot at EOS/budget, exactly the burst contract.
        """
        def body(carry, k):
            tcache, dcache, toks, lens = carry
            (committed, n_commit, new_last, new_lens,
             tcache, dcache) = self._spec_round(
                tparams, dparams, tcache, dcache, toks, lens, k)
            return ((tcache, dcache, new_last, new_lens),
                    (committed, n_commit, new_last, new_lens))

        (tcache, dcache, _, _), outs = jax.lax.scan(
            body, (tcache, dcache, toks, lens),
            jax.random.split(key, steps),
        )
        committed, n_commit, new_last, new_lens = outs
        return committed, n_commit, new_last, new_lens, tcache, dcache

    def _spec_round(self, tparams, dparams, tcache, dcache, toks, lens,
                    key):
        """One speculative round over every slot.

        Returns ``(committed [B, gamma+1] int32, n_commit [B], new_last [B],
        new_lens [B], tcache, dcache)`` — position ``i`` of ``committed`` is
        valid iff ``i < n_commit``; ``n_commit = n_accept + 1`` (accepted
        prefix plus the correction/bonus token).
        """
        B = toks.shape[0]
        g = self.gamma
        greedy_mode = self.temperature == 0.0
        k_draft, k_accept, k_fix = jax.random.split(key, 3)

        # --- draft lane: gamma proposal feeds + 1 ingest-only feed -------
        def body(carry, k_step):
            dc, tok, pos = carry
            logits, dc = self._dforward(
                dparams, tok[:, None], self.dcfg, cache=dc, start_pos=pos,
                kv_lens=pos + 1, attn_impl=self.ecfg.attn_impl,
            )
            logits = logits[:, 0]
            if greedy_mode:
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                q_row = jnp.zeros_like(logits, jnp.float32)
            else:
                flt = filtered_logits(
                    logits, temperature=self.temperature,
                    top_k=self.top_k, top_p=self.top_p,
                )
                nxt = jax.random.categorical(k_step, flt, -1).astype(jnp.int32)
                q_row = jax.nn.softmax(flt, -1)
            return (dc, nxt, pos + 1), (nxt, q_row)

        (dcache, _, _), (props, q_rows) = jax.lax.scan(
            body, (dcache, toks, lens), jax.random.split(k_draft, g + 1)
        )
        # props: [g+1, B] — feed i+1 ingests props[i]; props[g] (the extra
        # ingest feed's output) is discarded. q_rows: [g+1, B, V].
        proposals = props[:g].T  # [B, g]

        # --- verify lane: one ragged-batch target forward ----------------
        block = jnp.concatenate([toks[:, None], proposals], axis=1)
        tlogits, tcache = self._forward(
            tparams, block, self.cfg, cache=tcache, start_pos=lens,
            kv_lens=lens + g + 1, attn_impl=self.ecfg.attn_impl,
        )  # [B, g+1, V]

        if greedy_mode:
            targets = jnp.argmax(tlogits, -1).astype(jnp.int32)  # [B, g+1]
            accept = proposals == targets[:, :g]
            n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), 1), 1)
            correction = jnp.take_along_axis(
                targets, n_acc[:, None], 1)[:, 0]
        else:
            p_probs = filtered_probs(
                tlogits, temperature=self.temperature,
                top_k=self.top_k, top_p=self.top_p,
            ).astype(jnp.float32)  # [B, g+1, V]
            q_probs = jnp.transpose(q_rows[:g], (1, 0, 2))  # [B, g, V]
            qx = jnp.take_along_axis(
                q_probs, proposals[..., None], -1)[..., 0]
            px = jnp.take_along_axis(
                p_probs[:, :g], proposals[..., None], -1)[..., 0]
            u = jax.random.uniform(k_accept, (B, g))
            # u*q < p  ⇔  u < min(1, p/q); q <= 0 (numerical-noise proposal)
            # rejects, matching spec_verify's host reference.
            accept = (qx > 0.0) & (u * qx < px)
            n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), 1), 1)
            # Correction from the residual max(p - q, 0) at the rejection
            # position; bonus straight from p when everything was accepted
            # (q row padded to zero there). p == q numerically → fall back
            # to p itself (any sample from p is correct).
            q_ext = jnp.concatenate(
                [q_probs, jnp.zeros((B, 1, q_probs.shape[-1]))], 1)
            p_row = jnp.take_along_axis(
                p_probs, n_acc[:, None, None], 1)[:, 0]
            q_row = jnp.take_along_axis(
                q_ext, n_acc[:, None, None], 1)[:, 0]
            residual = jnp.maximum(p_row - q_row, 0.0)
            total = residual.sum(-1, keepdims=True)
            residual = jnp.where(total > 0.0, residual, p_row)
            correction = jax.random.categorical(
                k_fix, jnp.log(residual + 1e-30), -1).astype(jnp.int32)

        idx = jnp.arange(g + 1, dtype=jnp.int32)[None, :]
        props_pad = jnp.concatenate(
            [proposals, jnp.zeros((B, 1), jnp.int32)], 1)
        committed = jnp.where(
            idx < n_acc[:, None], props_pad,
            jnp.where(idx == n_acc[:, None], correction[:, None], 0),
        )
        new_lens = lens + n_acc + 1
        # Keep cache.lens meaningful (forward bumped it past rejected rows).
        tcache = KVCache(tcache.k, tcache.v, new_lens,
                         tcache.k_scale, tcache.v_scale)
        dcache = KVCache(dcache.k, dcache.v, new_lens,
                         dcache.k_scale, dcache.v_scale)
        return committed, n_acc + 1, correction, new_lens, tcache, dcache

    # ------------------------------------------------------------------
    # host-side loop
    # ------------------------------------------------------------------

    def _sample_first(self, logits: jax.Array) -> int:
        """First committed token after prefill, drawn with the engine-level
        sampling config (the verified stream's own distribution)."""
        if self.temperature == 0.0:
            return int(jnp.argmax(logits))
        self._rng_key, k = jax.random.split(self._rng_key)
        flt = filtered_logits(
            logits[None], temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p,
        )
        return int(jax.random.categorical(k, flt, -1)[0])

    def step(self) -> List[Request]:
        """Admit waiting requests (prefilling BOTH arenas), then one
        speculative round over every active slot."""
        finished: List[Request] = []
        g = self.gamma

        for slot in range(self.ecfg.max_slots):
            if not self.waiting or self.slot_req[slot] is not None:
                continue
            req = self.waiting[0]
            # Same admission bound as the plain Engine; the speculative
            # arena additionally needs g+1 scratch rows past the committed
            # length, so clamp max_new_tokens to keep a full round in-bounds
            # instead of rejecting requests the plain Engine would serve.
            if (len(req.prompt) + req.params.max_new_tokens
                    > self.ecfg.max_seq_len
                    or len(req.prompt) > self.ecfg.prefill_buckets[-1]):
                self.waiting.pop(0)
                req.done = True
                req.error = (
                    f"rejected: prompt={len(req.prompt)} + "
                    f"max_new={req.params.max_new_tokens} exceeds arena "
                    f"max_seq_len={self.ecfg.max_seq_len} or largest prefill "
                    f"bucket {self.ecfg.prefill_buckets[-1]}"
                )
                finished.append(req)
                continue
            spec_room = self.ecfg.max_seq_len - len(req.prompt) - (g + 1)
            if req.params.max_new_tokens > spec_room:
                if spec_room < 1:
                    self.waiting.pop(0)
                    req.done = True
                    req.error = (
                        f"rejected: prompt={len(req.prompt)} leaves no room "
                        f"for a speculative round (gamma={g}) in "
                        f"max_seq_len={self.ecfg.max_seq_len}"
                    )
                    finished.append(req)
                    continue
                import dataclasses as _dc

                req.params = _dc.replace(
                    req.params, max_new_tokens=spec_room)
                req.error = (
                    f"max_new_tokens clamped to {spec_room} to fit a "
                    f"gamma={g} speculative round in the arena"
                )
            self.waiting.pop(0)
            bucket = self._bucket_for(len(req.prompt))
            padded = np.zeros((bucket,), np.int32)
            padded[: len(req.prompt)] = req.prompt
            jpad = jnp.asarray(padded)
            n = jnp.asarray(len(req.prompt), jnp.int32)
            jslot = jnp.asarray(slot, jnp.int32)
            last_logits = self._run_prefill(jpad, n, jslot, bucket)
            self.dcache = self._draft_prefill(
                self.dparams, self.dcache, jpad, n, jslot, bucket=bucket)
            tok = self._sample_first(last_logits)
            req.first_token_time = time.perf_counter()
            req.output.append(tok)
            req.slot = slot
            self.slot_req[slot] = req
            self.slot_lens[slot] = len(req.prompt)
            self.slot_last_tok[slot] = tok
            if self._is_stop(req, tok):
                finished.append(self._retire(slot))

        if any(r is not None for r in self.slot_req):
            lens = jnp.asarray(self.slot_lens)
            toks = jnp.asarray(self.slot_last_tok)
            if self._data_sharding is not None:
                lens = jax.device_put(lens, self._data_sharding)
                toks = jax.device_put(toks, self._data_sharding)
            self._rng_key, key = jax.random.split(self._rng_key)
            rounds = self._spec_rounds()
            committed, n_commit, new_last, new_lens, self.cache, \
                self.dcache = self._spec_step(
                    self.params, self.dparams, self.cache, self.dcache,
                    toks, lens, key, steps=rounds,
                )
            committed = self._fetch(committed)    # [rounds, B, g+1]
            n_commit = self._fetch(n_commit)      # [rounds, B]
            new_last = self._fetch(new_last)
            new_lens = self._fetch(new_lens)
            for slot, req in enumerate(self.slot_req):
                if req is None:
                    continue
                stopped = False
                for r in range(rounds):
                    if stopped:
                        break  # later rounds speculated past a stop: drop
                    self.accepted_histogram.append(int(n_commit[r, slot]) - 1)
                    self.accepted_total += int(n_commit[r, slot]) - 1
                    self.rounds_total += 1
                    for i in range(int(n_commit[r, slot])):
                        if len(req.output) >= req.params.max_new_tokens:
                            stopped = True
                            break
                        tok = int(committed[r, slot, i])
                        req.output.append(tok)
                        if self._is_stop(req, tok):
                            stopped = True
                            break
                self.slot_lens[slot] = int(new_lens[-1, slot])
                self.slot_last_tok[slot] = int(new_last[-1, slot])
                if stopped or (self.slot_lens[slot] + g + 2
                               >= self.ecfg.max_seq_len):
                    finished.append(self._retire(slot))
        return finished

    _SPEC_BURST_BUCKETS = (16, 8, 4, 2)

    def _spec_rounds(self) -> int:
        """Rounds per dispatch. ``decode_burst`` is a committed-token budget
        (matching the plain engine's semantics); a round commits at least 1
        and typically ~2-3 tokens, so the round budget is
        ``decode_burst // 2`` — the r5 lane decomposition showed the
        mechanism wins on-device at matched geometry and the residual loss
        was dispatch amortization: ``// (gamma+1)`` gave speculation 4
        rounds (~12 tokens) per dispatch where plain decode got 32 steps.
        Worst-case arena growth per round is g+1 rows regardless of what
        the host later truncates, so every slot must keep headroom for ALL
        rounds (second term); the remaining-budget term avoids dispatching
        far past a slot's request. Bucketed to bound recompiles; capped
        while requests wait so freed slots refill promptly."""
        g = self.gamma
        active = [(s, r) for s, r in enumerate(self.slot_req)
                  if r is not None]
        if not active:
            return 1
        n = min(
            max(1, self.ecfg.decode_burst // 2),
            min(r.params.max_new_tokens - len(r.output) for _, r in active),
            min((self.ecfg.max_seq_len - 2 - int(self.slot_lens[s]))
                // (g + 1)
                for s, _ in active),
        )
        if self.waiting:
            n = min(n, 2)
        for b in self._SPEC_BURST_BUCKETS:
            if b <= n:
                return b
        return 1
