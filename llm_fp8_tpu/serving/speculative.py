"""Speculative decoding: draft-model proposal + target-model verification.

Capability parity with the reference's ``decode_speculative``
(``flash_attn/utils/generation.py:269-565``): a small draft model proposes
``gamma`` tokens autoregressively; the target model scores all proposals in
ONE forward (sequence-length-``gamma+1`` prefill against its cache); the
longest agreeing prefix is accepted. Greedy verification guarantees output
*identical* to plain greedy decoding of the target model — speculation only
changes wall-clock, never tokens.

Cache rewind on rejection is free with the arena cache: acceptance just sets
the logical length back; stale tail entries are masked by ``kv_lens`` and
overwritten by later writes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models.config import ModelConfig
from llm_fp8_tpu.models.llama import KVCache, forward, init_kv_cache

__all__ = ["SpeculativeDecoder"]


class SpeculativeDecoder:
    """Greedy speculative decoding for a (target, draft) model pair."""

    def __init__(
        self,
        target_params: Dict,
        target_cfg: ModelConfig,
        draft_params: Dict,
        draft_cfg: ModelConfig,
        *,
        gamma: int = 4,
        max_seq_len: int = 2048,
        kv_dtype=jnp.bfloat16,
        attn_impl: str = "auto",
    ):
        assert target_cfg.vocab_size == draft_cfg.vocab_size
        self.tp, self.tcfg = target_params, target_cfg
        self.dp, self.dcfg = draft_params, draft_cfg
        self.gamma = gamma
        self.max_seq_len = max_seq_len
        self.kv_dtype = kv_dtype
        self.attn_impl = attn_impl

        self._fwd = jax.jit(self._fwd_impl, static_argnames=("which",))

    def _fwd_impl(self, params, cache, tokens, start, lens, *, which):
        cfg = self.tcfg if which == "t" else self.dcfg
        logits, cache = forward(
            params, tokens, cfg, cache=cache, start_pos=start,
            kv_lens=lens, attn_impl=self.attn_impl,
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def generate(self, prompt: np.ndarray, max_new_tokens: int) -> List[int]:
        """Greedy-exact generation with draft speculation. Returns new tokens."""
        prompt = np.asarray(prompt, np.int32)
        n0 = len(prompt)
        t_cache = init_kv_cache(self.tcfg, 1, self.max_seq_len,
                                dtype=self.kv_dtype)
        d_cache = init_kv_cache(self.dcfg, 1, self.max_seq_len,
                                dtype=self.kv_dtype)

        # Prefill both models on the prompt; target's argmax at the last
        # position is the first committed token.
        p = jnp.asarray(prompt)[None]
        lens = jnp.asarray([n0], jnp.int32)
        t_arg, t_cache = self._fwd(self.tp, t_cache, p, 0, lens, which="t")
        _, d_cache = self._fwd(self.dp, d_cache, p, 0, lens, which="d")
        out: List[int] = [int(t_arg[0, n0 - 1])]
        n = n0 + 1  # committed sequence length (prompt + accepted)
        # Draft's cache currently covers the prompt only.
        d_len = n0
        self.accepted_histogram: List[int] = []

        while len(out) < max_new_tokens:
            gamma = min(self.gamma, max_new_tokens - len(out),
                        self.max_seq_len - n - 1)
            if gamma <= 0:
                break
            # --- draft proposes gamma tokens (its cache may lag; feed the
            # tokens it hasn't seen: everything from d_len to n-1, then its
            # own proposals) ---
            pending = np.asarray(
                (list(prompt) + out)[d_len:n], np.int32
            )  # committed tokens the draft hasn't ingested
            proposals: List[int] = []
            cur = pending
            pos = d_len
            for g in range(gamma):
                arg, d_cache = self._fwd(
                    self.dp, d_cache, jnp.asarray(cur)[None], pos,
                    jnp.asarray([pos + len(cur)], jnp.int32), which="d",
                )
                nxt = int(arg[0, len(cur) - 1])
                pos += len(cur)
                proposals.append(nxt)
                cur = np.asarray([nxt], np.int32)
            d_len = pos  # draft cache now covers committed + gamma-1 proposals

            # --- target verifies: one forward over [last_committed] +
            # all gamma proposals — positions n-1 .. n+gamma-1, producing
            # argmax for positions n .. n+gamma (the last is the "bonus"
            # token when every proposal is accepted) ---
            block = np.asarray([out[-1]] + proposals, np.int32)
            t_arg, t_cache = self._fwd(
                self.tp, t_cache, jnp.asarray(block)[None], n - 1,
                jnp.asarray([n - 1 + len(block)], jnp.int32), which="t",
            )
            targets = [int(t) for t in np.asarray(t_arg[0])]
            # targets[i] = target's token for position n+i
            n_accept = 0
            for i in range(gamma):
                if targets[i] == proposals[i]:
                    n_accept += 1
                else:
                    break
            # Commit accepted proposals plus the target's correction token.
            out.extend(proposals[:n_accept])
            if len(out) < max_new_tokens:
                out.append(targets[n_accept])
            self.accepted_histogram.append(n_accept)
            n = n0 + len(out)
            # Rewind the draft onto the committed stream: its cache holds
            # d_len tokens, but only n-1 are valid context going forward.
            d_len = min(d_len, n - 1)
        return out[:max_new_tokens]
