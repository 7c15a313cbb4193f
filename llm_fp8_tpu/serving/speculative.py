"""Speculative decoding: draft-model proposal + target-model verification.

Capability parity with the reference's ``decode_speculative``
(``flash_attn/utils/generation.py:269-565``): a small draft model proposes
``gamma`` tokens autoregressively; the target model scores all proposals in
ONE forward (sequence-length-``gamma+1`` prefill against its cache).

Two verification modes, matching the reference:

* **greedy** (``temperature=0``): the longest prefix agreeing with the
  target's argmax is accepted — output *identical* to plain greedy decoding
  of the target model; speculation only changes wall-clock, never tokens.
* **sampled** (``temperature>0``, optional top-k/top-p): rejection-sampling
  verification (the reference follows Leviathan et al.; its accept test is
  ``generation.py:364-379``): proposal ``x_i ~ q_i`` is accepted with
  probability ``min(1, p_i(x_i) / q_i(x_i))``; on the first rejection the
  correction token is drawn from the residual ``norm(max(p_i - q_i, 0))``,
  and when every proposal survives the bonus token is drawn from
  ``p_{gamma+1}``. Both p and q are the *filtered* (top-k/top-p, tempered)
  distributions, and the procedure provably samples each committed token
  from the target's own filtered distribution — speculation changes
  wall-clock, never statistics (property-tested in
  ``tests/test_speculative.py``).

Cache rewind on rejection is free with the arena cache: acceptance just sets
the logical length back; stale tail entries are masked by ``kv_lens`` and
overwritten by later writes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models.config import ModelConfig
from llm_fp8_tpu.models.llama import KVCache, forward, init_kv_cache
from llm_fp8_tpu.ops.sampling import filtered_probs

__all__ = ["SpeculativeDecoder", "spec_verify"]


def spec_verify(
    proposals: np.ndarray,  # [gamma] int — draft's sampled tokens
    q_probs: np.ndarray,  # [gamma, V] — draft distribution at each position
    p_probs: np.ndarray,  # [gamma+1, V] — target distribution at each position
    rng: np.random.Generator,
) -> Tuple[List[int], int]:
    """Rejection-sampling verification (pure host math, model-agnostic).

    Returns ``(committed_tokens, n_accept)`` where ``committed_tokens`` is
    the accepted prefix plus exactly one extra token (the residual-sampled
    correction on rejection, or the bonus token from ``p_probs[gamma]`` when
    everything is accepted). Marginal distribution of every committed token
    is exactly the target's (Leviathan et al., Theorem 1; the reference's
    accept loop is ``generation.py:364-379``).
    """
    gamma, V = q_probs.shape
    out: List[int] = []
    for i in range(gamma):
        x = int(proposals[i])
        q = float(q_probs[i, x])
        p = float(p_probs[i, x])
        if q <= 0.0:
            # The draft proposed a token it assigned zero mass (can only be
            # numerical noise); treat as rejection.
            accept = False
        else:
            accept = rng.random() < min(1.0, p / q)
        if accept:
            out.append(x)
            continue
        residual = np.maximum(p_probs[i] - q_probs[i], 0.0)
        total = residual.sum()
        if total <= 0.0:
            # p == q numerically: any sample from p is correct.
            residual, total = p_probs[i].copy(), p_probs[i].sum()
        out.append(int(rng.choice(V, p=residual / total)))
        return out, i
    # All gamma accepted: bonus token straight from the target.
    bonus = p_probs[gamma]
    out.append(int(rng.choice(V, p=bonus / bonus.sum())))
    return out, gamma


class SpeculativeDecoder:
    """Speculative decoding for a (target, draft) model pair.

    ``temperature == 0`` (default) → greedy-exact verification;
    ``temperature > 0`` (with optional ``top_k``/``top_p``) → rejection
    sampling that preserves the target's filtered sampling distribution.
    """

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
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        seed: int = 0,
    ):
        assert target_cfg.vocab_size == draft_cfg.vocab_size
        self.tp, self.tcfg = target_params, target_cfg
        self.dp, self.dcfg = draft_params, draft_cfg
        self.gamma = gamma
        self.max_seq_len = max_seq_len
        self.kv_dtype = kv_dtype
        self.attn_impl = attn_impl
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self._rng = np.random.default_rng(seed)

        self._fwd = jax.jit(self._fwd_impl, static_argnames=("which",))
        self._fwd_probs = jax.jit(
            self._fwd_probs_impl, static_argnames=("which",)
        )

    def _fwd_impl(self, params, cache, tokens, start, lens, *, which):
        cfg = self.tcfg if which == "t" else self.dcfg
        logits, cache = forward(
            params, tokens, cfg, cache=cache, start_pos=start,
            kv_lens=lens, attn_impl=self.attn_impl,
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    def _fwd_probs_impl(self, params, cache, tokens, start, lens, *, which):
        """Forward returning the *filtered* sampling distribution per position."""
        cfg = self.tcfg if which == "t" else self.dcfg
        logits, cache = forward(
            params, tokens, cfg, cache=cache, start_pos=start,
            kv_lens=lens, attn_impl=self.attn_impl,
        )
        probs = filtered_probs(
            logits, temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p,
        )
        return probs, cache

    def generate(self, prompt: np.ndarray, max_new_tokens: int) -> List[int]:
        """Generation with draft speculation. Returns new tokens only."""
        if self.temperature > 0.0:
            return self._generate_sampled(prompt, max_new_tokens)
        return self._generate_greedy(prompt, max_new_tokens)

    def _generate_sampled(
        self, prompt: np.ndarray, max_new_tokens: int
    ) -> List[int]:
        """Rejection-sampling speculation (decode_speculative semantics)."""
        prompt = np.asarray(prompt, np.int32)
        n0 = len(prompt)
        t_cache = init_kv_cache(self.tcfg, 1, self.max_seq_len,
                                dtype=self.kv_dtype)
        d_cache = init_kv_cache(self.dcfg, 1, self.max_seq_len,
                                dtype=self.kv_dtype)

        p = jnp.asarray(prompt)[None]
        lens = jnp.asarray([n0], jnp.int32)
        t_probs, t_cache = self._fwd_probs(
            self.tp, t_cache, p, 0, lens, which="t"
        )
        _, d_cache = self._fwd_probs(self.dp, d_cache, p, 0, lens, which="d")
        first = np.asarray(t_probs[0, n0 - 1], np.float64)
        out: List[int] = [int(self._rng.choice(len(first),
                                               p=first / first.sum()))]
        n = n0 + 1
        d_len = n0  # draft-cache coverage (committed tokens it has ingested)
        self.accepted_histogram: List[int] = []

        while len(out) < max_new_tokens:
            gamma = min(self.gamma, max_new_tokens - len(out),
                        self.max_seq_len - n - 1)
            if gamma <= 0:
                break
            # --- draft proposes gamma tokens, sampled from q ---
            pending = np.asarray((list(prompt) + out)[d_len:n], np.int32)
            proposals: List[int] = []
            q_rows: List[np.ndarray] = []
            cur = pending
            pos = d_len
            for _ in range(gamma):
                probs, d_cache = self._fwd_probs(
                    self.dp, d_cache, jnp.asarray(cur)[None], pos,
                    jnp.asarray([pos + len(cur)], jnp.int32), which="d",
                )
                q = np.asarray(probs[0, len(cur) - 1], np.float64)
                q = q / q.sum()
                nxt = int(self._rng.choice(len(q), p=q))
                pos += len(cur)
                proposals.append(nxt)
                q_rows.append(q)
                cur = np.asarray([nxt], np.int32)
            d_len = pos

            # --- target scores positions n .. n+gamma in one forward ---
            block = np.asarray([out[-1]] + proposals, np.int32)
            t_probs, t_cache = self._fwd_probs(
                self.tp, t_cache, jnp.asarray(block)[None], n - 1,
                jnp.asarray([n - 1 + len(block)], jnp.int32), which="t",
            )
            p_rows = np.asarray(t_probs[0], np.float64)  # [gamma+1, V]
            p_rows = p_rows / p_rows.sum(-1, keepdims=True)
            committed, n_accept = spec_verify(
                np.asarray(proposals), np.stack(q_rows), p_rows, self._rng
            )
            out.extend(committed)
            self.accepted_histogram.append(n_accept)
            n = n0 + len(out)
            # Only n-1 tokens are valid draft context going forward (the last
            # committed token hasn't been fed to the draft yet).
            d_len = min(d_len, n - 1)
        return out[:max_new_tokens]

    def _generate_greedy(
        self, prompt: np.ndarray, max_new_tokens: int
    ) -> List[int]:
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
