"""Continuous-batching FP8 inference engine.

TPU-native counterpart of the reference's inference runtime
(``flash_attn/utils/generation.py``): ``InferenceParams`` KV arena (:24),
prefill+decode loop (:99-208), CUDA-graph-captured decode step (:606-740).
The CUDA-graph machinery disappears — one ``jax.jit`` decode step over a
static-shape slot arena *is* the captured graph, keyed by (slots, seq) shape
exactly like their ``DecodingCGCache`` is keyed by (batch, seqlen) (:618-692).

Continuous batching (the vLLM-style serving the reference's thesis evaluates,
``thesis/chapters/c3/c3_methodology.tex:46-52``): a fixed pool of decode
slots; requests prefill into free slots as they arrive and leave on
EOS/length, while other slots keep decoding — no global batch barrier.

Dynamic shapes are the enemy under jit: prompts are bucketed to power-of-two
lengths (one compiled prefill per bucket), the decode step is compiled once.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models.config import ModelConfig
from llm_fp8_tpu.models.llama import KVCache, forward, init_kv_cache
from llm_fp8_tpu.ops.sampling import sample, greedy

__all__ = ["EngineConfig", "SamplingParams", "Request", "Engine"]


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 = greedy
    top_k: int = 0
    top_p: float = 0.0
    max_new_tokens: int = 128
    stop_token_ids: tuple = ()


@dataclasses.dataclass
class Request:
    request_id: int
    prompt: np.ndarray  # [len] int32
    params: SamplingParams
    # lifecycle
    output: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    done: bool = False
    # Set when the engine finishes a request abnormally (it cannot fit the
    # KV arena or any prefill bucket) or had to alter its parameters (e.g.
    # SpecEngine clamping max_new_tokens), so callers can distinguish
    # "served as asked" from "rejected/adjusted" instead of inferring from
    # empty or short output.
    error: Optional[str] = None
    enqueue_time: float = 0.0
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None

    @property
    def ttft(self) -> Optional[float]:
        if self.first_token_time is None:
            return None
        return self.first_token_time - self.enqueue_time


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_slots: int = 8  # concurrent decode sequences
    max_seq_len: int = 2048  # KV arena length per slot
    # "auto": fp8 KV on fp8-native backends (v6e+), bf16 on v5e/CPU where
    # fp8 KV measures 0.37x (docs/PERF_NOTES.md). Accepts
    # "fp8"/"bf16"/"int8"/dtype. fp8/int8 KV run the fused-arena decode path
    # (lane-major arena + Pallas in-VMEM dequant); int8 — the v5e-native
    # 1-byte format — auto-calibrates per-head scales at first prefill.
    kv_dtype: Any = "auto"
    kv_scale: float = 1.0  # fp8 KV descale / int8 pre-calibration seed
    prefill_buckets: tuple = (128, 256, 512, 1024, 2048)
    attn_impl: str = "auto"
    # Max greedy decode steps fused into ONE dispatch (lax.scan burst):
    # per-token host round-trips dominate decode latency over a remote
    # tunnel; a burst amortizes dispatch+sync across up to this many tokens.
    # EOS inside a burst is handled by host-side truncation of the fetched
    # token block; the burst is capped so no slot can write past its arena
    # row. 1 disables (per-step decode). Sampled requests (temperature>0)
    # always decode per-step.
    decode_burst: int = 32
    # int8-KV drift guard: calibration freezes per-head scales at the first
    # prefill (vLLM-style offline kv-scale calibration), so activation
    # drift on a long-lived server is otherwise unbounded and invisible.
    # Every later prefill reports the fraction of K/V values clipping past
    # the representable range; when the EWMA crosses kv_sat_threshold the
    # engine flips a warning (kv_drift_stats()). kv_recalibrate=True
    # additionally expands the scales to cover the observed amax and
    # requantizes the live arena in place (the triggering prompt's already-
    # clipped rows stay clipped — the guard bounds FUTURE loss, and decode
    # appends inherit the widened scales).
    kv_sat_threshold: float = 1e-3
    kv_recalibrate: bool = False


class Engine:
    """Single-model engine; params may hold QTensor FP8 weights."""

    # Subclass hook: SpecEngine's verify step feeds (gamma+1)-token blocks,
    # which the generic KVCache path handles for every family; the fused
    # arena kernels are single-token decode paths, so it opts out.
    _use_arena = True

    def __init__(
        self,
        params: Dict[str, Any],
        model_cfg: ModelConfig,
        engine_cfg: EngineConfig = EngineConfig(),
        *,
        eos_token_id: Optional[int] = None,
        mesh=None,
        forward_fn=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — params should already be
        sharded (``parallel.shard_params``); the KV arena is placed per
        ``parallel.kv_cache_spec`` and the decode step runs GSPMD-sharded
        (tensor-parallel serving across the slice — the reference's
        ``tensor_parallel`` decode argument, ``generation.py:606-740``).

        ``forward_fn``: the family forward (default: the Llama family's
        ``forward``). Any zoo decoder with the shared cache signature
        ``fn(params, tokens, cfg, cache=, start_pos=, kv_lens=, attn_impl=)
        -> (logits, cache)`` serves through the same engine — the
        reference's one-``generate()``-for-every-model contract
        (``flash_attn/utils/generation.py:99-208``)."""
        from llm_fp8_tpu.utils.backend import resolve_kv_dtype

        self.params = params
        self.cfg = model_cfg
        self._forward = forward_fn if forward_fn is not None else forward
        # Buckets beyond the arena length can't be scattered into it — clip
        # (and keep at least one bucket so short arenas still serve).
        buckets = tuple(
            b for b in engine_cfg.prefill_buckets if b <= engine_cfg.max_seq_len
        ) or (engine_cfg.max_seq_len,)
        engine_cfg = dataclasses.replace(
            engine_cfg, kv_dtype=resolve_kv_dtype(engine_cfg.kv_dtype),
            prefill_buckets=buckets,
        )
        self.ecfg = engine_cfg
        self.eos = eos_token_id
        self.mesh = mesh
        B, S = engine_cfg.max_slots, engine_cfg.max_seq_len
        # FP8 KV runs the fused-arena path: a lane-major [L, B, Hk, Dh, S]
        # arena decoded by the Pallas kernel (in-VMEM dequant) — see
        # models/llama.py::forward_decode_arena. The arena fast path is
        # Llama-family-specific; other families store fp8 KV in the plain
        # KVCache (quantize-on-store via the shared cache_append_attend).
        self._fp8_arena = jnp.dtype(engine_cfg.kv_dtype) in (
            jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2),
            jnp.dtype(jnp.int8),
        ) and self._forward is forward and type(self)._use_arena
        # int8 KV: per-head scales are auto-calibrated from the first
        # prefill's K/V amaxes (the serving-side analogue of vLLM's offline
        # kv-scale calibration) — int8 is a fixed-point format, so unlike
        # fp8 a unit scale would waste nearly the whole range on O(1) values.
        self._int8_kv = (jnp.dtype(engine_cfg.kv_dtype) == jnp.dtype(jnp.int8))
        if self._int8_kv and not self._fp8_arena:
            # Only the arena path carries calibrated per-head scales; the
            # generic KVCache path would quantize O(1) values at the unit
            # scale — int8 is fixed-point, that truncates K/V to ±1 and
            # silently destroys the logits. Refuse instead.
            raise ValueError(
                "int8 KV requires the fused-arena engine path (Llama-family "
                "forward); use kv_dtype='bf16' or 'fp8' for this model"
            )
        self._calibrated = not self._int8_kv
        Hk = model_cfg.num_kv_heads
        self._kscales = jnp.full((Hk,), engine_cfg.kv_scale, jnp.float32)
        self._vscales = jnp.full((Hk,), engine_cfg.kv_scale, jnp.float32)
        # Drift telemetry (see EngineConfig.kv_sat_threshold): EWMA of the
        # per-prefill saturation fraction, per head.
        self._sat_ewma_k = np.zeros((Hk,), np.float64)
        self._sat_ewma_v = np.zeros((Hk,), np.float64)
        self.kv_sat_warning = False
        self.kv_recalibrations = 0
        if self._fp8_arena:
            L, Dh = model_cfg.num_layers, model_cfg.head_dim
            self.ka = jnp.zeros((L, B, Hk, Dh, S), engine_cfg.kv_dtype)
            self.va = jnp.zeros((L, B, Hk, Dh, S), engine_cfg.kv_dtype)
            self.cache = None
        else:
            self.cache: KVCache = init_kv_cache(
                model_cfg, B, S, dtype=engine_cfg.kv_dtype
            )
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from llm_fp8_tpu.parallel.sharding import adapt_spec, kv_cache_spec
            from llm_fp8_tpu.parallel.mesh import AXIS_DP, AXIS_FSDP, AXIS_TP

            if self._fp8_arena:
                # Transposed arena [L, B, Hk, Dh, S]: slots over the data
                # axes, kv heads over tp.
                aspec = NamedSharding(
                    mesh,
                    adapt_spec(
                        P(None, (AXIS_DP, AXIS_FSDP), AXIS_TP, None, None),
                        self.ka.shape, mesh,
                    ),
                )
                self.ka = jax.device_put(self.ka, aspec)
                self.va = jax.device_put(self.va, aspec)
            else:
                spec = NamedSharding(
                    mesh, adapt_spec(kv_cache_spec(), self.cache.k.shape, mesh)
                )
                self.cache = KVCache(
                    jax.device_put(self.cache.k, spec),
                    jax.device_put(self.cache.v, spec),
                    self.cache.lens, self.cache.k_scale, self.cache.v_scale,
                )
            # Decode-step inputs shard over the data axes: each dp group owns
            # max_slots/dp slots — dp is the DCN axis in multi-host serving,
            # so per-step slot traffic stays host-local and only the logits
            # gather crosses DCN (the reference's multi-process TP decode,
            # generation.py:606-740, has every rank step every sequence).
            self._data_sharding = NamedSharding(
                mesh, adapt_spec(P((AXIS_DP, AXIS_FSDP)), (B,), mesh)
            )
            # Multi-process meshes: slot-sharded step outputs span devices
            # this host cannot read. The scheduler is replicated host logic
            # (every rank runs the same admission/EOS decisions), so fetch
            # = all-gather to replicated THEN read — one compiled collective
            # riding the same channel as the step itself.
            self._replicate = jax.jit(
                lambda a: a, out_shardings=NamedSharding(mesh, P())
            )
        # Host-side slot bookkeeping (the scheduler's view).
        self.slot_req: List[Optional[Request]] = [None] * B
        self.slot_lens = np.zeros((B,), np.int32)
        self.slot_last_tok = np.zeros((B,), np.int32)
        self.waiting: List[Request] = []
        self._next_id = 0
        self._rng = jax.random.PRNGKey(0)

        if self._fp8_arena:
            self._prefill = jax.jit(
                self._prefill_arena_impl, static_argnames=("bucket",),
                donate_argnums=(1, 2),
            )
            self._decode = jax.jit(
                self._decode_arena_impl, donate_argnums=(1, 2)
            )
            self._decode_burst = jax.jit(
                self._decode_arena_burst_impl, static_argnames=("steps",),
                donate_argnums=(1, 2),
            )
        else:
            self._prefill = jax.jit(
                self._prefill_impl, static_argnames=("bucket",),
                donate_argnums=(1,),
            )
            self._decode = jax.jit(self._decode_impl, donate_argnums=(1,))
            self._decode_burst = jax.jit(
                self._decode_burst_impl, static_argnames=("steps",),
                donate_argnums=(1,),
            )

    # ------------------------------------------------------------------
    # jitted compute
    # ------------------------------------------------------------------

    def _prefill_impl(self, params, cache, tokens, true_len, slot, *, bucket):
        """Prefill one request (padded to ``bucket``) into cache slot ``slot``.

        Runs the model with a batch-1 view and scatters the produced K/V into
        the arena row — the jit equivalent of ``InferenceParams`` cache
        population during the reference's prefill (generation.py:158-163).
        """
        one = init_kv_cache(self.cfg, 1, bucket, dtype=self.ecfg.kv_dtype)
        one = KVCache(one.k, one.v, one.lens,
                      cache.k_scale, cache.v_scale)
        logits, one = self._forward(
            params, tokens[None, :], self.cfg, cache=one, start_pos=0,
            kv_lens=true_len[None], attn_impl=self.ecfg.attn_impl,
        )
        k = cache.k.at[:, slot, :bucket].set(one.k[:, 0])
        v = cache.v.at[:, slot, :bucket].set(one.v[:, 0])
        new_cache = KVCache(k, v, cache.lens.at[slot].set(true_len),
                            cache.k_scale, cache.v_scale)
        # Next-token logits come from the last *real* prompt position.
        last = logits[0, true_len - 1]
        return last, new_cache

    @staticmethod
    def _store_arena(arena, new, scales, slot):
        """Quantize [L, 1, bucket, Hk, Dh] K or V by per-head ``scales`` and
        store it transposed (lane-major) into arena slot ``slot``."""
        integer = jnp.issubdtype(arena.dtype, jnp.integer)
        fmax = (float(jnp.iinfo(arena.dtype).max) if integer
                else float(jnp.finfo(arena.dtype).max))
        nt = new[:, 0].transpose(0, 2, 3, 1)  # [L, Hk, Dh, bucket]
        nt = nt.astype(jnp.float32) / scales.reshape(1, -1, 1, 1)
        nt = jnp.clip(nt, -fmax, fmax)
        if integer:
            nt = jnp.round(nt)
        return jax.lax.dynamic_update_slice(
            arena, nt[:, None].astype(arena.dtype), (0, slot, 0, 0, 0)
        )

    @staticmethod
    def _sat_stats(new, scales, true_len, fmax):
        """Per-head saturation fraction + amax of a raw prefill K or V
        [L, 1, bucket, Hk, Dh] against ``scales`` — the drift telemetry:
        calibration is frozen at first prefill, so the fraction of values
        a later prompt pushes past the representable range is the
        observable for activation drift on a long-lived server."""
        a = jnp.abs(new[:, 0].astype(jnp.float32))  # [L, bucket, Hk, Dh]
        valid = (jnp.arange(a.shape[1]) < true_len)[None, :, None, None]
        rng = scales.reshape(1, 1, -1, 1) * fmax
        sat = jnp.sum(jnp.where(valid, (a > rng).astype(jnp.float32), 0.0),
                      axis=(0, 1, 3))
        denom = jnp.maximum(true_len * a.shape[0] * a.shape[-1], 1)
        amax = jnp.max(jnp.where(valid, a, 0.0), axis=(0, 1, 3))
        return sat / denom, amax  # each [Hk]

    def _prefill_arena_impl(self, params, ka, va, tokens, true_len, slot,
                            kscales, vscales, *, bucket):
        """Prefill into the fused quantized arena: run the prompt, quantize
        the produced K/V per head, store transposed in slot ``slot``.
        Also returns per-head saturation/amax drift telemetry (int8 KV's
        scales are frozen at first-prefill calibration)."""
        logits, kv = forward(
            params, tokens[None, :], self.cfg, kv_lens=true_len[None],
            attn_impl=self.ecfg.attn_impl, return_kv=True,
        )
        k, v = kv  # [L, 1, bucket, Hk, Dh]
        fmax = (float(jnp.iinfo(ka.dtype).max)
                if jnp.issubdtype(ka.dtype, jnp.integer)
                else float(jnp.finfo(ka.dtype).max))
        stats = (self._sat_stats(k, kscales, true_len, fmax)
                 + self._sat_stats(v, vscales, true_len, fmax))
        return (logits[0, true_len - 1],
                self._store_arena(ka, k, kscales, slot),
                self._store_arena(va, v, vscales, slot),
                stats)

    def _prefill_kv_impl(self, params, tokens, true_len, *, bucket):
        """Calibration prefill: return the raw (unquantized) prefill K/V so
        the host can set per-head int8 scales before anything is stored."""
        logits, kv = forward(
            params, tokens[None, :], self.cfg, kv_lens=true_len[None],
            attn_impl=self.ecfg.attn_impl, return_kv=True,
        )
        return logits[0, true_len - 1], kv

    def _decode_arena_impl(self, params, ka, va, last_tokens, lens,
                           kscales, vscales):
        """One fused-arena decode step (Pallas in-VMEM dequant)."""
        from llm_fp8_tpu.models.llama import forward_decode_arena

        logits, ka, va = forward_decode_arena(
            params, last_tokens[:, None], self.cfg, ka, va, lens,
            kv_scale=(kscales, vscales),
            window=self.cfg.sliding_window,
        )
        logits = logits[:, 0]
        return logits, jnp.argmax(logits, -1).astype(jnp.int32), ka, va

    def _calibrate_int8_kv(self, padded, n, slot, bucket):
        """First-prefill int8 KV calibration: run the prompt once without
        storing, set per-head scales from the observed K/V amaxes (5%
        headroom), then quantize+store with the frozen scales. Later prompts
        clip into this range — the same deploy-time-calibration contract as
        the reference thesis's fp8-weight vLLM serving, automated."""
        last, (k, v) = jax.jit(
            self._prefill_kv_impl, static_argnames=("bucket",)
        )(self.params, padded, n, bucket=bucket)
        valid_k = np.abs(np.asarray(k[:, 0, :int(n)], np.float32))
        valid_v = np.abs(np.asarray(v[:, 0, :int(n)], np.float32))
        amax_k = valid_k.max(axis=(0, 1, 3))  # [Hk]
        amax_v = valid_v.max(axis=(0, 1, 3))
        self._kscales = jnp.asarray(
            np.maximum(amax_k, 1e-6) * 1.05 / 127.0, jnp.float32)
        self._vscales = jnp.asarray(
            np.maximum(amax_v, 1e-6) * 1.05 / 127.0, jnp.float32)
        self._calibrated = True
        store = jax.jit(
            lambda ka, va, k, v, ks, vs, slot: (
                self._store_arena(ka, k, ks, slot),
                self._store_arena(va, v, vs, slot),
            ),
            donate_argnums=(0, 1),
        )
        self.ka, self.va = store(self.ka, self.va, k, v,
                                 self._kscales, self._vscales, slot)
        return last

    def _run_prefill(self, padded, n, slot, bucket):
        if self._fp8_arena:
            if not self._calibrated:
                return self._calibrate_int8_kv(padded, n, slot, bucket)
            last, self.ka, self.va, stats = self._prefill(
                self.params, self.ka, self.va, padded, n, slot,
                self._kscales, self._vscales, bucket=bucket
            )
            if self._int8_kv:
                self._track_kv_drift(stats)
        else:
            last, self.cache = self._prefill(
                self.params, self.cache, padded, n, slot, bucket=bucket
            )
        return last

    def _track_kv_drift(self, stats):
        """Consume a prefill's saturation/amax telemetry: update the EWMA,
        flip the warning past the threshold, optionally recalibrate."""
        import warnings

        k_sat, k_amax, v_sat, v_amax = (np.asarray(s, np.float64)
                                        for s in stats)
        a = 0.2  # EWMA weight: ~5 prompts of memory
        self._sat_ewma_k = (1 - a) * self._sat_ewma_k + a * k_sat
        self._sat_ewma_v = (1 - a) * self._sat_ewma_v + a * v_sat
        worst = max(self._sat_ewma_k.max(), self._sat_ewma_v.max())
        if worst > self.ecfg.kv_sat_threshold and not self.kv_sat_warning:
            self.kv_sat_warning = True
            warnings.warn(
                f"int8-KV saturation EWMA {worst:.2%} exceeds "
                f"kv_sat_threshold={self.ecfg.kv_sat_threshold:.2%}: "
                "activations have drifted past the first-prefill "
                "calibration range"
                + ("" if self.ecfg.kv_recalibrate
                   else "; set EngineConfig.kv_recalibrate=True to expand "
                        "scales online"),
                stacklevel=3,
            )
        if self.ecfg.kv_recalibrate and (
            k_sat.max() > self.ecfg.kv_sat_threshold
            or v_sat.max() > self.ecfg.kv_sat_threshold
        ):
            new_ks = np.maximum(np.asarray(self._kscales),
                                k_amax * 1.05 / 127.0)
            new_vs = np.maximum(np.asarray(self._vscales),
                                v_amax * 1.05 / 127.0)
            self._rescale_arena(jnp.asarray(new_ks, jnp.float32),
                                jnp.asarray(new_vs, jnp.float32))
            self.kv_recalibrations += 1

    def _rescale_arena(self, new_ks, new_vs):
        """Requantize the live int8 arena from the old scales to widened
        ones (q_new = round(q_old * old/new)) — rare, one fused pass; the
        alternative (reinterpreting old bytes under new scales) would
        corrupt every live sequence."""
        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def rescale(arena, old, new):
            ratio = (old / new).reshape(1, 1, -1, 1, 1)
            x = arena.astype(jnp.float32) * ratio
            return jnp.clip(jnp.round(x), -127, 127).astype(arena.dtype)

        self.ka = rescale(self.ka, self._kscales, new_ks)
        self.va = rescale(self.va, self._vscales, new_vs)
        self._kscales, self._vscales = new_ks, new_vs

    def kv_drift_stats(self) -> Dict[str, Any]:
        """Long-lived-server calibration health (int8 KV)."""
        return {
            "sat_ewma_k_max": float(self._sat_ewma_k.max()),
            "sat_ewma_v_max": float(self._sat_ewma_v.max()),
            "sat_threshold": self.ecfg.kv_sat_threshold,
            "warning": self.kv_sat_warning,
            "recalibrations": self.kv_recalibrations,
        }

    def _run_decode(self, toks, lens):
        if self._fp8_arena:
            logits, gtoks, self.ka, self.va = self._decode(
                self.params, self.ka, self.va, toks, lens,
                self._kscales, self._vscales
            )
        else:
            logits, gtoks, self.cache = self._decode(
                self.params, self.cache, toks, lens
            )
        return logits, gtoks

    def _decode_arena_burst_impl(self, params, ka, va, last_tokens, lens,
                                 kscales, vscales, *, steps):
        """``steps`` greedy fused-arena decode steps as ONE dispatch."""
        from llm_fp8_tpu.models.llama import forward_decode_arena

        def body(carry, _):
            toks, lens, ka, va = carry
            logits, ka, va = forward_decode_arena(
                params, toks[:, None], self.cfg, ka, va, lens,
                kv_scale=(kscales, vscales),
                window=self.cfg.sliding_window,
            )
            toks = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (toks, lens + 1, ka, va), toks

        (toks, lens, ka, va), out = jax.lax.scan(
            body, (last_tokens, lens, ka, va), None, length=steps
        )
        return out, ka, va

    def _decode_burst_impl(self, params, cache, last_tokens, lens, *, steps):
        """``steps`` greedy decode steps as ONE dispatch (generic KV path)."""
        def body(carry, _):
            toks, lens, cache = carry
            logits, cache = self._forward(
                params, toks[:, None], self.cfg, cache=cache,
                start_pos=lens, kv_lens=lens + 1,
                attn_impl=self.ecfg.attn_impl,
            )
            toks = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (toks, lens + 1, cache), toks

        (toks, lens, cache), out = jax.lax.scan(
            body, (last_tokens, lens, cache), None, length=steps
        )
        return out, cache

    def _run_decode_burst(self, toks, lens, steps):
        if self._fp8_arena:
            out, self.ka, self.va = self._decode_burst(
                self.params, self.ka, self.va, toks, lens,
                self._kscales, self._vscales, steps=steps
            )
        else:
            out, self.cache = self._decode_burst(
                self.params, self.cache, toks, lens, steps=steps
            )
        return self._fetch(out)  # [steps, slots]

    def _fetch(self, x):
        """Host-read a step output: all-gather to replicated first when its
        shards span other processes (multi-host serving; single-process
        arrays pass straight through)."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            x = self._replicate(x)
        return np.asarray(x)

    _BURST_BUCKETS = (32, 16, 8, 4, 2)

    def _burst_size(self) -> int:
        """Largest safe burst: greedy-only active slots; capped by each
        slot's remaining token budget AND its arena headroom (a slot must
        retire before writing at position max_seq_len-1 — the same
        defensive bound the per-step loop enforces); bucketed to bound
        recompiles; capped at 8 while requests wait so freed slots refill
        promptly."""
        active = [(s, r) for s, r in enumerate(self.slot_req)
                  if r is not None]
        if not active or any(r.params.temperature != 0.0 for _, r in active):
            return 1
        n = min(
            min(r.params.max_new_tokens - len(r.output) for _, r in active),
            min(self.ecfg.max_seq_len - 1 - int(self.slot_lens[s])
                for s, _ in active),
            self.ecfg.decode_burst,
        )
        if self.waiting:
            n = min(n, 8)
        for b in self._BURST_BUCKETS:
            if b <= n:
                return b
        return 1

    def _decode_impl(self, params, cache, last_tokens, lens):
        """One decode step over every slot (the 'captured graph').

        ``lens`` are per-slot cache fills; each slot writes its token at its
        own position and attends over its own prefix (ragged batch).
        Returns (logits [B, V], batched greedy tokens [B], cache) — the
        greedy argmax is computed on-device so the common greedy case costs
        one dispatch instead of one per slot.
        """
        logits, cache = self._forward(
            params, last_tokens[:, None], self.cfg, cache=cache,
            start_pos=lens, kv_lens=lens + 1, attn_impl=self.ecfg.attn_impl,
        )
        logits = logits[:, 0]
        return logits, jnp.argmax(logits, -1).astype(jnp.int32), cache

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def add_request(
        self, prompt: np.ndarray, params: SamplingParams = SamplingParams()
    ) -> Request:
        req = Request(
            request_id=self._next_id,
            prompt=np.asarray(prompt, np.int32),
            params=params,
            enqueue_time=time.perf_counter(),
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
        """Admit waiting requests into free slots, then one decode step.

        Returns requests finished during this step.
        """
        finished: List[Request] = []

        # --- admission: prefill waiting requests into free slots ---
        for slot in range(self.ecfg.max_slots):
            if not self.waiting or self.slot_req[slot] is not None:
                continue
            req = self.waiting[0]
            # Reject requests that cannot fit the arena or any prefill bucket
            # (instead of crashing mid-loop / silently overrunning the cache).
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
            self.waiting.pop(0)
            bucket = self._bucket_for(len(req.prompt))
            padded = np.zeros((bucket,), np.int32)
            padded[: len(req.prompt)] = req.prompt
            last_logits = self._run_prefill(
                jnp.asarray(padded),
                jnp.asarray(len(req.prompt), jnp.int32),
                jnp.asarray(slot, jnp.int32), bucket,
            )
            tok = int(self._sample_one(last_logits, req.params))
            req.first_token_time = time.perf_counter()
            req.output.append(tok)
            req.slot = slot
            self.slot_req[slot] = req
            self.slot_lens[slot] = len(req.prompt)
            self.slot_last_tok[slot] = tok
            if self._is_stop(req, tok):
                finished.append(self._retire(slot))

        # --- one decode step (or one fused burst) over active slots ---
        if any(r is not None for r in self.slot_req):
            lens = jnp.asarray(self.slot_lens)
            toks = jnp.asarray(self.slot_last_tok)
            if self._data_sharding is not None:
                lens = jax.device_put(lens, self._data_sharding)
                toks = jax.device_put(toks, self._data_sharding)
            burst = self._burst_size()
            if burst > 1:
                toks_block = self._run_decode_burst(toks, lens, burst)
                for i in range(burst):
                    for slot, req in enumerate(self.slot_req):
                        if req is None:
                            continue
                        tok = int(toks_block[i, slot])
                        req.output.append(tok)
                        self.slot_lens[slot] += 1
                        self.slot_last_tok[slot] = tok
                        if self._is_stop(req, tok) or (
                            self.slot_lens[slot] + 1 >= self.ecfg.max_seq_len
                        ):
                            finished.append(self._retire(slot))
                return finished
            logits, greedy_toks = self._run_decode(toks, lens)
            greedy_toks = self._fetch(greedy_toks)
            if any(r is not None and r.params.temperature != 0.0
                   for r in self.slot_req):
                logits = self._fetch(logits)
            for slot, req in enumerate(self.slot_req):
                if req is None:
                    continue
                if req.params.temperature == 0.0:
                    tok = int(greedy_toks[slot])  # batched argmax, no per-slot dispatch
                else:
                    tok = int(self._sample_one(logits[slot], req.params))
                req.output.append(tok)
                self.slot_lens[slot] += 1
                self.slot_last_tok[slot] = tok
                if self._is_stop(req, tok) or (
                    self.slot_lens[slot] + 1 >= self.ecfg.max_seq_len
                ):
                    # Second clause: defensive arena-bound stop — writing at
                    # start_pos >= max_seq_len would clamp and corrupt the
                    # last cache row.
                    finished.append(self._retire(slot))
        return finished

    def run(self) -> List[Request]:
        """Drain: step until every queued request completes."""
        done: List[Request] = []
        while self.has_work():
            done.extend(self.step())
        return done

    # ------------------------------------------------------------------

    def _sample_one(self, logits: jax.Array, p: SamplingParams):
        if p.temperature == 0.0:
            return greedy(logits[None, :])[0]
        self._rng, key = jax.random.split(self._rng)
        return sample(
            logits[None, :], key,
            temperature=p.temperature, top_k=p.top_k, top_p=p.top_p,
        )[0]

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
        self.slot_lens[slot] = 0
        self.slot_last_tok[slot] = 0
        return req
