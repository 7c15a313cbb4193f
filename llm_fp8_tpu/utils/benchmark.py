"""Benchmark helpers: timing fwd/bwd and memory, tunnel-safe.

Parity with the reference's ``flash_attn/utils/benchmark.py``
(``benchmark_forward/backward/combined/fwd_bwd/all``, ``benchmark_memory``,
SURVEY.md §2b #34) rebuilt for JAX-on-TPU semantics: dispatch is async and —
behind remote tunnels — per-call overhead can dwarf kernel time, so every
helper times an on-device ``lax.scan`` of the op and uses a 1-element host
fetch as the completion barrier (see docs/PERF_NOTES.md).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "benchmark_forward",
    "benchmark_backward",
    "benchmark_fwd_bwd",
    "benchmark_memory",
]


def _sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def _timeit(f, *args, trials: int = 4, n_iters: int = 1) -> float:
    """Median warm-trial seconds per iteration."""
    _sync(f(*args))
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _sync(f(*args))
        times.append((time.perf_counter() - t0) / n_iters)
    times = sorted(times[1:])
    return times[len(times) // 2]


def _scan_loop(fn: Callable, n_iters: int):
    """Wrap ``fn(*args) -> array`` into an on-device n-iteration loop with a
    serializing data dependence (defeats DCE and inter-iteration overlap
    hiding)."""

    @jax.jit
    def looped(*args):
        first = fn(*args)

        def body(c, _):
            out = fn(*args)
            # fold a scalar of the output back in so iterations serialize
            return c + jnp.sum(out.reshape(-1)[:1].astype(jnp.float32)), ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                            length=n_iters)
        return c + jnp.sum(first.reshape(-1)[:1].astype(jnp.float32))

    return looped


def benchmark_forward(fn: Callable, *args, n_iters: int = 20) -> float:
    """Seconds per forward invocation of ``fn(*args)``."""
    return _timeit(_scan_loop(fn, n_iters), *args, n_iters=n_iters + 1)


def benchmark_backward(fn: Callable, *args, n_iters: int = 20) -> float:
    """Seconds per backward (VJP) invocation w.r.t. all array args."""

    def loss(*a):
        return jnp.sum(fn(*a).astype(jnp.float32))

    grad = jax.grad(loss, argnums=tuple(range(len(args))))

    def bwd(*a):
        return grad(*a)[0]

    return _timeit(_scan_loop(bwd, n_iters), *args, n_iters=n_iters + 1)


def benchmark_fwd_bwd(fn: Callable, *args, n_iters: int = 20) -> Tuple[float, float]:
    return (
        benchmark_forward(fn, *args, n_iters=n_iters),
        benchmark_backward(fn, *args, n_iters=n_iters),
    )


def benchmark_memory(fn: Callable, *args) -> Dict[str, float]:
    """Peak device memory (GB) attributable to one invocation."""
    from .monitor import device_memory_stats

    out = fn(*args)
    _sync(out)
    return device_memory_stats()
