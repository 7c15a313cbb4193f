"""Device monitoring: the reference's ``GPUMonitor`` (utils.py:6-22) and
``MemoryProfiler`` (train_multi_gpu.py:153-240) rebuilt on TPU telemetry.

No subprocess polling (there is no nvidia-smi): PJRT exposes
``device.memory_stats()`` directly, and the closed-form estimator mirrors the
reference's per-sharding-mode memory model for capacity planning.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax

__all__ = ["device_memory_stats", "MemoryProfiler", "StepTimer", "estimate_memory_gb"]


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Per-device memory in GB (bytes_in_use / peak / limit when exposed).

    Tunneled PJRT backends (axon) return ``None`` from ``memory_stats()``;
    there the fallback sums this process's live device arrays — the
    equal-HBM *footprint* (weights + caches + inputs held by the caller),
    not a true high-water mark. ``source`` says which path produced the
    numbers.
    """
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    gb = 1024 ** 3
    if stats:
        return {
            "in_use_gb": stats.get("bytes_in_use", 0) / gb,
            "peak_gb": stats.get("peak_bytes_in_use", 0) / gb,
            "limit_gb": stats.get("bytes_limit", 0) / gb,
            "source": "pjrt",
        }
    # Footprint fallback: sum only the requested device's shards — on a
    # multi-device mesh summing every live array would overstate per-device
    # use by ~n_devices. ``source`` stays "live_arrays" so callers know this
    # is a footprint (no compile/prefill transients), not a true peak.
    live = 0
    for a in jax.live_arrays():
        try:
            for sh in a.addressable_shards:
                if sh.device == device:
                    live += sh.data.nbytes
        except Exception:  # noqa: BLE001 — backend without shard introspection
            if device in a.devices():
                live += a.nbytes // max(len(a.devices()), 1)
    live /= gb
    return {"in_use_gb": live, "peak_gb": live, "limit_gb": 0.0,
            "source": "live_arrays"}


class MemoryProfiler:
    """Phase-tagged memory snapshots (reference: per-phase torch.cuda stats)."""

    def __init__(self):
        self.snapshots: Dict[str, Dict[str, float]] = {}

    def snapshot(self, phase: str) -> Dict[str, float]:
        s = device_memory_stats()
        self.snapshots[phase] = s
        return s

    def report(self) -> Dict[str, Dict[str, float]]:
        return dict(self.snapshots)


class StepTimer:
    """Wall-time + throughput counter (reference: CUDA events + tokens/sec,
    train_fp8.py:233-236, train_multi_gpu.py:749-755). On TPU host wall time
    around ``block_until_ready`` is the honest equivalent."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._tokens = 0

    def step(self, tokens: int = 0):
        self._steps += 1
        self._tokens += tokens

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    def rates(self) -> Dict[str, float]:
        dt = max(self.elapsed, 1e-9)
        return {
            "steps_per_s": self._steps / dt,
            "tokens_per_s": self._tokens / dt,
            "elapsed_s": dt,
        }


def estimate_memory_gb(
    num_params: int,
    *,
    n_devices: int = 1,
    shard_params: bool = False,
    fp8_weights: bool = False,
    optimizer: str = "adamw",
    batch_tokens: int = 0,
    hidden: int = 0,
    layers: int = 0,
) -> float:
    """Closed-form per-device training memory estimate
    (reference ``MemoryProfiler.estimate_memory``, train_multi_gpu.py:189-240).

    params (bf16 or fp8) + grads (bf16) + AdamW moments (2×f32), divided by
    the device count when sharded (FSDP), plus a rough activation term.
    """
    bytes_per_param = 1 if fp8_weights else 2
    param_b = num_params * bytes_per_param
    grad_b = num_params * 2
    opt_b = num_params * 8 if optimizer == "adamw" else 0
    state = param_b + grad_b + opt_b
    if shard_params:
        state /= max(n_devices, 1)
    act_b = 0
    if batch_tokens and hidden and layers:
        # ~34 bytes/token/hidden/layer rule-of-thumb with remat disabled.
        act_b = 34 * batch_tokens * hidden * layers / max(n_devices, 1)
    return (state + act_b) / 1024 ** 3
