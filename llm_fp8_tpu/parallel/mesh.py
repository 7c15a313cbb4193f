"""Device mesh construction.

Replaces the reference's process-group bootstrap (``setup_distributed`` →
``init_process_group(backend="nccl")``, ``train_multi_gpu.py:969-1006``) and
its DDP/FSDP wrapper zoo with one object: a ``jax.sharding.Mesh`` over the
slice, axes ``(dp, fsdp, tp)``:

  * ``dp``   — pure data parallel (reference: DDP / the Accelerate path).
               Put the DCN (multi-host) dimension here.
  * ``fsdp`` — parameter-sharded data parallel (reference: FSDP FULL_SHARD /
               ZeRO, ``train_multi_gpu.py:381-460``).
  * ``pp``   — pipeline parallel: the *layer* dimension, GPipe microbatch
               schedule over a ``ppermute`` chain (``parallel/pipeline.py``).
               The reference declares PP in its roadmap but never implements
               it; here it is a working, differentiable schedule.
  * ``cp``   — context parallel: the *sequence* dimension ring for long-
               context training (``parallel/ring_attention.py``). Beyond the
               reference, whose levers stop at sliding windows. Size 1 by
               default; the axis always exists so specs can name it.
  * ``ep``   — expert parallel: the *expert* dimension of the MoE family's
               stacked ``[L, E, ...]`` weights (``models/moe.py``). Beyond
               the reference (no MoE there); GSPMD partitions the dispatch/
               combine einsums over this axis, inserting the all-to-all-class
               collectives NCCL MoE stacks hand-write. Size 1 by default.
  * ``tp``   — tensor parallel (reference: ColumnParallel/RowParallelLinear +
               ParallelMHA, ``fused_dense.py:166-248``, ``mha.py:707-993``).
               Keep within a host so collectives ride ICI.

Sequence parallelism needs no axis of its own: under GSPMD the Megatron-style
SP (activations sharded along seq between TP ranks) is an activation
PartitionSpec on the same ``tp`` axis — see ``sharding.py``. ``cp`` is
different: ring attention is a manual-sharding (``shard_map``) island with
explicit ``ppermute`` hops, so it needs a real mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = [
    "MeshConfig", "make_mesh",
    "AXIS_DP", "AXIS_FSDP", "AXIS_PP", "AXIS_CP", "AXIS_EP", "AXIS_TP",
]

AXIS_DP = "dp"
AXIS_FSDP = "fsdp"
AXIS_PP = "pp"
AXIS_CP = "cp"
AXIS_EP = "ep"
AXIS_TP = "tp"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Parallelism degrees. ``auto`` semantics mirror the reference's
    ``ShardingMode.AUTO`` (>1 device → shard params,
    ``train_multi_gpu.py:138-146``): leftover devices go to fsdp."""

    dp: int = 1
    fsdp: int = -1  # -1: absorb remaining devices
    pp: int = 1
    cp: int = 1
    ep: int = 1
    tp: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        dp, fsdp, pp, cp, ep, tp = (self.dp, self.fsdp, self.pp, self.cp,
                                    self.ep, self.tp)
        if fsdp == -1:
            rest = dp * pp * cp * ep * tp
            assert n_devices % rest == 0, (n_devices, dp, pp, cp, ep, tp)
            fsdp = n_devices // rest
        if dp * fsdp * pp * cp * ep * tp != n_devices:
            raise ValueError(
                f"mesh {dp}x{fsdp}x{pp}x{cp}x{ep}x{tp} != {n_devices} devices"
            )
        return MeshConfig(dp=dp, fsdp=fsdp, pp=pp, cp=cp, ep=ep, tp=tp)


def make_mesh(
    config: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    cfg = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(
        cfg.dp, cfg.fsdp, cfg.pp, cfg.cp, cfg.ep, cfg.tp
    )
    return Mesh(arr, (AXIS_DP, AXIS_FSDP, AXIS_PP, AXIS_CP, AXIS_EP,
                      AXIS_TP))
