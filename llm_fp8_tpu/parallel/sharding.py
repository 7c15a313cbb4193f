"""Sharding rules: NamedSharding specs replacing the reference's TP/SP/FSDP
module zoo.

What maps to what (SURVEY.md §2d):
  * ``ColumnParallelLinear`` (``fused_dense.py:166-204``) → shard a weight's
    *output* axis over ``tp`` (wqkv, w_gate_up, lm_head).
  * ``RowParallelLinear`` (``fused_dense.py:206-248``) → shard the *input*
    axis over ``tp`` (wo, w_down); GSPMD inserts the reduce (the all-reduce
    the reference issues by hand).
  * ``VocabParallelEmbedding`` (``embedding.py:114``) → embed's vocab axis
    over ``tp``.
  * FSDP FULL_SHARD (``train_multi_gpu.py:381-460``) → every weight also
    sharded over ``fsdp``; XLA schedules the per-layer all-gathers that the
    torch FSDP wrapper performs imperatively.
  * Megatron sequence parallelism (``fused_dense.py:193-204``) → activation
    constraint sharding the *sequence* axis over ``tp`` between blocks
    (``activation_spec(sp=True)``).

Specs are assigned by parameter name with an axis-compatibility rule, so the
same table covers plain arrays and QTensor leaves (fp8 payload + its scale:
a per-channel scale ``[L, 1, N]`` inherits the weight's spec with the
1-sized axis unsharded).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DP, AXIS_EP, AXIS_FSDP, AXIS_TP

__all__ = [
    "param_specs",
    "shard_params",
    "batch_spec",
    "activation_spec",
    "kv_cache_spec",
    "constrain",
]

# Canonical axis assignment per parameter leaf name: one mesh axis name (or
# None) per tensor axis of the *stacked* parameter.
_RULES: Dict[str, tuple] = {
    "embed": (AXIS_TP, AXIS_FSDP),
    "lm_head": (AXIS_FSDP, AXIS_TP),
    "final_norm": (None,),
    # stacked per-layer leaves: leading L axis never sharded
    "wqkv": (None, AXIS_FSDP, AXIS_TP),
    "bqkv": (None, AXIS_TP),
    "wo": (None, AXIS_TP, AXIS_FSDP),
    "w_gate_up": (None, AXIS_FSDP, AXIS_TP),
    "w_down": (None, AXIS_TP, AXIS_FSDP),
    "norm_attn": (None, None),
    "norm_mlp": (None, None),
    "q_norm": (None, None),
    "k_norm": (None, None),
    # GPT-2/NeoX zoo families (models/gpt2.py, models/neox.py) — same
    # column/row-parallel assignment, their leaf names. Unlisted leaves
    # (norms, biases on non-sharded dims, position tables) replicate.
    "wte": (AXIS_TP, AXIS_FSDP),
    "w_qkv": (None, AXIS_FSDP, AXIS_TP),
    "b_qkv": (None, AXIS_TP),
    "w_out": (None, AXIS_TP, AXIS_FSDP),
    "w_fc": (None, AXIS_FSDP, AXIS_TP),
    "b_fc": (None, AXIS_TP),
    "w_proj": (None, AXIS_TP, AXIS_FSDP),
    # MoE family (models/moe.py): stacked expert weights [L, E, K, N] put
    # the expert dim on ``ep`` (expert parallelism — GSPMD partitions the
    # dispatch/combine einsums) and keep the column/row assignment on the
    # inner GEMM dims. The router stays replicated: it is tiny and its
    # output decides routing for *every* token on every shard.
    "w_router": (None, None, None),
    # MLA family (models/mla.py): low-rank q/kv projections. ``w_kv_a`` is
    # row-parallel (contract D over tp) so the shared compressed latent
    # lands replicated for its RMSNorm; the expansions (``wq``/``wq_b``/
    # ``w_kv_b``) are column-parallel over the per-head output dim. The
    # tiny q-LoRA down-projection keeps its rank axis replicated — its
    # output feeds an RMSNorm whose reduction must not cross shards.
    "wq": (None, AXIS_FSDP, AXIS_TP),
    "wq_a": (None, AXIS_FSDP, None),
    "wq_b": (None, AXIS_FSDP, AXIS_TP),
    "w_kv_a": (None, AXIS_TP, AXIS_FSDP),
    "w_kv_b": (None, AXIS_FSDP, AXIS_TP),
    "w_shared_gate_up": (None, AXIS_FSDP, AXIS_TP),
    "w_shared_down": (None, AXIS_TP, AXIS_FSDP),
}

#: Same leaf name, different rank: the MoE family's ``w_gate_up``/``w_down``
#: are 4-D ``[L, E, K, N]`` where the dense families' are 3-D ``[L, K, N]``.
#: ``_spec_for_leaf`` picks the candidate whose rank matches the shape.
_RULES_BY_NDIM: Dict[tuple, tuple] = {
    ("w_gate_up", 4): (None, AXIS_EP, AXIS_FSDP, AXIS_TP),
    ("w_down", 4): (None, AXIS_EP, AXIS_TP, AXIS_FSDP),
}


def _spec_for_leaf(name: str, shape, mesh: Mesh) -> P:
    """Adapt the canonical rule to a concrete leaf shape.

    Axes whose size is 1 (a per-channel scale's reduced axis) or not
    divisible by the mesh axis (tiny debug models on big meshes) fall back to
    replicated — correctness never depends on the spec.
    """
    rule = _RULES_BY_NDIM.get((name, len(shape)), _RULES.get(name))
    if rule is None:
        return P()
    # A scale for an MX/per-channel QTensor has the same ndim; other ranks
    # (e.g. scalar per-tensor scales stored [1,1,1]) also match by ndim here.
    if len(rule) != len(shape):
        return P()
    out = []
    for ax_name, dim in zip(rule, shape):
        if ax_name is None or dim % mesh.shape[ax_name] != 0 or dim == 1:
            out.append(None)
        else:
            out.append(ax_name)
    return P(*out)


def param_specs(params: Dict[str, Any], mesh: Mesh):
    """Pytree of PartitionSpec congruent to ``params`` (QTensors included)."""

    def walk(tree, name: Optional[str]):
        if isinstance(tree, dict):
            return {k: walk(v, k) for k, v in tree.items()}
        # QTensor and any other pytree node: spec each array leaf by the
        # enclosing parameter name.
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        specs = [_spec_for_leaf(name or "", l.shape, mesh) for l in leaves]
        return jax.tree_util.tree_unflatten(treedef, specs)

    return walk(params, None)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place params on the mesh per the rules (the 'wrap_model' moment)."""
    specs = param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> P:
    """Token batches shard over both data axes (dp × fsdp act as data)."""
    return P((AXIS_DP, AXIS_FSDP))


def activation_spec(sp: bool = False) -> P:
    """Hidden states ``[B, S, D]``. ``sp=True`` = Megatron-style sequence
    parallelism: seq axis sharded over tp between attention/MLP blocks."""
    return P((AXIS_DP, AXIS_FSDP), AXIS_TP if sp else None, None)


def kv_cache_spec() -> P:
    """KV arena ``[L, B, S, Hk, Dh]``: batch over data axes, heads over tp."""
    return P(None, (AXIS_DP, AXIS_FSDP), None, AXIS_TP, None)


def constrain(x: jax.Array, mesh: Mesh, spec: P) -> jax.Array:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def adapt_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop spec axes that don't divide the array (small models, big meshes)."""
    out = []
    for ax, dim in zip(spec, shape):
        names = ax if isinstance(ax, tuple) else ((ax,) if ax else ())
        size = 1
        for n in names:
            size *= mesh.shape[n]
        out.append(ax if names and dim > 1 and dim % size == 0 else None)
    return P(*out)
