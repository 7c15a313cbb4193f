"""Pipeline parallelism: GPipe microbatch schedule over a ``ppermute`` chain.

The reference *declares* pipeline parallelism (``DistributedConfig`` lists it
as a sharding mode; no implementation anywhere in the tree) — this module is
the working TPU-native version. The layer stack is split into ``n_stages``
contiguous groups sharded over the mesh's ``pp`` axis; inside a ``shard_map``
island each device runs its group while activations hop stage→stage over
``jax.lax.ppermute`` (ICI neighbor traffic, never DCN). The schedule is the
classic GPipe fill–steady–drain loop: with ``M`` microbatches and ``S``
stages the loop runs ``M + S − 1`` ticks, bubble fraction ``(S−1)/(M+S−1)``.

Differentiable end-to-end: the schedule is plain ``lax.scan`` + ``ppermute``
+ ``where``, all of which JAX transposes — ``jax.grad`` through
``pipeline_apply`` yields the reverse schedule automatically (activations are
saved per microbatch, i.e. GPipe rematerialization semantics come from the
caller's ``remat`` policy, not from this module).

Embedding, final norm and the LM head stay *outside* the island in ordinary
GSPMD-land; only the layer stack pipelines.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from llm_fp8_tpu.parallel.mesh import AXIS_PP

__all__ = ["pipeline_apply", "forward_pipelined", "stage_params"]


def stage_params(layer_params, n_stages: int):
    """Reshape stacked layer params ``[L, ...] -> [n_stages, L//n_stages, ...]``
    (leading axis then sharded over the ``pp`` mesh axis)."""

    def reshape(a):
        L = a.shape[0]
        assert L % n_stages == 0, (L, n_stages)
        return a.reshape(n_stages, L // n_stages, *a.shape[1:])

    return jax.tree_util.tree_map(reshape, layer_params)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    staged: Any,  # pytree, leading axis n_stages (sharded over pp)
    x: jax.Array,  # [B, S, D] activations, B % n_microbatches == 0
    *,
    mesh: Mesh,
    n_microbatches: int,
    axis_name: str = AXIS_PP,
    extra: Any = None,  # replicated pytree passed to every stage_fn call
) -> jax.Array:
    """Run ``x`` through the pipelined layer stack; returns ``[B, S, D]``.

    ``stage_fn(stage_layers, x_mb, extra)``: applies ONE stage's layers
    (leading axis ``L // n_stages``) to one microbatch.
    """
    n_stages = mesh.shape[axis_name]
    B = x.shape[0]
    M = n_microbatches
    assert B % M == 0, (B, M)

    def island(staged_local, x_rep, extra_rep):
        # staged_local: this device's stage, leading axis 1 — drop it.
        layers = jax.tree_util.tree_map(lambda a: a[0], staged_local)
        s = jax.lax.axis_index(axis_name)
        x_mb = x_rep.reshape(M, B // M, *x_rep.shape[1:])
        T = M + n_stages - 1
        # Send/receive one hop down the chain; stage 0 receives zeros.
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            prev_out, outs = carry
            recv = jax.lax.ppermute(prev_out, axis_name, perm)
            feed = x_mb[jnp.clip(t, 0, M - 1)]
            inp = jnp.where(s == 0, feed, recv)
            out = stage_fn(layers, inp, extra_rep)
            # The last stage emits microbatch t-(S-1) at tick t. Warm-up
            # ticks (o_idx < 0) write garbage to the clipped index 0, but
            # the valid microbatch-0 write at tick S-1 lands after and
            # overwrites it — indices are monotone in t.
            o_idx = t - (n_stages - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, out, jnp.clip(o_idx, 0, M - 1), 0
            )
            return (out, outs), None

        outs0 = jnp.zeros(x_mb.shape, x_rep.dtype)
        (_, outs), _ = jax.lax.scan(
            tick, (jnp.zeros_like(x_mb[0]), outs0),
            jnp.arange(T, dtype=jnp.int32),
        )
        # Only the last stage holds real outputs; zero elsewhere and psum
        # to replicate the result across the pp axis.
        outs = jnp.where(s == n_stages - 1, outs, 0.0)
        outs = jax.lax.psum(outs, axis_name)
        return outs.reshape(x_rep.shape)

    spec_staged = jax.tree_util.tree_map(
        lambda a: P(axis_name, *(None,) * (a.ndim - 1)), staged
    )
    spec_extra = jax.tree_util.tree_map(lambda a: P(), extra)
    fn = shard_map(
        island,
        mesh=mesh,
        in_specs=(spec_staged, P(), spec_extra),
        out_specs=P(),
        check_vma=False,
    )
    return fn(staged, x, extra)


def forward_pipelined(
    params: Dict[str, Any],
    tokens: jax.Array,
    cfg,
    *,
    mesh: Mesh,
    n_microbatches: int = 4,
    attn_impl: str = "auto",
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Llama/Qwen training forward with the decoder stack pipelined over the
    mesh's ``pp`` axis. Returns logits ``[B, S, V]``.

    The reference's ``DistributedConfig`` names pipeline sharding but ships
    no schedule; this is the TPU one. Embedding + final norm + LM head run
    under ordinary GSPMD outside the island.
    """
    from llm_fp8_tpu.models.llama import _layer_body, _lm_head
    from llm_fp8_tpu.ops.rmsnorm import rmsnorm
    from llm_fp8_tpu.ops.rotary import rope_frequencies, rope_cos_sin

    B, S = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0).astype(compute_dtype)
    positions = jnp.arange(S, dtype=jnp.int32)[None, :]
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_cos_sin(positions, inv_freq, cfg.rope_scaling)  # [1, S, Dh/2]
    zero = jnp.zeros((1,), jnp.int32)

    n_stages = mesh.shape[AXIS_PP]
    staged = stage_params(params["layers"], n_stages)

    def stage_fn(layers, x_mb, extra):
        cos, sin = extra
        mb = x_mb.shape[0]

        def body(x, lp):
            x, _, _ = _layer_body(
                x, lp,
                jnp.broadcast_to(cos, (mb, S, cos.shape[-1])),
                jnp.broadcast_to(sin, (mb, S, sin.shape[-1])),
                cfg, None, jnp.broadcast_to(zero, (mb,)), None, attn_impl,
            )
            return x, None

        x_mb, _ = jax.lax.scan(body, x_mb, layers)
        return x_mb

    x = pipeline_apply(
        stage_fn, staged, x, mesh=mesh, n_microbatches=n_microbatches,
        extra=(cos, sin),
    )
    x = rmsnorm(x, params["final_norm"], cfg.rms_eps)
    return _lm_head(params, x, cfg)
