"""AOT geometry proof for Qwen2.5-14B (BASELINE config 5: 14B over 2 hosts).

Executed by ``test_aot_14b.py`` in a subprocess with 16 virtual CPU devices
(2 hosts x 8 chips worth). Nothing is materialized: params/state/caches are
``jax.eval_shape`` abstractions with shardings attached, and
``jax.jit(...).lower(...).compile()`` runs XLA's SPMD partitioner + memory
assignment for the real programs. The compiled per-device memory analysis
is the proof that the sharding rules seat the one reference model that
*requires* multi-chip (``/root/reference/train_fp8.py:50-56``) within a
16 GB v5e:

  * serving: int8 weights + bf16 KV cache, batch 16 x 4096 context, decode
    step over an fsdp=2 x tp=4 mesh (8 chips, one host);
  * training: bf16 AdamW (mu in bf16) + full remat + chunked CE over an
    fsdp=8 x tp=2 mesh (16 chips, 2 hosts) — state alone is ~140 GB,
    8.75 GB/device at 16-way sharding.

Prints one JSON line with the per-device byte totals.
"""
import json
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=16"
    ).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

GB = 1024 ** 3
V5E_HBM_GB = 16.0


def _attach(tree, spec_tree, mesh):
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map(
        lambda l, s: jax.ShapeDtypeStruct(
            l.shape, l.dtype, sharding=NamedSharding(mesh, s)
        ),
        tree, spec_tree,
    )


def _per_device_gb(stats, *, donated=False):
    """Per-device live bytes from CompiledMemoryStats: arguments + temps +
    (outputs - donation aliases). Sizes are already per-device shards."""
    out = stats.output_size_in_bytes - stats.alias_size_in_bytes
    return (stats.argument_size_in_bytes + stats.temp_size_in_bytes
            + max(out, 0)) / GB


def serving_analysis():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llm_fp8_tpu.models import (
        get_config, init_params, init_kv_cache, quantize_params,
    )
    from llm_fp8_tpu.models.llama import forward
    from llm_fp8_tpu.parallel import (
        MeshConfig, make_mesh, param_specs, batch_spec,
    )
    from llm_fp8_tpu.parallel.sharding import adapt_spec, kv_cache_spec
    from llm_fp8_tpu.quant import recipe_set_by_name

    cfg = get_config("qwen2.5-14b")
    B, CACHE = 16, 4096
    mesh = make_mesh(MeshConfig(dp=1, fsdp=2, tp=4),
                     devices=jax.devices()[:8])

    abs_q = jax.eval_shape(
        lambda: quantize_params(
            init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16),
            recipe_set_by_name("int8"),
        )
    )
    abs_q = _attach(abs_q, param_specs(abs_q, mesh), mesh)
    abs_cache = jax.eval_shape(
        lambda: init_kv_cache(cfg, B, CACHE, dtype=jnp.bfloat16)
    )
    kspec = adapt_spec(kv_cache_spec(), abs_cache.k.shape, mesh)
    abs_cache = _attach(
        abs_cache,
        jax.tree_util.tree_map(
            lambda l: kspec if l.ndim == 5 else P(), abs_cache
        ),
        mesh,
    )
    bsh = jax.sharding.NamedSharding(mesh, adapt_spec(P((
        "dp", "fsdp")), (B,), mesh))
    toks = jax.ShapeDtypeStruct((B, 1), jnp.int32, sharding=bsh)
    lens = jax.ShapeDtypeStruct((B,), jnp.int32, sharding=bsh)

    @jax.jit
    def decode_step(params, cache, toks, lens):
        logits, cache = forward(
            params, toks, cfg, cache=cache, start_pos=lens,
            kv_lens=lens + 1, attn_impl="ref",
        )
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), cache

    stats = decode_step.lower(abs_q, abs_cache, toks, lens).compile(
    ).memory_analysis()
    return {
        "mesh": "fsdp2 x tp4 (8 chips)",
        "batch": B, "cache_len": CACHE,
        "arg_gb_per_dev": round(stats.argument_size_in_bytes / GB, 3),
        "temp_gb_per_dev": round(stats.temp_size_in_bytes / GB, 3),
        "out_gb_per_dev": round(stats.output_size_in_bytes / GB, 3),
        "alias_gb_per_dev": round(stats.alias_size_in_bytes / GB, 3),
        "total_gb_per_dev": round(_per_device_gb(stats), 3),
    }


def train_analysis():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llm_fp8_tpu.models import get_config, init_params
    from llm_fp8_tpu.parallel import (
        MeshConfig, make_mesh, param_specs, batch_spec,
    )
    from llm_fp8_tpu.training import TrainConfig, Trainer

    cfg = get_config("qwen2.5-14b")
    B, S = 8, 512
    mesh = make_mesh(MeshConfig(dp=1, fsdp=8, tp=2))  # all 16 devices

    trainer = Trainer(
        cfg,
        TrainConfig(recipes="bf16", warmup_steps=10, total_steps=100,
                    remat=True, ce_chunks=8, adam_mu_dtype="bfloat16"),
        attn_impl="ref",
    )
    abs_params = jax.eval_shape(
        lambda: init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    pspecs = param_specs(abs_params, mesh)
    # The optimizer state's mu/nu trees are congruent to params; map every
    # state leaf to its param's spec by shape (scalars -> replicated).
    shape2spec = {}
    jax.tree_util.tree_map(
        lambda l, s: shape2spec.setdefault(tuple(l.shape), s),
        abs_params, pspecs,
    )
    abs_state = jax.eval_shape(trainer.init_state, abs_params)
    abs_state = _attach(
        abs_state,
        jax.tree_util.tree_map(
            lambda l: shape2spec.get(tuple(l.shape), P()), abs_state
        ),
        mesh,
    )
    bsh = NamedSharding(mesh, batch_spec())
    abs_batch = {
        "input_ids": jax.ShapeDtypeStruct((B, S), jnp.int32, sharding=bsh),
        "attention_mask": jax.ShapeDtypeStruct((B, S), jnp.int32,
                                               sharding=bsh),
    }
    stats = trainer._train_step.lower(abs_state, abs_batch).compile(
    ).memory_analysis()
    return {
        "mesh": "fsdp8 x tp2 (16 chips / 2 hosts)",
        "batch": B, "seq": S,
        "remat": "full", "ce_chunks": 8, "adam_mu_dtype": "bfloat16",
        "arg_gb_per_dev": round(stats.argument_size_in_bytes / GB, 3),
        "temp_gb_per_dev": round(stats.temp_size_in_bytes / GB, 3),
        "out_gb_per_dev": round(stats.output_size_in_bytes / GB, 3),
        "alias_gb_per_dev": round(stats.alias_size_in_bytes / GB, 3),
        "total_gb_per_dev": round(_per_device_gb(stats, donated=True), 3),
    }


def main():
    serve = serving_analysis()
    train = train_analysis()
    result = {
        "model": "qwen2.5-14b",
        "v5e_hbm_gb": V5E_HBM_GB,
        "serving": serve,
        "training": train,
        "serving_fits": serve["total_gb_per_dev"] <= V5E_HBM_GB,
        "training_fits": train["total_gb_per_dev"] <= V5E_HBM_GB,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
