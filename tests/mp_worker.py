"""Multi-process worker: one rank of the 2-process x 4-device CPU job.

Executed by ``test_multiprocess.py`` via subprocess — NOT collected by
pytest (no ``test_`` prefix). This is the framework's equivalent of one
rank of the reference's ``torchrun``-spawned N-process entry
(``train_multi_gpu.py:969-1006``): ``jax.distributed.initialize`` against a
localhost coordinator, a global 2x2x2 (dp x fsdp x tp) mesh whose ``dp``
axis spans the two OS processes (the DCN dimension), one FP8 train step
with per-process batch shards, an Orbax save + restore of the sharded
train state, and a continuous-batching engine burst — the ``--multihost``
code path (cli/train.py:111-112) actually executing, not just parseable.

Prints one JSON line; the parent test compares ranks' outputs.
"""
import json
import os
import sys

# 4 virtual CPU devices per process. XLA_FLAGS is read at client-creation
# time so the env write works, but JAX_PLATFORMS must go through
# jax.config: the axon sitecustomize imports jax at interpreter startup,
# freezing the platform default before this module runs (same pattern as
# tests/conftest.py).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Cross-process CPU collectives: without an explicit implementation the CPU
# client comes up single-node and jax.process_count() stays 1.
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    ckpt_dir = sys.argv[4]

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    from jax.sharding import NamedSharding

    from llm_fp8_tpu.models import get_config, init_params
    from llm_fp8_tpu.parallel import (
        MeshConfig, make_mesh, batch_spec, param_specs,
    )
    from llm_fp8_tpu.training import TrainConfig, Trainer

    # dp=2 spans the process boundary (jax.devices() lists process 0's
    # devices first, so the leading mesh dim is the DCN axis), fsdp=2 and
    # tp=2 stay within each process — the BASELINE config-5 layout shape.
    mesh = make_mesh(MeshConfig(dp=nproc, fsdp=2, tp=2))
    cfg = get_config("debug-small")

    # Global param init: jit with out_shardings places each leaf per the
    # TP/FSDP rules directly — no host-side transfer of non-addressable
    # arrays (the multihost-correct version of shard_params' device_put).
    abs_params = jax.eval_shape(
        lambda: init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    )
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs(abs_params, mesh)
    )
    with jax.sharding.set_mesh(mesh):
        params = jax.jit(
            lambda: init_params(cfg, jax.random.PRNGKey(0),
                                dtype=jnp.float32),
            out_shardings=shardings,
        )()

        trainer = Trainer(
            cfg,
            TrainConfig(recipes="default", warmup_steps=1, total_steps=4),
            attn_impl="ref",
        )
        state = trainer.init_state(params)

        # Per-process batch shards: each rank feeds only ITS rows of the
        # global batch (the reference's per-rank DataLoader split,
        # train_multi_gpu.py:610-660) — make_array assembles the global
        # array from process-local data.
        B, S = 8, 32
        bspec = NamedSharding(mesh, batch_spec())
        rows = B // nproc
        rng = np.random.RandomState(1234 + pid)
        local_ids = rng.randint(1, cfg.vocab_size, size=(rows, S))
        local_ids = local_ids.astype(np.int32)
        batch = {
            "input_ids": jax.make_array_from_process_local_data(
                bspec, local_ids, (B, S)
            ),
            "attention_mask": jax.make_array_from_process_local_data(
                bspec, np.ones((rows, S), np.int32), (B, S)
            ),
        }
        losses = []
        for _ in range(2):
            state, metrics = trainer.train_step(state, batch)
            # Scalar metrics are fully replicated: addressable on every rank.
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses), losses

        # ---- Orbax save + restore of the sharded state (every host writes
        # its shards; no rank-0 gather) ----
        from llm_fp8_tpu.training.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, keep=2)
        mgr.save(state, step=2)
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            state,
        )
        restored = mgr.restore(template)
        # Spot-check a sharded leaf round-tripped exactly.
        a = state.params["layers"]["wqkv"]
        b = restored.params["layers"]["wqkv"]
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data),
                                          np.asarray(sb.data))
        restored_step = int(restored.step)

    # ---- engine burst: continuous-batching decode over the same global
    # mesh (slots sharded over dp x fsdp — multi-host serving actually
    # spanning two processes) ----
    from llm_fp8_tpu.serving import Engine, EngineConfig, SamplingParams

    with jax.sharding.set_mesh(mesh):
        eng = Engine(
            state.params, cfg,
            EngineConfig(max_slots=4, max_seq_len=64,
                         kv_dtype=jnp.bfloat16, prefill_buckets=(16,),
                         attn_impl="ref", decode_burst=4),
            mesh=mesh,
        )
        # Identical requests on every rank (multihost SPMD: each process
        # runs the same engine program over its device shards).
        for n in (7, 9):
            eng.add_request(np.arange(1, n + 1, dtype=np.int32),
                            SamplingParams(max_new_tokens=6))
        done = eng.run()
        outputs = sorted(tuple(r.output) for r in done)
        assert len(done) == 2 and all(len(o) == 6 for o in outputs), outputs

    print(json.dumps({
        "pid": pid,
        "losses": [round(l, 6) for l in losses],
        "restored_step": restored_step,
        "engine_outputs": [list(map(int, o)) for o in outputs],
    }), flush=True)


if __name__ == "__main__":
    main()
