"""Checkpoint resharding: save on mesh A, restore on mesh B.

The reference ships explicit ``shard_state_dict_tp`` / ``combine_state_dicts_tp``
helpers (``flash_attn/models/gpt.py:698,814``) to move checkpoints between TP
world sizes. Under GSPMD + Orbax this must be free: the checkpoint is
layout-agnostic, and restore takes whatever sharding the *target* template
asks for. This test proves the round trip on the virtual 8-device mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np

from llm_fp8_tpu.models import get_config, init_params
from llm_fp8_tpu.parallel import (
    MeshConfig, make_mesh, param_specs, shard_params,
)
from llm_fp8_tpu.training.checkpoint import CheckpointManager
from llm_fp8_tpu.training.trainer import TrainConfig, Trainer, TrainState

CFG = get_config("debug-small")


def _abstract_on_mesh(tree, mesh):
    specs = param_specs(tree, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=jax.sharding.NamedSharding(mesh, s)
        ),
        tree, specs,
    )


def test_params_fsdp_to_tp_roundtrip(tmp_path):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    want = jax.tree_util.tree_map(np.asarray, params)

    mesh_a = make_mesh(MeshConfig(dp=1, fsdp=8, tp=1))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(shard_params(params, mesh_a), step=1)

    # Restore onto a *different* mesh: 2-way data x 4-way tensor parallel.
    mesh_b = make_mesh(MeshConfig(dp=2, fsdp=1, tp=4))
    template = _abstract_on_mesh(params, mesh_b)
    restored = mgr.restore(template)

    # Values identical...
    got = jax.tree_util.tree_map(np.asarray, restored)
    jax.tree_util.tree_map(np.testing.assert_array_equal, got, want)
    # ...and the placement is mesh B's, not mesh A's.
    specs_b = param_specs(params, mesh_b)

    def check(x, s):
        assert x.sharding == jax.sharding.NamedSharding(mesh_b, s), (
            x.sharding, s,
        )

    jax.tree_util.tree_map(check, restored, specs_b)


def test_train_state_roundtrip_resumes_identically(tmp_path):
    """Full TrainState (params + AdamW moments + qstate + step), saved while
    sharded over an fsdp=8 mesh, restores to host layout and a fresh trainer
    takes a bit-identical next step — the resume path after a topology
    change."""
    tc = TrainConfig(recipes="default", total_steps=10, warmup_steps=2)
    mesh_a = make_mesh(MeshConfig(dp=1, fsdp=8, tp=1))
    params = init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    batch = {
        "input_ids": jax.random.randint(
            jax.random.PRNGKey(7), (4, 32), 0, CFG.vocab_size
        )
    }

    trainer = Trainer(CFG, tc)
    with jax.sharding.set_mesh(mesh_a):
        # init under the mesh: GSPMD propagates the param sharding into the
        # AdamW moments, so the saved state is genuinely mesh-A-sharded.
        state = trainer.init_state(shard_params(params, mesh_a))
        state, _ = trainer.train_step(state, batch)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, step=1)

    # Restore WITHOUT mesh A: plain host-layout template (different
    # topology), fresh trainer with fresh jit caches.
    template = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = mgr.restore(template)

    s1, m1 = trainer.train_step(state, batch)
    trainer2 = Trainer(CFG, tc)
    trainer2.init_state(params)  # rebuild tx only
    s2, m2 = trainer2.train_step(restored, batch)
    np.testing.assert_array_equal(
        np.asarray(m1["loss"]), np.asarray(m2["loss"])
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s1.params, s2.params,
    )
