"""Context parallelism wired into the model stack (VERDICT r1 item 10).

Ring attention reachable from ``forward(..., cp_axis=...)`` and the Trainer
(``cp_mesh=``): forward and *gradients* must match the single-device path on
the virtual 8-device mesh. The reference has no CP at all (SURVEY.md §5) —
the parity oracle is our own unsharded stack.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from llm_fp8_tpu.models import get_config, init_params, forward
from llm_fp8_tpu.parallel import MeshConfig, make_mesh
from llm_fp8_tpu.training.trainer import TrainConfig, Trainer

CFG = get_config("debug-small")
S = 256  # 64 per chip at cp=4


def _make(seed=0, batch=2):
    params = init_params(CFG, jax.random.PRNGKey(seed), dtype=jnp.float32)
    tokens = jax.random.randint(
        jax.random.PRNGKey(99), (batch, S), 0, CFG.vocab_size
    )
    return params, tokens


def _loss(params, tokens, cp_axis=None, cp_mesh=None):
    logits, _ = forward(
        params, tokens, CFG, attn_impl="ref",
        cp_axis=cp_axis, cp_mesh=cp_mesh,
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = tokens[:, 1:]
    return -jnp.mean(
        jnp.take_along_axis(logp[:, :-1], tgt[..., None], axis=-1)
    )


@pytest.mark.parametrize(
    "mesh_cfg",
    [MeshConfig(dp=1, fsdp=1, cp=4, tp=1),
     MeshConfig(dp=2, fsdp=1, cp=2, tp=2)],
    ids=["cp4", "dp2cp2tp2"],
)
def test_cp_forward_matches_single_device(mesh_cfg):
    params, tokens = _make()
    mesh = make_mesh(mesh_cfg, jax.devices()[: mesh_cfg.dp * mesh_cfg.cp * mesh_cfg.tp])
    want, _ = forward(params, tokens, CFG, attn_impl="ref")
    got, _ = jax.jit(
        lambda p, t: forward(p, t, CFG, attn_impl="ref",
                             cp_axis="cp", cp_mesh=mesh)
    )(params, tokens)
    # The ring runs the Pallas flash kernel (bf16 MXU numerics) against an
    # fp32 einsum reference — same floor as tests/test_ring_attention.py.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_cp_grads_match_single_device():
    params, tokens = _make()
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, cp=4, tp=1), jax.devices()[:4])
    g_ref = jax.grad(_loss)(params, tokens)
    g_cp = jax.jit(jax.grad(
        lambda p, t: _loss(p, t, cp_axis="cp", cp_mesh=mesh)
    ))(params, tokens)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_cp = jax.tree_util.tree_leaves(g_cp)
    for (path, a), b in zip(flat_ref, flat_cp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-2, atol=5e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_trainer_cp_step_matches_plain():
    """One bf16 train step under a cp=4 mesh reproduces the unsharded loss."""
    params, tokens = _make(batch=4)
    batch = {"input_ids": tokens}
    tc = TrainConfig(recipes="bf16", total_steps=10, warmup_steps=2)

    plain = Trainer(CFG, tc)
    s0 = plain.init_state(jax.tree_util.tree_map(jnp.copy, params))
    _, m_plain = plain.train_step(s0, batch)

    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, cp=4, tp=1), jax.devices()[:4])
    cp = Trainer(CFG, tc, cp_mesh=mesh)
    assert cp.cp_axis == "cp"
    s1 = cp.init_state(jax.tree_util.tree_map(jnp.copy, params))
    _, m_cp = cp.train_step(s1, batch)

    np.testing.assert_allclose(
        float(m_cp["loss"]), float(m_plain["loss"]), rtol=5e-3
    )
    np.testing.assert_allclose(
        float(m_cp["grad_norm"]), float(m_plain["grad_norm"]), rtol=5e-2
    )


def test_cp_rejects_unsupported_features():
    params, tokens = _make()
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, cp=4, tp=1), jax.devices()[:4])
    with pytest.raises(NotImplementedError):
        forward(params, tokens, CFG, attn_impl="ref", cp_axis="cp",
                cp_mesh=mesh, dropout_p=0.1, dropout_seed=0)
