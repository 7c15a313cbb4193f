"""Sharding tests on the virtual 8-device CPU mesh.

Reference idiom (SURVEY.md §4): "run sharded module, compare against the
unsharded module on rank-replicated inputs", parametrized over world size —
their torchrun harness (``tests/modules/test_mha_parallel.py``) becomes plain
pytest over an 8-device mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from llm_fp8_tpu.models import get_config, init_params, forward, quantize_params
from llm_fp8_tpu.parallel import (
    MeshConfig,
    make_mesh,
    param_specs,
    shard_params,
    batch_spec,
)
from llm_fp8_tpu.quant import LAYERWISE

CFG = get_config("debug-small")  # hidden 256, 8 heads/4 kv — divisible by tp=4


def _make(seed=0, dtype=jnp.float32):
    params = init_params(CFG, jax.random.PRNGKey(seed), dtype=dtype)
    tokens = jax.random.randint(jax.random.PRNGKey(99), (8, 32), 0, CFG.vocab_size)
    return params, tokens


@pytest.mark.parametrize(
    "mesh_cfg",
    [
        MeshConfig(dp=8, fsdp=1, tp=1),
        MeshConfig(dp=1, fsdp=8, tp=1),
        MeshConfig(dp=1, fsdp=1, tp=8),
        MeshConfig(dp=2, fsdp=2, tp=2),
        MeshConfig(dp=1, fsdp=2, tp=4),
    ],
    ids=["dp8", "fsdp8", "tp8", "2x2x2", "fsdp2tp4"],
)
def test_sharded_forward_matches_single_device(mesh_cfg):
    params, tokens = _make()
    want, _ = forward(params, tokens, CFG, compute_dtype=jnp.float32,
                      attn_impl="ref")

    mesh = make_mesh(mesh_cfg)
    sharded = shard_params(params, mesh)
    tok_sharded = jax.device_put(tokens, NamedSharding(mesh, batch_spec()))

    @jax.jit
    def f(p, t):
        logits, _ = forward(p, t, CFG, compute_dtype=jnp.float32,
                            attn_impl="ref")
        return logits

    got = f(sharded, tok_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_quantized_sharded_forward():
    # FP8 weights (QTensor leaves with per-channel scales) shard too.
    params, tokens = _make(1)
    qparams = quantize_params(params, LAYERWISE)
    want, _ = forward(qparams, tokens, CFG, compute_dtype=jnp.float32,
                      attn_impl="ref")
    mesh = make_mesh(MeshConfig(dp=1, fsdp=2, tp=4))
    sharded = shard_params(qparams, mesh)
    got, _ = jax.jit(
        lambda p, t: forward(p, t, CFG, compute_dtype=jnp.float32,
                             attn_impl="ref")
    )(sharded, jax.device_put(tokens, NamedSharding(mesh, batch_spec())))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_param_specs_shapes():
    params, _ = _make(2)
    mesh = make_mesh(MeshConfig(dp=1, fsdp=2, tp=4))
    specs = param_specs(params, mesh)
    assert specs["layers"]["wqkv"] == P(None, "fsdp", "tp")
    assert specs["layers"]["wo"] == P(None, "tp", "fsdp")
    assert specs["embed"] == P("tp", "fsdp")
    assert specs["layers"]["norm_attn"] == P(None, None)


def test_indivisible_dims_fall_back_replicated():
    # debug-tiny kv_dim = 2*32 = 64 heads etc. — some dims won't divide tp=8.
    tiny = get_config("debug-tiny")
    params = init_params(tiny, jax.random.PRNGKey(0), dtype=jnp.float32)
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=8))
    sharded = shard_params(params, mesh)  # must not raise
    tokens = jnp.zeros((8, 8), jnp.int32)
    logits, _ = jax.jit(
        lambda p, t: forward(p, t, tiny, compute_dtype=jnp.float32,
                             attn_impl="ref")
    )(sharded, tokens)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_sequence_parallel_activation_constraint():
    # Megatron-style SP: activations sharded along seq over tp between
    # blocks. Under GSPMD this is an activation constraint; numerics must be
    # unchanged vs the unsharded forward.
    from llm_fp8_tpu.parallel import activation_spec, constrain
    from llm_fp8_tpu.models.llama import forward as fwd
    from llm_fp8_tpu.ops.rmsnorm import rmsnorm

    params, tokens = _make(7)
    want, _ = forward(params, tokens, CFG, compute_dtype=jnp.float32,
                      attn_impl="ref")
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, tp=8))
    sharded = shard_params(params, mesh)
    tok = jax.device_put(tokens, NamedSharding(mesh, batch_spec()))

    @jax.jit
    def f(p, t):
        logits, _ = forward(p, t, CFG, compute_dtype=jnp.float32,
                            attn_impl="ref")
        # constrain the logits' seq axis over tp — exercises the SP respec
        return constrain(logits, mesh, activation_spec(sp=True))

    got = f(sharded, tok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_mesh_auto_fsdp():
    cfg = MeshConfig(dp=2, fsdp=-1, tp=2).resolve(8)
    assert cfg.fsdp == 2
    with pytest.raises(ValueError):
        MeshConfig(dp=3, fsdp=2, tp=1).resolve(8)
