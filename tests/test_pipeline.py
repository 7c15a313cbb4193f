"""Pipeline parallelism (GPipe over ppermute) vs the plain forward.

The reference only *declares* pipeline sharding (``DistributedConfig``);
there is no schedule to port — the oracle is our own unpipelined stack.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.models import get_config, init_params, forward
from llm_fp8_tpu.parallel import MeshConfig, make_mesh
from llm_fp8_tpu.parallel.pipeline import (
    forward_pipelined, pipeline_apply, stage_params,
)

CFG = get_config("debug-small")  # 4 layers


def _make(seed=0, batch=8, seq=32):
    params = init_params(CFG, jax.random.PRNGKey(seed), dtype=jnp.float32)
    tokens = jax.random.randint(
        jax.random.PRNGKey(99), (batch, seq), 0, CFG.vocab_size
    )
    return params, tokens


@pytest.mark.parametrize("pp,mb", [(2, 4), (4, 2), (2, 1), (4, 8)])
def test_pipelined_forward_matches_plain(pp, mb):
    params, tokens = _make()
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, pp=pp), jax.devices()[:pp])
    want, _ = forward(
        params, tokens, CFG, attn_impl="ref", compute_dtype=jnp.float32
    )
    got = jax.jit(
        lambda p, t: forward_pipelined(
            p, t, CFG, mesh=mesh, n_microbatches=mb, attn_impl="ref",
            compute_dtype=jnp.float32,
        )
    )(params, tokens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_pipelined_grads_match_plain():
    params, tokens = _make()
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, pp=4), jax.devices()[:4])

    def loss_plain(p):
        logits, _ = forward(
            p, tokens, CFG, attn_impl="ref", compute_dtype=jnp.float32
        )
        return jnp.mean(jax.nn.log_softmax(logits)[..., 0])

    def loss_pp(p):
        logits = forward_pipelined(
            p, tokens, CFG, mesh=mesh, n_microbatches=4, attn_impl="ref",
            compute_dtype=jnp.float32,
        )
        return jnp.mean(jax.nn.log_softmax(logits)[..., 0])

    g_ref = jax.grad(loss_plain)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_pp),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_apply_generic_stage_fn():
    """The schedule is model-agnostic: y = x @ W applied per stage equals
    the sequential product."""
    n_stages, L, D = 4, 8, 16
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, pp=n_stages),
                     jax.devices()[:n_stages])
    key = jax.random.PRNGKey(0)
    Ws = jax.random.normal(key, (L, D, D)) * 0.1 + jnp.eye(D)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, D))

    def stage_fn(layers, x_mb, _):
        def body(x, W):
            return x @ W, None

        x_mb, _ = jax.lax.scan(body, x_mb, layers)
        return x_mb

    got = pipeline_apply(
        stage_fn, stage_params({"w": Ws}, n_stages)["w"], x,
        mesh=mesh, n_microbatches=4,
    )
    want = x
    for i in range(L):
        want = want @ Ws[i]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_stage_params_requires_divisibility():
    with pytest.raises(AssertionError):
        stage_params({"w": jnp.zeros((5, 2))}, 2)
