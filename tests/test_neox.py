"""Parallel-residual family (GPT-NeoX / Falcon) vs HuggingFace on identical
weights — the reference's zoo coverage for these architectures
(``flash_attn/models/gpt_neox.py``, ``falcon.py``; their parity tests
``tests/models/test_gpt_neox.py``, ``test_falcon.py``)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_fp8_tpu.models.neox import (
    NEOX_REGISTRY,
    init_neox_params,
    neox_forward,
    pack_neox_state_dict,
    pack_falcon_state_dict,
    pack_gptj_state_dict,
)

TOKENS = np.arange(24, dtype=np.int32).reshape(2, 12) % 512


def _hf_neox(cfg, parallel):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(0)
    hf_cfg = GPTNeoXConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        rotary_pct=cfg.rotary_pct,
        rotary_emb_base=cfg.rotary_base,
        use_parallel_residual=parallel,
        layer_norm_eps=cfg.ln_eps,
        hidden_act="gelu",
        max_position_embeddings=64,
        attention_dropout=0.0, hidden_dropout=0.0,
        tie_word_embeddings=False,
    )
    return GPTNeoXForCausalLM(hf_cfg).eval()


@pytest.mark.parametrize("name", ["debug-neox", "debug-neox-seq"])
def test_neox_hf_parity(name):
    import torch

    cfg = NEOX_REGISTRY[name]
    model = _hf_neox(cfg, cfg.parallel_residual)
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_neox_state_dict(sd, cfg)
    with torch.no_grad():
        want = model(torch.from_numpy(TOKENS).long()).logits.numpy()
    got = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_falcon_hf_parity():
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    cfg = NEOX_REGISTRY["debug-falcon"]
    torch.manual_seed(1)
    hf_cfg = FalconConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        ffn_hidden_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        multi_query=True,
        parallel_attn=True,
        new_decoder_architecture=False,
        alibi=False,
        bias=False,
        layer_norm_epsilon=cfg.ln_eps,
        rope_theta=cfg.rotary_base,
        attention_dropout=0.0, hidden_dropout=0.0,
    )
    model = FalconForCausalLM(hf_cfg).eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_falcon_state_dict(sd, cfg)
    with torch.no_grad():
        want = model(torch.from_numpy(TOKENS).long()).logits.numpy()
    got = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_gptj_hf_parity():
    import torch
    from transformers import GPTJConfig, GPTJForCausalLM

    cfg = NEOX_REGISTRY["debug-gptj"]
    torch.manual_seed(2)
    hf_cfg = GPTJConfig(
        vocab_size=cfg.vocab_size,
        n_embd=cfg.hidden_size,
        n_inner=cfg.intermediate_size,
        n_layer=cfg.num_layers,
        n_head=cfg.num_heads,
        rotary_dim=cfg.rotary_dim,
        n_positions=64,
        layer_norm_epsilon=cfg.ln_eps,
        activation_function="gelu_new",
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
        tie_word_embeddings=False,
    )
    model = GPTJForCausalLM(hf_cfg).eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_gptj_state_dict(sd, cfg)
    with torch.no_grad():
        want = model(torch.from_numpy(TOKENS).long()).logits.numpy()
    got = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_tied_norm_shares_one_layernorm():
    cfg = NEOX_REGISTRY["debug-falcon"]
    params = init_neox_params(cfg, jax.random.PRNGKey(0))
    assert "ln2_w" not in params["layers"]
    assert "b_qkv" not in params["layers"]  # bias=False
    logits = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="ref")
    assert np.all(np.isfinite(np.asarray(logits)))


def test_fp8_quantized_weights_run():
    """The family rides the shared quant stack: QTensor weights in _dot."""
    from llm_fp8_tpu.quant import quantize
    from llm_fp8_tpu.quant.formats import E4M3

    cfg = NEOX_REGISTRY["debug-neox"]
    params = init_neox_params(cfg, jax.random.PRNGKey(2))
    base = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="ref")
    for name in ("w_qkv", "w_out", "w_fc", "w_proj"):
        params["layers"][name] = quantize(
            params["layers"][name].astype(jnp.float32), E4M3, axes=(1,)
        )
    got = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=0.1, atol=0.1)


def test_flash_matches_ref_impl():
    cfg = NEOX_REGISTRY["debug-neox"]
    params = init_neox_params(cfg, jax.random.PRNGKey(3))
    a = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="ref")
    b = neox_forward(params, jnp.asarray(TOKENS), cfg, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)
