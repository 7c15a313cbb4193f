"""GPT-2 family vs HuggingFace on identical weights."""
import numpy as np
import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.gpt2 import (
    GPT2Config,
    GPT2_REGISTRY,
    init_gpt2_params,
    gpt2_forward,
    pack_gpt2_state_dict,
)

CFG = GPT2_REGISTRY["debug-gpt2"]


def test_hf_parity():
    import torch
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size,
        n_positions=CFG.max_position_embeddings,
        n_embd=CFG.hidden_size,
        n_layer=CFG.num_layers,
        n_head=CFG.num_heads,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        layer_norm_epsilon=CFG.ln_eps,
    )
    model = GPT2LMHeadModel(hf_cfg).eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_gpt2_state_dict(sd, CFG)
    tokens = np.arange(24, dtype=np.int32).reshape(2, 12) % CFG.vocab_size
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()
    got = gpt2_forward(params, jnp.asarray(tokens), CFG, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_random_init_runs():
    params = init_gpt2_params(CFG, jax.random.PRNGKey(0))
    logits = gpt2_forward(params, jnp.ones((1, 8), jnp.int32), CFG,
                          attn_impl="ref")
    assert logits.shape == (1, 8, CFG.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_registry_sizes():
    assert GPT2_REGISTRY["gpt2-xl"].hidden_size == 1600
    assert GPT2_REGISTRY["gpt2"].intermediate_size == 3072
