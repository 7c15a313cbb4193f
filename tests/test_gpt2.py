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


def test_opt_hf_parity():
    """OPT folds onto the GPT-2 block: ReLU MLP + offset-2 positions
    (reference remap flash_attn/models/opt.py:79-94)."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM
    from llm_fp8_tpu.models.gpt2 import pack_opt_state_dict

    cfg = GPT2_REGISTRY["debug-opt"]
    torch.manual_seed(3)
    hf_cfg = OPTConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        ffn_dim=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        activation_function="relu",
        do_layer_norm_before=True,
        word_embed_proj_dim=cfg.hidden_size,
        dropout=0.0, attention_dropout=0.0,
        layerdrop=0.0,
    )
    model = OPTForCausalLM(hf_cfg).eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_opt_state_dict(sd, cfg)
    tokens = np.arange(24, dtype=np.int32).reshape(2, 12) % cfg.vocab_size
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()
    got = gpt2_forward(params, jnp.asarray(tokens), cfg, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_bigcode_hf_parity():
    """BigCode/SantaCoder: GPT-2 block with multi-query KV
    (reference remap flash_attn/models/bigcode.py:110-129)."""
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM
    from llm_fp8_tpu.models.gpt2 import pack_bigcode_state_dict

    cfg = GPT2_REGISTRY["debug-bigcode"]
    torch.manual_seed(4)
    hf_cfg = GPTBigCodeConfig(
        vocab_size=cfg.vocab_size,
        n_positions=cfg.max_position_embeddings,
        n_embd=cfg.hidden_size,
        n_layer=cfg.num_layers,
        n_head=cfg.num_heads,
        multi_query=True,
        activation_function="gelu_pytorch_tanh",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        layer_norm_epsilon=cfg.ln_eps,
    )
    model = GPTBigCodeForCausalLM(hf_cfg).eval()
    sd = {k: jnp.asarray(v.float().numpy())
          for k, v in model.state_dict().items()}
    params = pack_bigcode_state_dict(sd, cfg)
    tokens = np.arange(24, dtype=np.int32).reshape(2, 12) % cfg.vocab_size
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()
    got = gpt2_forward(params, jnp.asarray(tokens), cfg, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
