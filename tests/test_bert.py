"""BERT encoder vs HuggingFace on identical weights — the reference's
encoder-model coverage (``flash_attn/models/bert.py``; parity test
``tests/models/test_bert.py``)."""
import numpy as np
import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.bert import (
    BERT_REGISTRY,
    init_bert_params,
    bert_forward,
    bert_mlm_logits,
    pack_bert_state_dict,
)

CFG = BERT_REGISTRY["debug-bert"]


def _hf_model():
    import torch
    from transformers import BertConfig as HFConfig, BertForMaskedLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        type_vocab_size=CFG.type_vocab_size,
        layer_norm_eps=CFG.ln_eps,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    return BertForMaskedLM(hf_cfg).eval()


def test_mlm_hf_parity():
    import torch

    model = _hf_model()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_bert_state_dict(sd, CFG)
    tokens = np.arange(24, dtype=np.int32).reshape(2, 12) % CFG.vocab_size
    with torch.no_grad():
        want = model(torch.from_numpy(tokens).long()).logits.numpy()
    seq, _ = bert_forward(params, jnp.asarray(tokens), CFG, attn_impl="ref")
    got = bert_mlm_logits(params, seq, CFG)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_padding_mask_parity():
    """lens-masked encode must match HF's attention_mask on right-padded
    batches (the reference's key_padding_mask semantics, bert.py:367-423)."""
    import torch

    model = _hf_model()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_bert_state_dict(sd, CFG)
    S = 16
    lens = np.asarray([16, 9, 3], np.int32)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, CFG.vocab_size, (3, S)).astype(np.int32)
    mask = (np.arange(S)[None] < lens[:, None]).astype(np.int64)
    tokens = tokens * mask  # pad token 0 beyond lens

    with torch.no_grad():
        want = model(
            torch.from_numpy(tokens).long(),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()
    seq, _ = bert_forward(
        params, jnp.asarray(tokens), CFG, lens=jnp.asarray(lens),
        attn_impl="ref",
    )
    got = np.asarray(bert_mlm_logits(params, seq, CFG))
    # Only valid positions are comparable (HF computes garbage on padding).
    for b in range(3):
        np.testing.assert_allclose(
            got[b, : lens[b]], want[b, : lens[b]], rtol=2e-4, atol=2e-4
        )


def test_pooler_matches_hf():
    import torch
    from transformers import BertConfig as HFConfig, BertModel

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        type_vocab_size=CFG.type_vocab_size, layer_norm_eps=CFG.ln_eps,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = BertModel(hf_cfg).eval()
    sd = {"bert." + k: jnp.asarray(v.numpy())
          for k, v in model.state_dict().items()}
    params = pack_bert_state_dict(sd, CFG)
    tokens = np.arange(20, dtype=np.int32).reshape(2, 10) % CFG.vocab_size
    import torch as _t
    with _t.no_grad():
        out = model(_t.from_numpy(tokens).long())
    seq, pooled = bert_forward(params, jnp.asarray(tokens), CFG,
                               attn_impl="ref")
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), rtol=2e-4, atol=2e-4
    )


def test_token_type_embeddings():
    params = init_bert_params(CFG, jax.random.PRNGKey(0))
    tokens = jnp.ones((1, 8), jnp.int32)
    a, _ = bert_forward(params, tokens, CFG, attn_impl="ref")
    b, _ = bert_forward(params, tokens, CFG,
                        token_type_ids=jnp.ones((1, 8), jnp.int32),
                        attn_impl="ref")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_fp8_quantized_weights_run():
    from llm_fp8_tpu.quant import quantize
    from llm_fp8_tpu.quant.formats import E4M3

    params = init_bert_params(CFG, jax.random.PRNGKey(1))
    tokens = jnp.ones((2, 8), jnp.int32)
    base, _ = bert_forward(params, tokens, CFG, attn_impl="ref")
    for name in ("w_qkv", "w_out", "w_fc", "w_proj"):
        params["layers"][name] = quantize(
            params["layers"][name].astype(jnp.float32), E4M3, axes=(1,)
        )
    got, _ = bert_forward(params, tokens, CFG, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=0.1, atol=0.1)


def test_flash_matches_ref_impl_bidirectional():
    params = init_bert_params(CFG, jax.random.PRNGKey(2))
    tokens = jnp.ones((2, 16), jnp.int32)
    lens = jnp.asarray([16, 11], jnp.int32)
    a, _ = bert_forward(params, tokens, CFG, lens=lens, attn_impl="ref")
    b, _ = bert_forward(params, tokens, CFG, lens=lens, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)
