"""YaRN / linear rope scaling vs HF ``modeling_rope_utils`` numerics, plus
end-to-end logit parity for a Llama with yarn rope and a DeepSeek-V2 MLA
with its published yarn dict (mscale = mscale_all_dim = 0.707)."""
import dataclasses as dc

import numpy as np
import pytest
import jax.numpy as jnp

from llm_fp8_tpu.ops.rotary import (
    rope_frequencies,
    rope_attention_scaling,
)

YARN_BASIC = dict(rope_type="yarn", factor=4.0,
                  original_max_position_embeddings=2048)
YARN_DEEPSEEK = dict(rope_type="yarn", factor=40.0, beta_fast=32,
                     beta_slow=1, mscale=0.707, mscale_all_dim=0.707,
                     original_max_position_embeddings=4096)
YARN_ATTNF = dict(rope_type="yarn", factor=8.0, attention_factor=1.2,
                  original_max_position_embeddings=1024)


def hf_yarn(head_dim, theta, scaling, max_pos=163840):
    """HF ground truth: (inv_freq, attention_scaling)."""
    import torch
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import _compute_yarn_parameters

    cfg = LlamaConfig(
        hidden_size=head_dim * 4, num_attention_heads=4, head_dim=head_dim,
        rope_theta=theta, rope_scaling=dict(scaling),
        max_position_embeddings=max_pos,
    )
    inv, att = _compute_yarn_parameters(cfg, torch.device("cpu"))
    return inv.numpy(), att


class TestYarnNumerics:
    @pytest.mark.parametrize(
        "scaling", [YARN_BASIC, YARN_DEEPSEEK, YARN_ATTNF],
        ids=["basic", "deepseek_mscale", "explicit_attention_factor"],
    )
    @pytest.mark.parametrize("head_dim,theta", [(64, 10000.0), (128, 5e5)])
    def test_matches_hf(self, scaling, head_dim, theta):
        want_inv, want_att = hf_yarn(head_dim, theta, scaling)
        got_inv = np.asarray(rope_frequencies(head_dim, theta, scaling))
        got_att = rope_attention_scaling(scaling)
        np.testing.assert_allclose(got_inv, want_inv, rtol=1e-6)
        assert got_att == pytest.approx(want_att, rel=1e-6)

    def test_mscale_pair_cancels(self):
        # DeepSeek-V2 sets mscale == mscale_all_dim → HF factor 1.0 exactly.
        assert rope_attention_scaling(YARN_DEEPSEEK) == pytest.approx(1.0)

    def test_yarn_interpolates_low_frequencies_only(self):
        base = np.asarray(rope_frequencies(64, 10000.0, None))
        yarn = np.asarray(rope_frequencies(64, 10000.0, YARN_BASIC))
        # Highest frequency (dim 0) extrapolated: unchanged.
        assert yarn[0] == pytest.approx(base[0])
        # Lowest frequency fully interpolated: divided by factor.
        assert yarn[-1] == pytest.approx(base[-1] / YARN_BASIC["factor"])

    def test_linear_type(self):
        base = np.asarray(rope_frequencies(32, 10000.0, None))
        lin = np.asarray(rope_frequencies(
            32, 10000.0, dict(rope_type="linear", factor=2.0)))
        np.testing.assert_allclose(lin, base / 2.0, rtol=1e-7)

    def test_yarn_requires_original_max(self):
        with pytest.raises(ValueError, match="original_max"):
            rope_frequencies(32, 1e4, dict(rope_type="yarn", factor=2.0))


class TestEndToEndParity:
    def test_llama_yarn_logits(self):
        """Llama forward with yarn rope matches HF token-for-token."""
        import torch
        from transformers import LlamaConfig, LlamaForCausalLM

        from llm_fp8_tpu.models import get_config, forward
        from llm_fp8_tpu.models.hf_loader import pack_hf_state_dict

        cfg = dc.replace(
            get_config("debug-tiny"),
            rope_scaling=dict(YARN_BASIC),
            max_position_embeddings=8192,
        )
        torch.manual_seed(0)
        hf = LlamaForCausalLM(LlamaConfig(
            vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
            rope_theta=cfg.rope_theta, rope_scaling=dict(YARN_BASIC),
            max_position_embeddings=8192, rms_norm_eps=cfg.rms_eps,
            tie_word_embeddings=cfg.tie_word_embeddings,
            attention_bias=False, attn_implementation="eager",
        ))
        hf.eval()
        sd = {k: jnp.asarray(v.numpy()) for k, v in hf.state_dict().items()}
        params = pack_hf_state_dict(sd, cfg, dtype=jnp.float32)
        tokens = (np.arange(24, dtype=np.int32)[None, :] * 13
                  ) % cfg.vocab_size
        with torch.no_grad():
            want = hf(torch.from_numpy(tokens)).logits.float().numpy()
        got, _ = forward(params, jnp.asarray(tokens), cfg,
                         compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    def test_mla_yarn_logits(self):
        """DeepSeek-V2 MLA with its yarn dict matches HF."""
        import torch

        from tests.test_mla import CFG, hf_deepseek_and_state, hf_logits
        from llm_fp8_tpu.models.mla import mla_forward, pack_deepseek_state_dict

        yarn = dict(YARN_DEEPSEEK)
        cfg = dc.replace(CFG, rope_scaling=yarn,
                         max_position_embeddings=163840)
        model, _ = hf_deepseek_and_state(cfg)
        # Rebuild the HF model with yarn rope on the same weights.
        from transformers.models.deepseek_v2 import (
            DeepseekV2Config, DeepseekV2ForCausalLM,
        )

        hf_cfg = model.config
        hf_cfg.rope_scaling = dict(yarn)
        hf_cfg.max_position_embeddings = 163840
        torch.manual_seed(0)
        yarn_model = DeepseekV2ForCausalLM(hf_cfg)
        yarn_model.load_state_dict(model.state_dict())
        yarn_model.eval()
        sd = {k: jnp.asarray(v.numpy())
              for k, v in yarn_model.state_dict().items()}
        params = pack_deepseek_state_dict(sd, cfg, dtype=jnp.float32)
        tokens = (np.arange(20, dtype=np.int32)[None, :] * 9
                  ) % cfg.vocab_size
        want = hf_logits(yarn_model, tokens)
        got, _ = mla_forward(params, jnp.asarray(tokens), cfg,
                             compute_dtype=jnp.float32, attn_impl="ref")
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)
