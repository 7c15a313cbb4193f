"""ViT encoder vs HuggingFace on identical weights (the reference's
``flash_attn/models/vit.py`` + ``tests/models/test_vit.py`` parity idiom)."""
import numpy as np
import jax
import jax.numpy as jnp

from llm_fp8_tpu.models.vit import (
    VIT_REGISTRY, init_vit_params, vit_forward, pack_vit_state_dict, patchify,
)

CFG = VIT_REGISTRY["debug-vit"]


def _pixels(seed=0, batch=2):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        (batch, CFG.num_channels, CFG.image_size, CFG.image_size)
    ).astype(np.float32)


def test_hf_parity():
    import torch
    from transformers import ViTConfig as HFConfig, ViTModel

    torch.manual_seed(5)
    hf_cfg = HFConfig(
        image_size=CFG.image_size,
        patch_size=CFG.patch_size,
        num_channels=CFG.num_channels,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=CFG.ln_eps,
    )
    model = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: jnp.asarray(v.numpy()) for k, v in model.state_dict().items()}
    params = pack_vit_state_dict(sd, CFG)
    px = _pixels()
    with torch.no_grad():
        want = model(torch.from_numpy(px)).last_hidden_state.numpy()
    got = vit_forward(params, jnp.asarray(px), CFG, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_patchify_matches_conv():
    """The reshape-patchify ≡ the stride==kernel conv it replaces."""
    import torch

    px = _pixels(1, batch=1)
    torch.manual_seed(6)
    conv = torch.nn.Conv2d(
        CFG.num_channels, CFG.hidden_size,
        kernel_size=CFG.patch_size, stride=CFG.patch_size,
    )
    with torch.no_grad():
        want = conv(torch.from_numpy(px)).flatten(2).transpose(1, 2).numpy()
    w = jnp.asarray(conv.weight.detach().numpy()).reshape(
        CFG.hidden_size, CFG.patch_dim
    ).T
    got = patchify(jnp.asarray(px), CFG) @ w + jnp.asarray(
        conv.bias.detach().numpy()
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_fp8_quantized_weights_run():
    from llm_fp8_tpu.quant import quantize
    from llm_fp8_tpu.quant.formats import E4M3

    params = init_vit_params(CFG, jax.random.PRNGKey(0))
    px = jnp.asarray(_pixels(2))
    base = vit_forward(params, px, CFG, attn_impl="ref")
    for name in ("w_qkv", "w_out", "w_fc", "w_proj"):
        params["layers"][name] = quantize(
            params["layers"][name].astype(jnp.float32), E4M3, axes=(1,)
        )
    got = vit_forward(params, px, CFG, attn_impl="ref")
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=0.15, atol=0.15)


def test_flash_matches_ref_impl():
    """Bidirectional (causal=False) path through the flash kernel."""
    params = init_vit_params(CFG, jax.random.PRNGKey(1))
    px = jnp.asarray(_pixels(3))
    a = vit_forward(params, px, CFG, attn_impl="ref")
    b = vit_forward(params, px, CFG, attn_impl="flash")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-3)
