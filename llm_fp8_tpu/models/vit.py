"""ViT-class vision encoder: patchify → [CLS] + learned positions → pre-LN
transformer.

The reference's zoo includes ViT on the same attention kernels
(``flash_attn/models/vit.py:60-178``: ``PatchEmbed`` conv + ``Block`` with
``Mha``). TPU-native form: the patchify convolution IS a matmul — stride ==
kernel means non-overlapping patches, so it lowers to a reshape + one
``[p*p*C, D]`` GEMM on the MXU instead of a conv, and the encoder reuses the
shared ``attention`` op (bidirectional) and quant stack like every other
family here.

Same functional conventions as the rest of the zoo: stacked layer params,
``lax.scan`` forward, weights usable as plain arrays or prequantized fp8
``QTensor``s.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from llm_fp8_tpu.ops.attention import attention
from llm_fp8_tpu.ops.layernorm import layernorm
from llm_fp8_tpu.quant import QTensor, qdot

__all__ = ["ViTConfig", "VIT_REGISTRY", "init_vit_params", "vit_forward",
           "pack_vit_state_dict"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    name: str
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    ln_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def patch_dim(self) -> int:
        return self.num_channels * self.patch_size ** 2


VIT_REGISTRY = {
    "vit-base-patch16-224": ViTConfig(name="vit-base-patch16-224"),
    "vit-large-patch16-224": ViTConfig(
        name="vit-large-patch16-224", hidden_size=1024,
        intermediate_size=4096, num_layers=24, num_heads=16),
    "debug-vit": ViTConfig(name="debug-vit", image_size=32, patch_size=8,
                           hidden_size=64, intermediate_size=128,
                           num_layers=2, num_heads=4),
}


def init_vit_params(cfg: ViTConfig, key: jax.Array, dtype=jnp.float32):
    k = iter(jax.random.split(key, 8))
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers

    def w(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    return {
        "patch_w": w(next(k), (cfg.patch_dim, D)),
        "patch_b": jnp.zeros((D,), dtype),
        "cls": w(next(k), (1, 1, D)),
        "pos": w(next(k), (1, cfg.num_patches + 1, D), 0.01),
        "layers": {
            "ln1_w": jnp.ones((L, D), dtype), "ln1_b": jnp.zeros((L, D), dtype),
            "ln2_w": jnp.ones((L, D), dtype), "ln2_b": jnp.zeros((L, D), dtype),
            "w_qkv": w(next(k), (L, D, 3 * D)),
            "b_qkv": jnp.zeros((L, 3 * D), dtype),
            "w_out": w(next(k), (L, D, D)),
            "b_out": jnp.zeros((L, D), dtype),
            "w_fc": w(next(k), (L, D, I)),
            "b_fc": jnp.zeros((L, I), dtype),
            "w_proj": w(next(k), (L, I, D)),
            "b_proj": jnp.zeros((L, D), dtype),
        },
        "lnf_w": jnp.ones((D,), dtype),
        "lnf_b": jnp.zeros((D,), dtype),
    }


def pack_vit_state_dict(sd: Dict[str, jax.Array], cfg: ViTConfig,
                        dtype=jnp.float32):
    """HF ``ViTModel`` state dict → stacked params. The patch-conv kernel
    ``[D, C, p, p]`` flattens to the ``[(C, ph, pw), D]`` matmul weight;
    separate q/k/v Linears ``[out, in]`` concatenate transposed."""
    def g(name):
        return jnp.asarray(sd[name]).astype(dtype)

    L = cfg.num_layers
    pre = "encoder.layer.{}."

    def qkv_w(i):
        p = pre.format(i) + "attention.attention."
        return jnp.concatenate(
            [g(p + "query.weight").T, g(p + "key.weight").T,
             g(p + "value.weight").T], axis=1,
        )

    def qkv_b(i):
        p = pre.format(i) + "attention.attention."
        return jnp.concatenate(
            [g(p + "query.bias"), g(p + "key.bias"), g(p + "value.bias")]
        )

    stack = lambda fmt, tr=False: jnp.stack(  # noqa: E731
        [g(fmt.format(i)).T if tr else g(fmt.format(i)) for i in range(L)]
    )
    conv = g("embeddings.patch_embeddings.projection.weight")  # [D, C, p, p]
    return {
        "patch_w": conv.reshape(cfg.hidden_size, cfg.patch_dim).T,
        "patch_b": g("embeddings.patch_embeddings.projection.bias"),
        "cls": g("embeddings.cls_token"),
        "pos": g("embeddings.position_embeddings"),
        "layers": {
            "ln1_w": stack(pre + "layernorm_before.weight"),
            "ln1_b": stack(pre + "layernorm_before.bias"),
            "ln2_w": stack(pre + "layernorm_after.weight"),
            "ln2_b": stack(pre + "layernorm_after.bias"),
            "w_qkv": jnp.stack([qkv_w(i) for i in range(L)]),
            "b_qkv": jnp.stack([qkv_b(i) for i in range(L)]),
            "w_out": stack(pre + "attention.output.dense.weight", tr=True),
            "b_out": stack(pre + "attention.output.dense.bias"),
            "w_fc": stack(pre + "intermediate.dense.weight", tr=True),
            "b_fc": stack(pre + "intermediate.dense.bias"),
            "w_proj": stack(pre + "output.dense.weight", tr=True),
            "b_proj": stack(pre + "output.dense.bias"),
        },
        "lnf_w": g("layernorm.weight"),
        "lnf_b": g("layernorm.bias"),
    }


def _dot(x, w):
    if isinstance(w, QTensor):
        return qdot(x, w)
    return jnp.dot(
        x, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def patchify(pixels: jax.Array, cfg: ViTConfig) -> jax.Array:
    """``[B, C, H, W] -> [B, num_patches, (C, ph, pw)]`` — the stride==kernel
    conv as a pure reshape (flatten order matches the HF conv kernel)."""
    B, C, H, W = pixels.shape
    p = cfg.patch_size
    x = pixels.reshape(B, C, H // p, p, W // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, nh, nw, C, ph, pw]
    return x.reshape(B, (H // p) * (W // p), C * p * p)


def vit_forward(
    params: Dict[str, Any],
    pixels: jax.Array,  # [B, C, H, W] (HF channel-first convention)
    cfg: ViTConfig,
    *,
    attn_impl: str = "auto",
    compute_dtype=jnp.float32,
) -> jax.Array:
    """``pixels -> last hidden state [B, 1 + num_patches, D]`` (post-LN),
    matching HF ``ViTModel(add_pooling_layer=False)``. Row 0 is [CLS]."""
    B = pixels.shape[0]
    D, H, Dh = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    x = _dot(patchify(pixels.astype(compute_dtype), cfg), params["patch_w"])
    x = x + params["patch_b"].astype(x.dtype)
    cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"].astype(x.dtype)
    S = x.shape[1]

    def body(x, lp):
        h = layernorm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        qkv = _dot(h, lp["w_qkv"]) + lp["b_qkv"].astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, Dh)
        k = k.reshape(B, S, H, Dh)
        v = v.reshape(B, S, H, Dh)
        a = attention(q, k, v, causal=False, impl=attn_impl)
        x = x + _dot(a.reshape(B, S, D), lp["w_out"]) + lp["b_out"].astype(x.dtype)

        h = layernorm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        h = _dot(h, lp["w_fc"]) + lp["b_fc"].astype(x.dtype)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x + _dot(h, lp["w_proj"]) + lp["b_proj"].astype(x.dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return layernorm(x, params["lnf_w"], params["lnf_b"], cfg.ln_eps)
