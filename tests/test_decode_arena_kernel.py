"""Fused fp8-arena decode kernel vs the golden reference.

Mirrors the reference's kvcache kernel tests
(``flash-attention-2.8.0/tests/test_flash_attn.py:1907``
``test_flash_attn_kvcache``): ragged lengths, GQA, window, softcap, fp8
storage with descales — each checked against the pure-jnp golden
(`attention_ref`) run on the dequantized cache, plus a repetition
determinism test (their ``test_flash_attn_race_condition`` idiom).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_fp8_tpu.kernels.decode_attention import decode_attention_arena
from llm_fp8_tpu.ops.attention import attention_ref


def make_case(key, B, S, Hq, Hk, D, dtype=jnp.float8_e4m3fn, kv_scale=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, Hq, D), jnp.float32)
    k = jax.random.normal(k2, (B, S, Hk, D), jnp.float32)
    v = jax.random.normal(k3, (B, S, Hk, D), jnp.float32)
    # Store transposed lane-major [1, B, Hk, D, S], quantized.
    integer = jnp.issubdtype(jnp.dtype(dtype), jnp.integer)
    if dtype == jnp.bfloat16:
        fmax = None
    elif integer:
        fmax = float(jnp.iinfo(dtype).max)
    else:
        fmax = float(jnp.finfo(dtype).max)

    def store(x):
        xt = x.transpose(0, 2, 3, 1)[None]  # [1, B, Hk, D, S]
        xs = xt / kv_scale
        if fmax is not None:
            xs = jnp.clip(xs, -fmax, fmax)
        if integer:
            xs = jnp.round(xs)
        return xs.astype(dtype)

    return q, store(k), store(v)


def dequant(arena, kv_scale):
    """[1, B, Hk, D, S] stored -> [B, S, Hk, D] f32 (what the kernel sees)."""
    return arena[0].astype(jnp.float32).transpose(0, 3, 1, 2) * kv_scale


@pytest.mark.parametrize("groups", [1, 4])
@pytest.mark.parametrize("dtype", [jnp.float8_e4m3fn, jnp.bfloat16, jnp.int8])
def test_matches_reference(groups, dtype):
    B, S, Hk, D = 3, 256, 2, 64
    Hq = Hk * groups
    # int8 is fixed-point: give it a realistic calibrated scale (±4σ of a
    # unit normal maps into ±127) — fp8 is a float format and self-ranges.
    kv_scale = (1 / 32) if dtype == jnp.int8 else 1.0
    q, ka, va = make_case(jax.random.PRNGKey(0), B, S, Hq, Hk, D, dtype,
                          kv_scale=kv_scale)
    lens = jnp.asarray([1, 100, 256], jnp.int32)

    got = decode_attention_arena(q, ka, va, lens, 0, chunk=128,
                                 k_scale=kv_scale, v_scale=kv_scale)
    want = attention_ref(
        q[:, None], dequant(ka, kv_scale), dequant(va, kv_scale),
        causal=True, q_offset=lens - 1, kv_lens=lens,
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_kv_scale_descale():
    B, S, Hk, D = 2, 128, 2, 64
    kv_scale = 0.25
    q, ka, va = make_case(
        jax.random.PRNGKey(1), B, S, Hk * 2, Hk, D, kv_scale=kv_scale
    )
    lens = jnp.asarray([64, 128], jnp.int32)
    got = decode_attention_arena(
        q, ka, va, lens, 0, k_scale=kv_scale, v_scale=kv_scale, chunk=128
    )
    want = attention_ref(
        q[:, None], dequant(ka, kv_scale), dequant(va, kv_scale),
        causal=True, q_offset=lens - 1, kv_lens=lens,
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_per_head_descales():
    # FA3 carries per-head q/k/v descales (hopper/flash_attn_interface.py:
    # 631-662); the kernel indexes a [Hk] descale vector per grid cell.
    B, S, Hk, D = 2, 128, 4, 64
    q, ka, va = make_case(jax.random.PRNGKey(2), B, S, Hk, Hk, D)
    lens = jnp.asarray([128, 70], jnp.int32)
    k_sc = jnp.asarray([1.0, 0.5, 2.0, 0.25], jnp.float32)
    v_sc = jnp.asarray([0.5, 1.0, 0.125, 4.0], jnp.float32)

    got = decode_attention_arena(
        q, ka, va, lens, 0, k_scale=k_sc, v_scale=v_sc, chunk=128
    )
    kd = dequant(ka, 1.0) * k_sc[None, None, :, None]
    vd = dequant(va, 1.0) * v_sc[None, None, :, None]
    want = attention_ref(
        q[:, None], kd, vd, causal=True, q_offset=lens - 1, kv_lens=lens
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_window_and_softcap():
    B, S, Hk, D = 2, 256, 2, 64
    q, ka, va = make_case(jax.random.PRNGKey(3), B, S, Hk * 2, Hk, D)
    lens = jnp.asarray([256, 180], jnp.int32)
    for window, softcap in [(64, None), (None, 30.0), (64, 30.0)]:
        got = decode_attention_arena(
            q, ka, va, lens, 0, window=window, softcap=softcap, chunk=128
        )
        want = attention_ref(
            q[:, None], dequant(ka, 1.0), dequant(va, 1.0),
            causal=True, q_offset=lens - 1, kv_lens=lens,
            window=window, softcap=softcap,
        )[:, 0]
        np.testing.assert_allclose(
            got, want, rtol=2e-2, atol=2e-2,
            err_msg=f"window={window} softcap={softcap}",
        )


@pytest.mark.parametrize("groups", [1, 4])
def test_alibi(groups):
    """ALiBi bias in-kernel vs the golden ref (Baichuan-13B's decode path)."""
    from llm_fp8_tpu.ops.attention import alibi_slopes_list

    B, S, Hk, D = 2, 256, 2, 64
    Hq = Hk * groups
    q, ka, va = make_case(jax.random.PRNGKey(20), B, S, Hq, Hk, D)
    lens = jnp.asarray([256, 140], jnp.int32)
    slopes = tuple(alibi_slopes_list(Hq))

    got = decode_attention_arena(
        q, ka, va, lens, 0, alibi_slopes=slopes, chunk=128
    )
    want = attention_ref(
        q[:, None], dequant(ka, 1.0), dequant(va, 1.0),
        causal=True, q_offset=lens - 1, kv_lens=lens,
        alibi_slopes=jnp.asarray(slopes, jnp.float32),
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_forward_decode_arena_alibi_matches_kvcache_path():
    """Whole-model on the ALiBi family (debug-baichuan): the fused-arena
    decode logits must match the plain KVCache path, which carries the bias
    through the XLA decode fast path."""
    from llm_fp8_tpu.models import get_config, init_params, init_kv_cache
    from llm_fp8_tpu.models.llama import forward, forward_decode_arena

    cfg = get_config("debug-baichuan")
    params = init_params(cfg, jax.random.PRNGKey(21), dtype=jnp.float32)
    B, S = 2, 128
    prompt = jax.random.randint(jax.random.PRNGKey(22), (B, 17), 1, 100)

    cache = init_kv_cache(cfg, B, S, dtype=jnp.float8_e4m3fn)
    logits_ref, cache = forward(
        params, prompt, cfg, cache=cache, start_pos=0,
        kv_lens=jnp.full((B,), 17, jnp.int32), attn_impl="ref",
    )
    lens = jnp.full((B,), 17, jnp.int32)

    ka = cache.k.transpose(0, 1, 3, 4, 2)  # [L, B, Hk, D, S]
    va = cache.v.transpose(0, 1, 3, 4, 2)
    tok = jnp.argmax(logits_ref[:, -1], -1).astype(jnp.int32)[:, None]

    logits_a, ka, va = forward_decode_arena(
        params, tok, cfg, ka, va, lens, compute_dtype=jnp.float32
    )
    logits_b, cache = forward(
        params, tok, cfg, cache=cache, start_pos=lens, kv_lens=lens + 1,
        attn_impl="ref",
    )
    np.testing.assert_allclose(
        np.asarray(logits_a[:, 0]), np.asarray(logits_b[:, 0]),
        rtol=2e-2, atol=2e-2,
    )


def test_layer_indexing():
    B, S, Hk, D, L = 2, 128, 2, 64, 3
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, L)
    qs, kas, vas = zip(*[make_case(k, B, S, Hk, Hk, D) for k in ks])
    ka = jnp.concatenate(kas, axis=0)  # [L, B, Hk, D, S]
    va = jnp.concatenate(vas, axis=0)
    lens = jnp.asarray([128, 90], jnp.int32)
    for l in range(L):
        got = decode_attention_arena(qs[l], ka, va, lens, l, chunk=128)
        want = attention_ref(
            qs[l][:, None], dequant(ka[l:l + 1], 1.0),
            dequant(va[l:l + 1], 1.0),
            causal=True, q_offset=lens - 1, kv_lens=lens,
        )[:, 0]
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_deterministic_by_repetition():
    B, S, Hk, D = 2, 256, 2, 64
    q, ka, va = make_case(jax.random.PRNGKey(5), B, S, Hk * 4, Hk, D)
    lens = jnp.asarray([256, 129], jnp.int32)
    first = np.asarray(decode_attention_arena(q, ka, va, lens, 0, chunk=128))
    for _ in range(3):
        again = np.asarray(
            decode_attention_arena(q, ka, va, lens, 0, chunk=128)
        )
        np.testing.assert_array_equal(first, again)


@pytest.mark.parametrize("dtype", [jnp.float8_e4m3fn, jnp.bfloat16, jnp.int8])
def test_in_kernel_append(dtype):
    """With new_k/new_v the kernel quantizes + appends the token at column
    lengths-1, then attends over it (the ``k``/``v`` arguments of the
    reference kvcache kernel, ``flash_attn_interface.py:1464+``)."""
    B, S, Hk, D = 3, 256, 2, 64
    Hq = Hk * 4
    kv_scale = (1 / 32) if dtype == jnp.int8 else 0.5
    q, ka, va = make_case(
        jax.random.PRNGKey(8), B, S, Hq, Hk, D, dtype, kv_scale=kv_scale
    )
    kn, vn = jax.random.split(jax.random.PRNGKey(9))
    # The kernel ships the new token to VMEM as bf16; quantize from bf16.
    new_k = jax.random.normal(kn, (B, Hk, D), jnp.float32).astype(jnp.bfloat16)
    new_v = jax.random.normal(vn, (B, Hk, D), jnp.float32).astype(jnp.bfloat16)
    # lengths INCLUDE the new token; place them straddling tile boundaries.
    lens = jnp.asarray([1, 128, 200], jnp.int32)

    got, ka2, va2 = decode_attention_arena(
        q, ka, va, lens, 0, new_k=new_k, new_v=new_v,
        k_scale=kv_scale, v_scale=kv_scale, chunk=128,
    )

    # (a) the arena was updated in the right column, quantized at the scale
    integer = jnp.issubdtype(jnp.dtype(dtype), jnp.integer)
    if dtype == jnp.bfloat16:
        fmax = None
    else:
        fmax = (float(jnp.iinfo(dtype).max) if integer
                else float(jnp.finfo(dtype).max))
    for b, ln in enumerate([1, 128, 200]):
        col = np.asarray(ka2[0, b, :, :, ln - 1].astype(jnp.float32))
        wantc = new_k[b] / kv_scale
        if fmax is not None:
            wantc = jnp.clip(wantc, -fmax, fmax)
        if integer:
            wantc = jnp.round(wantc)
        wantc = np.asarray(wantc.astype(dtype).astype(jnp.float32))
        np.testing.assert_array_equal(col, wantc)
        # neighbours untouched
        if ln >= 2:
            np.testing.assert_array_equal(
                np.asarray(ka2[0, b, :, :, ln - 2]),
                np.asarray(ka[0, b, :, :, ln - 2]))

    # (b) attention matches the golden run on the post-append cache
    want = attention_ref(
        q[:, None], dequant(ka2, kv_scale), dequant(va2, kv_scale),
        causal=True, q_offset=lens - 1, kv_lens=lens,
    )[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_append_matches_separate_append_then_attend():
    """In-kernel append ≡ XLA append followed by the attend-only kernel."""
    B, S, Hk, D = 2, 256, 2, 64
    kv_scale = 0.25
    q, ka, va = make_case(
        jax.random.PRNGKey(10), B, S, Hk * 2, Hk, D, kv_scale=kv_scale
    )
    new_k = jax.random.normal(
        jax.random.PRNGKey(11), (B, Hk, D), jnp.float32).astype(jnp.bfloat16)
    new_v = jax.random.normal(
        jax.random.PRNGKey(12), (B, Hk, D), jnp.float32).astype(jnp.bfloat16)
    lens = jnp.asarray([77, 256], jnp.int32)

    got, ka2, va2 = decode_attention_arena(
        q, ka, va, lens, 0, new_k=new_k, new_v=new_v,
        k_scale=kv_scale, v_scale=kv_scale, chunk=128,
    )

    fmax = float(jnp.finfo(ka.dtype).max)

    def xla_append(arena, new):
        out = arena
        for b in range(B):
            col = jnp.clip(new[b] / kv_scale, -fmax, fmax).astype(arena.dtype)
            out = out.at[0, b, :, :, lens[b] - 1].set(col)
        return out

    ka_x = xla_append(ka, new_k)
    va_x = xla_append(va, new_v)
    np.testing.assert_array_equal(np.asarray(ka2), np.asarray(ka_x))
    np.testing.assert_array_equal(np.asarray(va2), np.asarray(va_x))
    want = decode_attention_arena(
        q, ka_x, va_x, lens, 0, k_scale=kv_scale, v_scale=kv_scale, chunk=128
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_decode_arena_matches_kvcache_path():
    """Whole-model: the fused-arena decode path must produce the same logits
    as the existing KVCache fp8 path (same quantization, same math)."""
    from llm_fp8_tpu.models import get_config, init_params, init_kv_cache
    from llm_fp8_tpu.models.llama import forward, forward_decode_arena

    cfg = get_config("debug-tiny")
    params = init_params(cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    B, S = 2, 128
    L, Hk, D = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    prompt = jax.random.randint(jax.random.PRNGKey(7), (B, 17), 1, 100)

    # Existing path: fp8 KVCache arena [L, B, S, Hk, D].
    cache = init_kv_cache(cfg, B, S, dtype=jnp.float8_e4m3fn)
    logits_ref, cache = forward(
        params, prompt, cfg, cache=cache, start_pos=0,
        kv_lens=jnp.full((B,), 17, jnp.int32), attn_impl="ref",
    )
    lens = jnp.full((B,), 17, jnp.int32)

    # Fused path: transpose the same quantized cache into the lane-major
    # arena and decode one token.
    ka = cache.k.transpose(0, 1, 3, 4, 2)  # [L, B, Hk, D, S]
    va = cache.v.transpose(0, 1, 3, 4, 2)
    tok = jnp.argmax(logits_ref[:, -1], -1).astype(jnp.int32)[:, None]

    logits_a, ka, va = forward_decode_arena(
        params, tok, cfg, ka, va, lens, compute_dtype=jnp.float32
    )
    logits_b, cache = forward(
        params, tok, cfg, cache=cache, start_pos=lens, kv_lens=lens + 1,
        attn_impl="ref",
    )
    np.testing.assert_allclose(
        np.asarray(logits_a[:, 0]), np.asarray(logits_b[:, 0]),
        rtol=2e-2, atol=2e-2,
    )


@pytest.mark.fast
def test_in_kernel_rotary_matches_pre_rotated():
    """rope_cos_sin in the kernel ≡ XLA apply_rope before the call — the
    fused-rotary contract of flash_attn_with_kvcache
    (flash_attn_interface.py:1464+, csrc/flash_attn/src/rotary.h)."""
    from llm_fp8_tpu.ops.rotary import apply_rope, rope_cos_sin, rope_frequencies

    B, S, Hk, D = 2, 256, 2, 64
    Hq = Hk * 2
    kv_scale = 0.25
    q, ka, va = make_case(
        jax.random.PRNGKey(20), B, S, Hq, Hk, D, kv_scale=kv_scale)
    new_k = jax.random.normal(jax.random.PRNGKey(21), (B, Hk, D), jnp.float32)
    new_v = jax.random.normal(jax.random.PRNGKey(22), (B, Hk, D), jnp.float32)
    lens = jnp.asarray([77, 256], jnp.int32)
    positions = (lens - 1)[:, None]
    inv_freq = rope_frequencies(D, 500000.0, None)
    cos, sin = rope_cos_sin(positions, inv_freq, None)  # [B, 1, D/2]

    got, ka_f, va_f = decode_attention_arena(
        q, ka, va, lens, 0, new_k=new_k, new_v=new_v,
        rope_cos_sin=(cos[:, 0], sin[:, 0]),
        k_scale=kv_scale, v_scale=kv_scale, chunk=128,
    )
    q_rot = apply_rope(q[:, None], cos, sin)[:, 0]
    k_rot = apply_rope(new_k[:, None, None].reshape(B, 1, Hk, D), cos, sin)
    want, ka_w, va_w = decode_attention_arena(
        q_rot, ka, va, lens, 0, new_k=k_rot[:, 0], new_v=new_v,
        k_scale=kv_scale, v_scale=kv_scale, chunk=128,
    )
    # The fused path rotates in f32 straight into fp8; the reference path
    # rounds the rotated K through bf16 first — the appended column may
    # differ by one quantization step. Compare dequantized within that.
    np.testing.assert_allclose(
        np.asarray(dequant(ka_f, kv_scale)), np.asarray(dequant(ka_w, kv_scale)),
        rtol=0.11, atol=0.02)
    np.testing.assert_array_equal(np.asarray(va_f), np.asarray(va_w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
