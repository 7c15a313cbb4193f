"""Paged-attention decode kernel: flash decode over a block-table KV cache.

Device half of the paged KV cache (host half:
``llm_fp8_tpu.serving.block_table``). Equivalent of the reference's paged-KV
decode path — ``flash_attn_with_kvcache`` with ``block_table``
(``csrc/flash_attn/flash_api.cpp:557-581, 1202+``) and the FA3 ``paged_kv.h``
machinery — re-designed for TPU: pages live in HBM; the kernel DMAs each
sequence's pages into a double-buffered VMEM scratch (overlapping the next
page's fetch with the current page's math) and runs online softmax per page.

Layout (pool-first, vLLM-style: ONE block table shared by all layers — each
physical page stores every layer's K/V for its token span):
  q:        [B, Hq, D]                  (one decode token per sequence)
  k_pages:  [P, L, Hk, D, page_size]    (fp8 e4m3 or bf16; lane-major — the
            page axis sits on the 128-lane dimension so per-page DMA slices
            stay tile-aligned for any head_dim, and K arrives
            contraction-major for the q·k matmul)
  v_pages:  [P, L, Hk, D, page_size]
  lengths:  [B] int32                   valid tokens per sequence
  page_tables: [B, max_pages] int32     physical page ids; entries beyond
            ceil(length/page_size) are padding — the grouped fetch may
            still DMA them (results are masked), so ids are clamped to
            [0, P-1] in-kernel and padding may be any value
  layer_idx: scalar int32               which layer's slab to read
Output: [B, Hq, D] — or ``(out, k_pages, v_pages)`` when ``new_k/new_v``
are given: the kernel first quantizes (by ``1/kv_scale``) and appends the
new token at position ``lengths-1`` of each sequence's current page via
one aligned [Hk, D, 128] tile RMW (pools aliased in-place), then attends
over ``lengths`` tokens — the ``flash_attn_with_kvcache`` k_new/v_new
semantics (``csrc/flash_attn/flash_api.cpp:557-581``) on the paged pool.

GQA is packed into sublanes: the kernel processes one (batch, kv-head) pair
per grid cell with all ``Hq/Hk`` grouped query heads as rows of a single
MXU operand (the reference's ``pack_gqa`` idea, ``hopper/pack_gqa.h``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_fp8_tpu.kernels._common import fp8_to_bf16_ftz

__all__ = ["paged_attention"]

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(
    # scalar prefetch
    lengths_ref,  # [B]
    tables_ref,  # [B, max_pages]
    layer_ref,  # [1]
    # inputs
    q_ref,  # [1, Hk, G8, D] VMEM (grouped q heads, padded to 8 sublanes)
    alibi_ref,  # [Hk, 1, G8] VMEM — per-KV-head ALiBi slopes (0s if unused)
    *rest,  # [new_k, new_v,] k_pages, v_pages, o, [k_out, v_out,] scratch
    page_size: int,
    max_pages: int,
    nf: int,
    scale: float,
    kv_scale: float,
    window: Optional[int],
    softcap: Optional[float],
    has_alibi: bool,
    append: bool,
):
    if append:
        (new_k_ref, new_v_ref, k_in_ref, v_in_ref,
         o_ref, k_pages_ref, v_pages_ref,
         k_buf, v_buf, sems, tile_buf, tile_sems) = rest
    else:
        (k_pages_ref, v_pages_ref, o_ref, k_buf, v_buf, sems) = rest
    # One grid cell per SEQUENCE; each loop iteration fetches a GROUP of
    # ``nf`` pages, each as one whole [Hk, D, page] slab (contiguous in the
    # pool layout), into a wide double-buffered VMEM tile [Hk, D, nf·page].
    # Two designs measured slower on-chip (8k context, Llama-1B geometry):
    #   * per-(b, h) page DMAs (~130k × 16 KB/step): ~120 ms/step;
    #   * per-page slab DMAs, grid (B,): still DMA-ISSUE-latency-bound —
    #     512 sequential ~8 µs loop iterations/layer = 15 GiB/s effective.
    # Grouping puts 2·nf copies in flight per iteration and widens the MXU
    # dots to nf·page lanes, amortizing the scalar-core issue cost.
    b = pl.program_id(0)
    length = lengths_ref[b]
    layer = layer_ref[0]
    group = nf * page_size
    n_groups = jax.lax.div(length + group - 1, group)

    def start_fetch(slot, group_idx):
        for j in range(nf):  # static unroll: 2*nf DMAs in flight
            idx = jnp.minimum(group_idx * nf + j, max_pages - 1)
            # Clamp to the pool: table entries past the sequence's valid
            # page count are padding the grouped fetch still reads (their
            # lanes are masked out of the softmax) — a caller padding with
            # -1/garbage must not turn into an out-of-pool DMA.
            page = jnp.minimum(
                jnp.maximum(tables_ref[b, idx], 0),
                k_pages_ref.shape[0] - 1)
            pltpu.make_async_copy(
                k_pages_ref.at[page, layer],
                k_buf.at[slot, :, :, pl.ds(j * page_size, page_size)],
                sems.at[slot, 0, j],
            ).start()
            pltpu.make_async_copy(
                v_pages_ref.at[page, layer],
                v_buf.at[slot, :, :, pl.ds(j * page_size, page_size)],
                sems.at[slot, 1, j],
            ).start()

    def wait_fetch(slot):
        for j in range(nf):
            pltpu.make_async_copy(
                k_pages_ref.at[0, 0],
                k_buf.at[slot, :, :, pl.ds(j * page_size, page_size)],
                sems.at[slot, 0, j],
            ).wait()
            pltpu.make_async_copy(
                v_pages_ref.at[0, 0],
                v_buf.at[slot, :, :, pl.ds(j * page_size, page_size)],
                sems.at[slot, 1, j],
            ).wait()

    # ---- in-kernel quantize + append of the new token ----
    # The XLA alternative (scatter/dynamic_update_slice with a dynamic
    # LANE-dim offset into the pool) copies the whole multi-GB pool per
    # layer per step — measured ~1.2 s/step at 8k/B8 (r5 probe; the
    # same pathology the arena kernel's in-kernel append fixed in r2).
    # Here: one aligned [Hk, D, 128] tile RMW on the sequence's current
    # page. Requantizing the 127 resident columns at the same scale is
    # the identity, so a plain f32 `where` inserts the column.
    if append:
        p_new = length - 1
        # lax.div, not //: floor_divide's closed_call has no Mosaic/interpret
        # lowering (non-negative operands, so trunc == floor).
        page_new = jnp.minimum(
            jnp.maximum(tables_ref[b, jax.lax.div(p_new, page_size)], 0),
            k_pages_ref.shape[0] - 1)
        off_in_page = jax.lax.rem(p_new, page_size)
        # RMW tile: one 128-lane tile on TPU (page_size is a 128-multiple
        # there); interpret-mode tests may use smaller pages.
        tile_w = min(128, page_size)
        ts = jax.lax.div(off_in_page, tile_w) * tile_w

        rk = pltpu.make_async_copy(
            k_in_ref.at[page_new, layer, :, :, pl.ds(ts, tile_w)],
            tile_buf.at[0], tile_sems.at[0],
        )
        rv = pltpu.make_async_copy(
            v_in_ref.at[page_new, layer, :, :, pl.ds(ts, tile_w)],
            tile_buf.at[1], tile_sems.at[1],
        )
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()

        kq = new_k_ref[0].astype(jnp.float32) / kv_scale  # [Hk, D]
        vq = new_v_ref[0].astype(jnp.float32) / kv_scale
        integer = jnp.issubdtype(tile_buf.dtype, jnp.integer)
        if tile_buf.dtype != new_k_ref.dtype:
            fmax_store = (float(jnp.iinfo(tile_buf.dtype).max) if integer
                          else float(jnp.finfo(tile_buf.dtype).max))
            # Saturate before the narrow cast (fp8 overflow -> NaN; int8
            # astype would wrap), round for integer storage.
            # max/min, not jnp.clip: multiple clip closed_calls in one
            # kernel hit a lowering-cache collision (KeyError in mlir).
            kq = jnp.minimum(jnp.maximum(kq, -fmax_store), fmax_store)
            vq = jnp.minimum(jnp.maximum(vq, -fmax_store), fmax_store)
            if integer:
                kq = jnp.round(kq)
                vq = jnp.round(vq)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, tile_buf.shape[1:], 2)
        off = off_in_page - ts
        tile_buf[0] = jnp.where(
            lane == off, kq[:, :, None], tile_buf[0].astype(jnp.float32)
        ).astype(tile_buf.dtype)
        tile_buf[1] = jnp.where(
            lane == off, vq[:, :, None], tile_buf[1].astype(jnp.float32)
        ).astype(tile_buf.dtype)

        # Write back through the ALIASED output refs; the fetch loop below
        # reads those same refs, so it observes the new column.
        wk = pltpu.make_async_copy(
            tile_buf.at[0],
            k_pages_ref.at[page_new, layer, :, :, pl.ds(ts, tile_w)],
            tile_sems.at[0],
        )
        wv = pltpu.make_async_copy(
            tile_buf.at[1],
            v_pages_ref.at[page_new, layer, :, :, pl.ds(ts, tile_w)],
            tile_sems.at[1],
        )
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    @pl.when(n_groups > 0)
    def _():
        start_fetch(0, 0)

    # Fold the softmax scale AND the K-side descale into q once (the V-side
    # descale is one multiply in the epilogue) — MXU operands stay bf16 and
    # no per-group f32 dequant copy of K/V is materialized (same discipline
    # as the arena kernel; measured 4× on fp8 pages, where the old
    # f32-astype path paid the Mosaic software convert per byte).
    qh = (q_ref[0].astype(jnp.float32) * (scale * kv_scale)).astype(
        jnp.bfloat16
    )  # [Hk, G8, D]
    Hk, G8, D = qh.shape
    HG = Hk * G8

    def body(i, carry):
        m, l, acc = carry  # [HG, 1], [HG, 1], [HG, D]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_groups)
        def _():
            start_fetch(1 - slot, i + 1)

        wait_fetch(slot)
        pos = i * group + jax.lax.broadcasted_iota(
            jnp.int32, (HG, group), 1
        )
        # Per-head scores on the VMEM-resident group (the kv heads are
        # independent contractions, so the head loop is unrolled into Hk
        # MXU dots of nf·page lanes each), stacked back to [HG, group]
        # rows matching q's (head-major) packing.
        parts = []
        for h in range(Hk):
            kh = fp8_to_bf16_ftz(k_buf[slot, h])  # [D, group] bf16
            sh = jax.lax.dot(qh[h], kh, preferred_element_type=jnp.float32)
            if softcap is not None:
                sh = softcap * jnp.tanh(sh / softcap)
            if has_alibi:
                # ALiBi bias after softcap (flash-kernel ordering). The
                # decode token is at position length-1 ≥ every valid k
                # position, so -slope·|q_pos - k_pos| =
                # slope·(pos - (length-1)).
                slope = alibi_ref[h, 0][:, None]  # [G8, 1]
                ph = i * group + jax.lax.broadcasted_iota(
                    jnp.int32, (G8, group), 1
                )
                sh = sh + slope * (ph - (length - 1)).astype(jnp.float32)
            parts.append(sh)
        s = jnp.concatenate(parts, axis=0)  # [HG, group]
        mask = pos < length
        if window is not None:
            # The decode token sits at absolute position length-1.
            mask &= pos > (length - 1) - window
        s = jnp.where(mask, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        # p rows [G8, group] · v [D, group] contracted over the group axis,
        # per head (bf16 operands; the V descale is applied in the epilogue).
        pb = p.astype(jnp.bfloat16)
        pv_parts = []
        for h in range(Hk):
            vh = fp8_to_bf16_ftz(v_buf[slot, h])  # [D, group] bf16
            pv_parts.append(jax.lax.dot_general(
                pb[h * G8:(h + 1) * G8], vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        acc_next = acc * alpha + jnp.concatenate(pv_parts, axis=0)
        return m_next, l_next, acc_next

    init = (
        jnp.full((HG, 1), -jnp.inf, jnp.float32),
        jnp.zeros((HG, 1), jnp.float32),
        jnp.zeros((HG, D), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_groups, body, init)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    # kv_scale here is the V-side descale (the K side rode in with q).
    o_ref[0] = (acc * (l_inv * kv_scale)).reshape(Hk, G8, D).astype(
        o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "kv_scale", "window", "softcap", "alibi_slopes",
                     "interpret", "pages_per_fetch"),
)
def paged_attention(
    q: jax.Array,  # [B, Hq, D]
    k_pages: jax.Array,  # [P, L, Hk, D, page]
    v_pages: jax.Array,
    lengths: jax.Array,  # [B]
    page_tables: jax.Array,  # [B, max_pages]
    layer_idx: jax.Array | int = 0,
    *,
    scale: Optional[float] = None,
    kv_scale: float = 1.0,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    alibi_slopes: Optional[tuple] = None,  # [Hq] floats, hashable (static)
    interpret: Optional[bool] = None,
    pages_per_fetch: int = 8,
    new_k: Optional[jax.Array] = None,  # [B, Hk, D] raw (rotated) new token
    new_v: Optional[jax.Array] = None,
):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Hq, D = q.shape
    P, L, Hk, _, page_size = k_pages.shape
    if not interpret and page_size % 128 != 0:
        raise ValueError(
            f"page_size {page_size} must be a multiple of 128 on TPU "
            "(per-page DMA slices sit on the 128-lane axis)"
        )
    groups = Hq // Hk
    max_pages = page_tables.shape[1]
    nf = max(1, min(pages_per_fetch, max_pages))
    scale = scale if scale is not None else D ** -0.5
    layer_idx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    # Pack grouped q heads into sublanes, padded to the f32 min tile (8).
    G8 = max(8, groups)
    qg = q.reshape(B, Hk, groups, D)
    if G8 != groups:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, G8 - groups), (0, 0)))

    has_alibi = alibi_slopes is not None
    if has_alibi:
        # [Hq] flat slopes -> [Hk, G8] array matching the q packing; passed
        # as a tiny VMEM input (Pallas kernels cannot capture constants) with
        # the BlockSpec handing each (b, h) cell its own KV head's row.
        flat = tuple(float(s) for s in alibi_slopes)
        assert len(flat) == Hq, (len(flat), Hq)
        # 3-D [Hk, 1, G8]: the trailing (1, G8) block equals the array's own
        # trailing dims, satisfying Mosaic's (8, 128) block-divisibility rule.
        alibi_arr = jnp.asarray(
            [flat[h * groups:(h + 1) * groups] + (0.0,) * (G8 - groups)
             for h in range(Hk)],
            jnp.float32,
        )[:, None, :]
    else:
        alibi_arr = jnp.zeros((Hk, 1, G8), jnp.float32)

    append = new_k is not None
    kernel = functools.partial(
        _kernel,
        page_size=page_size,
        max_pages=max_pages,
        nf=nf,
        scale=scale,
        kv_scale=kv_scale,
        window=window,
        softcap=softcap,
        has_alibi=has_alibi,
        append=append,
    )

    base_scratch = [
        pltpu.VMEM((2, Hk, D, nf * page_size), k_pages.dtype),
        pltpu.VMEM((2, Hk, D, nf * page_size), v_pages.dtype),
        pltpu.SemaphoreType.DMA((2, 2, nf)),
    ]
    q_spec = pl.BlockSpec((1, Hk, G8, D), lambda b, *_: (b, 0, 0, 0))
    alibi_spec = pl.BlockSpec((Hk, 1, G8), lambda b, *_: (0, 0, 0))
    o_spec = pl.BlockSpec((1, Hk, G8, D), lambda b, *_: (b, 0, 0, 0))
    o_shape = jax.ShapeDtypeStruct((B, Hk, G8, D), q.dtype)

    if append:
        out, k_pages, v_pages = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B,),
                in_specs=[
                    q_spec,
                    alibi_spec,
                    pl.BlockSpec((1, Hk, D), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec((1, Hk, D), lambda b, *_: (b, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),  # pools stay in HBM
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=(
                    o_spec,
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ),
                scratch_shapes=base_scratch + [
                    pltpu.VMEM((2, Hk, D, min(128, page_size)),
                               k_pages.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=(
                o_shape,
                jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
            ),
            # Inputs (scalar prefetch included) are (lengths, tables, layer,
            # q, alibi, new_k, new_v, k_pages, v_pages): alias the pools to
            # outputs 1/2 → the append RMW is in-place in HBM.
            input_output_aliases={7: 1, 8: 2},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(lengths, page_tables, layer_idx, qg, alibi_arr,
          new_k, new_v, k_pages, v_pages)
        return out[:, :, :groups].reshape(B, Hq, D), k_pages, v_pages

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[
                q_spec,
                alibi_spec,
                pl.BlockSpec(memory_space=pl.ANY),  # k pages stay in HBM
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=o_spec,
            scratch_shapes=base_scratch,
        ),
        out_shape=o_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths, page_tables, layer_idx, qg, alibi_arr, k_pages, v_pages)

    return out[:, :, :groups].reshape(B, Hq, D)
