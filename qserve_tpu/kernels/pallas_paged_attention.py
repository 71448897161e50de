"""Pallas TPU paged decode attention with fused KV4/KV8 dequantization (N4b).

TPU-native replacement for the reference's TRT-LLM-derived MMHA kernel
(decoderMaskedMultiheadAttentionTemplate.hpp): one pass over each sequence's
quantized paged KV history with fused dequant, fp32 online softmax, and V
accumulation. Design:

  * KV pages are gathered by *array index* from the block table (scalar-
    prefetched into SMEM), not via raw device pointers (KVBlockArray);
  * the kernel reads the FULL stacked cache at a layer index — the layer
    loop above never slices the multi-GB arrays;
  * the CURRENT token's K/V are direct inputs and self-attend in-kernel
    (appends are deferred and batched; the reference MMHA also self-attends,
    Template.hpp:1221-1349) — the cache covers positions < ctx-1;
  * the grid is (batch,) with megacore batch parallelism; PCHUNK pages are
    processed per loop iteration (one DMA per page, NBUF chunk buffers in
    flight) — the TPU analog of K_LOOP_UNROLL/cp.async scale preloading
    (Template.hpp:918-953) with per-iteration fixed costs amortized over
    PCHUNK*ps slots;
  * KV4 nibbles unpack with the packed-word mask trick (the reference's
    `w & 0x0F0F0F0F` LOP3 dequant, Utils.h:1943-1953, on VPU terms:
    pltpu.bitcast to int32, one mask op per 4 bytes);
  * ALL kv heads are processed by single MXU ops via a block-diagonal query
    matrix: Q_blk [H*G, H*Dc] holds head h's queries in lane block h, so
      scores = Q_blk(int8) @ k_plane^T   -- one s8xs8 MXU op per nibble plane
    (q is requantized per (head, group) row to int8, and the K plane feeds
    the MXU straight from the nibble unpack with NO int->float conversion —
    the decode analog of the W4A8 GEMM's progressive dequant);
  * per-slot scale/zero fold in as row-vector multiply-adds on the
    [H*G, PCHUNK*ps] score block; the V side requantizes (p*vs) rows to int8
    so PV is also a straight s8 x s8 dot (SageAttention-style int8-P; error
    below the KV4 noise floor). Only the diagonal head blocks of pv_full are
    kept (cheap selects; the MXU was idle regardless).

Constraints (dispatcher falls back to XLA otherwise): page_size % 128 == 0
and head_dim % 128 == 0. QSERVE_TPU_EXACT_ATTN=1 forces the full-float XLA
fallback for accuracy studies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _unpack_nibbles(x_i8, interpret: bool):
    """[S, N] int8 packed -> (lo, hi) [S, N] int8 values 0..15 (per byte)."""
    if interpret:
        x = x_i8.astype(jnp.int32)
        return ((x & 0xF).astype(jnp.int8),
                ((x >> 4) & 0xF).astype(jnp.int8))
    x = pltpu.bitcast(x_i8, jnp.int32)
    lo = pltpu.bitcast(x & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast(jax.lax.shift_right_logical(x, 4) & 0x0F0F0F0F, jnp.int8)
    return lo, hi


def _paged_attn_kernel(
    # scalar prefetch
    li_ref,  # [1] int32 layer index (SMEM)
    bt_ref,  # [B, maxP] int32 (SMEM)
    ctx_ref,  # [B] int32 (SMEM)
    # blocked inputs
    q_ref,  # [1, H*G, D] f32 (VMEM)
    kc_ref,  # [1, H, D] f32 current-step K (VMEM)
    vc_ref,  # [1, H, D] f32 current-step V (VMEM)
    # HBM-resident cache (FULL stacked arrays; no per-layer slicing)
    data_ref,  # [L, P, 2, ps, H*Dc] int8 (ANY)
    scales_ref,  # [L, P, 2, 2H, ps] f32 (ANY)
    # output
    out_ref,  # [1, H*G, D] f32 (VMEM)
    # scratch
    buf_d,  # [NBUF, 2, PCHUNK*ps, H*Dc] int8
    buf_s,  # [NBUF, 2, 2H, PCHUNK*ps] f32
    acc_ref,  # [H*G, D] f32
    m_ref,  # [H*G, 1] f32
    l_ref,  # [H*G, 1] f32
    sems,  # DMA sems [NBUF, 2, PCHUNK]
    *,
    ps: int,
    H: int,
    G: int,
    D: int,
    kv4: bool,
    sm_scale: float,
    interpret: bool,
    PCHUNK: int,
    NBUF: int,
):
    b = pl.program_id(0)
    li = li_ref[0]
    ctx = ctx_ref[b]
    hist = jnp.maximum(ctx - 1, 0)
    npages = jax.lax.div(hist + ps - 1, ps)
    nblocks = jax.lax.div(npages + PCHUNK - 1, PCHUNK)
    dc = D // 2 if kv4 else D
    HG = H * G
    HDc = H * dc
    ps2 = PCHUNK * ps

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    # ---- one-time per sequence: block-diagonal int8 queries ----
    q = q_ref[0]  # [HG, D] f32
    qsum = jnp.sum(q, axis=1, keepdims=True)  # [HG, 1] exact q·1 for the
    # zero-point term (linear in q, so the unquantized sum is strictly better)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (HG, HDc), 0) // G
    col_head = jax.lax.broadcasted_iota(jnp.int32, (HG, HDc), 1) // dc
    blockmask = (row_head == col_head).astype(jnp.float32)  # [HG, HDc]
    qscale = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-6) / 127.0

    def q_blk_int8(half):  # half: q[:, :dc] or q[:, dc:]
        tiled = jnp.concatenate([half] * H, axis=1)  # [HG, HDc]
        x = tiled * blockmask / qscale
        return jnp.round(x).astype(jnp.int8)

    if kv4:
        qb_lo = q_blk_int8(q[:, : D // 2])
        qb_hi = q_blk_int8(q[:, D // 2 :])
    else:
        qb_lo = q_blk_int8(q)
        qb_hi = None

    def start_block(slot, blk):
        for j in range(PCHUNK):
            p = blk * PCHUNK + j

            @pl.when(p < npages)
            def _(j=j, p=p):
                page = bt_ref[b, p]
                pltpu.make_async_copy(
                    data_ref.at[li, page],
                    buf_d.at[slot, :, pl.ds(j * ps, ps), :],
                    sems.at[slot, 0, j],
                ).start()
                pltpu.make_async_copy(
                    scales_ref.at[li, page],
                    buf_s.at[slot, :, :, pl.ds(j * ps, ps)],
                    sems.at[slot, 1, j],
                ).start()

    def wait_block(slot, blk):
        for j in range(PCHUNK):
            p = blk * PCHUNK + j

            @pl.when(p < npages)
            def _(j=j, p=p):
                page = bt_ref[b, p]
                pltpu.make_async_copy(
                    data_ref.at[li, page],
                    buf_d.at[slot, :, pl.ds(j * ps, ps), :],
                    sems.at[slot, 0, j],
                ).wait()
                pltpu.make_async_copy(
                    scales_ref.at[li, page],
                    buf_s.at[slot, :, :, pl.ds(j * ps, ps)],
                    sems.at[slot, 1, j],
                ).wait()

    for j in range(NBUF):
        @pl.when(j < nblocks)
        def _(j=j):
            start_block(j, j)

    def body(blk, _):
        slot = jax.lax.rem(blk, NBUF)
        wait_block(slot, blk)

        kp = buf_d[slot, 0]  # [ps2, HDc] int8
        vp = buf_d[slot, 1]
        if kv4:
            k_lo, k_hi = _unpack_nibbles(kp, interpret)  # int8, no float conv
            v_lo, v_hi = _unpack_nibbles(vp, interpret)
        else:
            k_lo = kp  # KV8: stored u-128, s8 MXU-ready (append_layer)
            v_lo, v_hi = vp, None

        # per-head scale rows expanded to the [HG, ps2] score block
        ks = jnp.repeat(buf_s[slot, 0, :H, :], G, axis=0)  # [HG, ps2]
        kz = jnp.repeat(buf_s[slot, 0, H:, :], G, axis=0)
        vs = jnp.repeat(buf_s[slot, 1, :H, :], G, axis=0)
        vz = jnp.repeat(buf_s[slot, 1, H:, :], G, axis=0)

        # scores: one s8 x s8 MXU op per nibble plane (covers PCHUNK pages)
        if kv4:
            qk = jax.lax.dot_general(
                qb_lo, k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + jax.lax.dot_general(
                qb_hi, k_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [HG, ps2]
            qk_f = qk.astype(jnp.float32) * qscale
            kz_eff = kz
        else:
            # KV8 stores x = u - 128; k = u*ks + kz = x*ks + (kz + 128*ks)
            qk = jax.lax.dot_general(
                qb_lo, k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            qk_f = qk.astype(jnp.float32) * qscale
            kz_eff = kz + 128.0 * ks

        pos = blk * ps2 + jax.lax.broadcasted_iota(jnp.int32, (1, ps2), 1)
        valid = pos < hist  # [1, ps2]; the current token is handled below
        s_gp = (qk_f * ks + qsum * kz_eff) * sm_scale
        s_gp = jnp.where(valid, s_gp, NEG_INF)

        # online softmax across the whole [HG, ps2] block
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s_gp, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p_gp = jnp.exp(s_gp - m_new)
        p_gp = jnp.where(valid, p_gp, 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p_gp, axis=1, keepdims=True)
        m_ref[:] = m_new

        # V: requantize (p*vs) rows to int8 -> s8 x s8 PV dot, no V conversion
        # (mask AFTER the multiply: beyond-history lanes hold unwritten scale
        # values and 0 * garbage must not poison the row max / sums)
        pvs_f = jnp.where(valid, p_gp * vs, 0.0)  # [HG, ps2] f32
        pq_scale = jnp.maximum(
            jnp.max(jnp.abs(pvs_f), axis=1, keepdims=True), 1e-20
        ) / 127.0
        pvs_q = jnp.round(pvs_f / pq_scale).astype(jnp.int8)  # [HG, ps2]
        vz_eff = vz if kv4 else vz + 128.0 * vs  # KV8 offset (see above)
        pvz = jnp.sum(
            jnp.where(valid, p_gp * vz_eff, 0.0), axis=1, keepdims=True
        )  # [HG, 1]

        def diag_blocks(pv_full_i32):  # [HG, HDc] i32 -> [HG, dc] f32
            pv_full = pv_full_i32.astype(jnp.float32) * pq_scale
            out = jnp.zeros((HG, dc), jnp.float32)
            for h in range(H):
                sel = (row_head[:, :dc] == h).astype(jnp.float32)
                out = out + pv_full[:, h * dc : (h + 1) * dc] * sel
            return out

        pv_lo = diag_blocks(jax.lax.dot_general(
            pvs_q, v_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ))
        if kv4:
            pv_hi = diag_blocks(jax.lax.dot_general(
                pvs_q, v_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ))
            pv = jnp.concatenate([pv_lo, pv_hi], axis=1)  # [HG, D]
        else:
            pv = pv_lo
        pv = pv + pvz
        acc_ref[:] = acc_ref[:] * alpha + pv

        # buffer slot is free: refill with block blk + NBUF
        @pl.when(blk + NBUF < nblocks)
        def _():
            start_block(slot, blk + NBUF)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0, unroll=False)

    # ---- self-attention on the current token (exact, unquantized) ----
    kc = kc_ref[0]  # [H, D] f32
    vc = vc_ref[0]
    kc_rep = jnp.repeat(kc, G, axis=0)  # [HG, D]
    vc_rep = jnp.repeat(vc, G, axis=0)
    s_self = jnp.sum(q * kc_rep, axis=1, keepdims=True) * sm_scale  # [HG, 1]
    m_new = jnp.maximum(m_ref[:], s_self)
    alpha = jnp.exp(m_ref[:] - m_new)
    p_self = jnp.exp(s_self - m_new)  # [HG, 1]
    l = l_ref[:] * alpha + p_self
    acc = acc_ref[:] * alpha + p_self * vc_rep

    l = jnp.maximum(l, 1e-30)  # [HG, 1]
    out_ref[0] = acc / l


def supports(page_size: int, head_dim: int) -> bool:
    return page_size % 128 == 0 and head_dim % 128 == 0


@functools.partial(jax.jit, static_argnames=("kv4", "sm_scale"))
def paged_decode_attention_pallas(
    q: jax.Array,  # [B, Hq, D] (any float dtype)
    data: jax.Array,  # [L, P, 2, ps, H*Dc] int8 (full stacked cache)
    scales: jax.Array,  # [L, P, 2, 2H, ps] f32
    block_tables: jax.Array,  # [B, maxP] int32
    context_lens: jax.Array,  # [B] int32 (incl. current token)
    layer_idx: jax.Array,  # [] or [1] int32
    k_cur: jax.Array,  # [B, H, D] current-step K (RoPE'd, unquantized)
    v_cur: jax.Array,  # [B, H, D]
    kv4: bool,
    sm_scale: float,
) -> jax.Array:
    B, Hq, D = q.shape
    twoH, ps = scales.shape[-2], scales.shape[-1]
    H = twoH // 2
    hdc = data.shape[-1]
    G = Hq // H

    qr = q.astype(jnp.float32).reshape(B, H * G, D)

    # short histories favor small page chunks (less masked tail compute);
    # long histories amortize per-iteration fixed costs over more slots
    maxP = block_tables.shape[1]
    PCHUNK = 2 if maxP <= 8 else 4
    NBUF = 3 if PCHUNK == 2 else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * G, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H * G, D), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 2, PCHUNK * ps, hdc), jnp.int8),
            pltpu.VMEM((NBUF, 2, 2 * H, PCHUNK * ps), jnp.float32),
            pltpu.VMEM((H * G, D), jnp.float32),
            pltpu.VMEM((H * G, 1), jnp.float32),
            pltpu.VMEM((H * G, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2, PCHUNK)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_attn_kernel, ps=ps, H=H, G=G, D=D, kv4=kv4,
            sm_scale=sm_scale, interpret=interpret_mode(),
            PCHUNK=PCHUNK, NBUF=NBUF,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H * G, D), jnp.float32),
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("parallel",),  # megacore over batch
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * D * maxP * ps,
            bytes_accessed=B * maxP * (2 * ps * hdc + 2 * 2 * H * ps * 4),
            transcendentals=B * Hq * maxP * ps,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        block_tables, context_lens, qr,
        k_cur.astype(jnp.float32), v_cur.astype(jnp.float32),
        data, scales,
    )
    return out.reshape(B, Hq, D).astype(q.dtype)


@register_pallas("paged_decode_attention")
def _paged_attn_dispatch(q, cache, block_tables, context_lens, layer_idx,
                         k_cur, v_cur, kv_bits, sm_scale):
    import os

    D = q.shape[-1]
    ps = cache.page_size
    if os.environ.get("QSERVE_TPU_EXACT_ATTN", "0") == "1":
        return None  # full-float XLA fallback (accuracy studies)
    if not supports(ps, D):
        return None  # dispatcher falls back to XLA
    sm = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    return paged_decode_attention_pallas(
        q, cache.data, cache.scales, block_tables, context_lens,
        layer_idx, k_cur, v_cur, kv_bits == 4, sm,
    )
