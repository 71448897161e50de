"""Pallas TPU chunked-prefill (prefix-continuation) attention.

A prompt chunk's queries attend (a) the sequence's already-cached quantized
prefix pages and (b) the chunk's own keys, causally. The reference never
serves this case at all (its scheduler rejects prompts longer than one
batch, ref qserve/core/scheduler.py:192-201, and flash-attn varlen only
covers fresh tokens, ref modeling/models/llama_w4a8_unpad.py:232-242); the
XLA fallback in kernels/attention.py is bounded-memory but gather-dequants
every prefix page to f32 through HBM. This kernel keeps the prefix pass on
the decode kernel's int8 diet:

  * grid over query blocks (BT=256 rows per block, all kv heads processed
    per instance so each page's [ps, H*Dc] row DMA is fully used);
  * per page-chunk, KV4 nibbles unpack with the packed-word trick and feed
    s8 x s8 MXU score dots against per-row-quantized queries (scale/zero
    folding identical to pallas_paged_attention.py);
  * the V side requantizes (p * v_scale) rows to int8 (SageAttention-style)
    so PV is also a straight s8 x s8 dot, with the per-slot zero folded in
    exactly via sum(p * vz);
  * the chunk-self phase then continues the SAME online-softmax state with
    bf16 MXU dots over the fresh K/V (exact, like the flash prefill kernel),
    skipping beyond-causal key blocks at block granularity;
  * masks come from absolute positions: padding rows/cols carry sentinel
    positions (-2^30 / +2^30) so one causal test handles segment validity,
    and sliding windows need no extra plumbing.

Constraints (dispatcher falls back to XLA otherwise): page_size % 128 == 0,
packed lane width H*Dc % 128 == 0, T % BT == 0 with BT in {128, 256},
T <= 4096 (chunk K/V stay VMEM-resident).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas
from qserve_tpu.kernels.pallas_paged_attention import (
    _unpack_nibbles,
    supports as _paged_supports,
)

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
POS_FAR = 1 << 30  # padding-key sentinel position (fails every causal test)
NEG_FAR = -(1 << 30)  # padding-query sentinel position


def _prefix_attn_kernel(
    # scalar prefetch
    bt_ref,  # [maxP] int32 block table (SMEM)
    meta_ref,  # [2] int32: [prefix_len, layer_idx] (SMEM)
    # blocked inputs (one query block per grid step)
    qlo_ref,  # [1, Hkv, rpBT, Dlo] int8 low-half query plane
    qhi_ref,  # [1, Hkv, rpBT, Dhi] int8 high-half (KV8: [., ., ., 1] dummy)
    qmeta_ref,  # [1, Hkv, rpBT, 2] f32: [qscale*sm, qsum*sm]
    qbf_ref,  # [1, Hkv, rpBT, D] bf16 queries (self phase)
    qpos_ref,  # [1, rpBT, 1] int32 absolute positions (NEG_FAR = padding)
    # whole-chunk inputs (VMEM-resident across the grid)
    kself_ref,  # [Hkv, T, D] bf16
    vself_ref,  # [Hkv, T, D] bf16
    kpos_ref,  # [1, T] int32 key positions (POS_FAR = padding)
    # HBM-resident stacked cache
    data_ref,  # [L, P, 2, ps, H*Dc] int8 (ANY)
    scales_ref,  # [L, P, 2, 2H, ps] f32/bf16 (ANY)
    # output
    out_ref,  # [1, Hkv, rpBT, D]
    # scratch
    buf_d,  # [NBUF, 2, PCHUNK*ps, H*Dc] int8
    buf_s,  # [NBUF, 2, 2H, PCHUNK*ps] f32/bf16
    acc_ref,  # [Hkv, rpBT, D] f32
    m_ref,  # [Hkv, rpBT, 1] f32
    l_ref,  # [Hkv, rpBT, 1] f32
    sems,  # DMA sems [NBUF, 2, PCHUNK]
    *,
    ps: int,
    H: int,
    D: int,
    rep: int,
    bt: int,
    nT: int,
    kv4: bool,
    sm_scale: float,
    interpret: bool,
    PCHUNK: int,
    NBUF: int,
    window: int,  # 0 = full
):
    i = pl.program_id(0)
    prefix_len = meta_ref[0]
    li = meta_ref[1]
    dc = D // 2 if kv4 else D
    rpBT = rep * bt
    ps2 = PCHUNK * ps
    npages = jax.lax.div(prefix_len + ps - 1, ps)
    nblocks = jax.lax.div(npages + PCHUNK - 1, PCHUNK)

    # lanes of pages never DMA'd must read finite scales (see the decode
    # kernel); per-instance zeroing also clears the previous block's data
    buf_s[:] = jnp.zeros_like(buf_s)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    qpos = qpos_ref[0]  # [rpBT, 1] int32

    def start_block(slot, blk):
        for j in range(PCHUNK):
            p = blk * PCHUNK + j

            @pl.when(p < npages)
            def _(j=j, p=p):
                page = bt_ref[p]
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
                page = bt_ref[p]
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
            start_block(j % NBUF, j)

    # ---- phase 1: cached prefix pages (int8 score + PV dots) ----
    def body(blk, _):
        slot = jax.lax.rem(blk, NBUF)
        wait_block(slot, blk)

        kp = buf_d[slot, 0]  # [ps2, H*Dc] int8
        vp = buf_d[slot, 1]
        if kv4:
            k_lo, k_hi = _unpack_nibbles(kp, interpret)
            v_lo, v_hi = _unpack_nibbles(vp, interpret)
        else:
            k_lo, k_hi = kp, None  # stored u-128, s8 MXU-ready
            v_lo, v_hi = vp, None

        key_pos = blk * ps2 + jax.lax.broadcasted_iota(jnp.int32, (1, ps2), 1)
        valid = key_pos < prefix_len  # [1, ps2]
        mask = valid & (key_pos <= qpos)  # [rpBT, ps2] (qpos >= prefix_len
        # for live rows, but padding rows carry NEG_FAR and must mask out)
        if window > 0:
            mask = mask & (key_pos > qpos - window)

        for h in range(H):
            k_lo_h = k_lo[:, h * dc : (h + 1) * dc]  # [ps2, dc] static slice
            qk = jax.lax.dot_general(
                qlo_ref[0, h], k_lo_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [rpBT, ps2]
            if kv4:
                qk = qk + jax.lax.dot_general(
                    qhi_ref[0, h], k_hi[:, h * dc : (h + 1) * dc],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            ks = buf_s[slot, 0, h : h + 1, :].astype(jnp.float32)  # [1, ps2]
            kz = buf_s[slot, 0, H + h : H + h + 1, :].astype(jnp.float32)
            vs = buf_s[slot, 1, h : h + 1, :].astype(jnp.float32)
            vz = buf_s[slot, 1, H + h : H + h + 1, :].astype(jnp.float32)
            if not kv4:
                kz = kz + 128.0 * ks
                vz = vz + 128.0 * vs

            qsc = qmeta_ref[0, h, :, 0:1]  # [rpBT, 1] qscale * sm_scale
            qsm = qmeta_ref[0, h, :, 1:2]  # qsum * sm_scale
            s = qk.astype(jnp.float32) * qsc * ks + qsm * kz
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)  # masked slots: exp(NEG_INF - m) == 0
            l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[h] = m_new

            pvs_f = p * vs  # [rpBT, ps2] >= 0
            pq_scale = jnp.maximum(
                jnp.max(pvs_f, axis=1, keepdims=True), 1e-20
            ) / 127.0
            pvs_q = jnp.round(pvs_f / pq_scale).astype(jnp.int8)
            pvz = jnp.sum(p * vz, axis=1, keepdims=True)  # [rpBT, 1]

            pv = jax.lax.dot_general(
                pvs_q, v_lo[:, h * dc : (h + 1) * dc],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * pq_scale  # [rpBT, dc]
            if kv4:
                pv_hi = jax.lax.dot_general(
                    pvs_q, v_hi[:, h * dc : (h + 1) * dc],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * pq_scale
                pv = jnp.concatenate([pv, pv_hi], axis=1)  # [rpBT, D]
            acc_ref[h] = acc_ref[h] * alpha + (pv + pvz)

        @pl.when(blk + NBUF < nblocks)
        def _():
            start_block(slot, blk + NBUF)
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0, unroll=False)

    # ---- phase 2: chunk self-attention (bf16, exact), causal block skip ----
    for jb in range(nT):
        @pl.when(jb <= i)
        def _(jb=jb):
            kpos = kpos_ref[:, pl.ds(jb * bt, bt)]  # [1, bt]
            mask = (kpos <= qpos)  # causal + padding sentinels
            if window > 0:
                mask = mask & (kpos > qpos - window)
            for h in range(H):
                kj = kself_ref[h, pl.ds(jb * bt, bt), :]  # [bt, D] bf16
                vj = vself_ref[h, pl.ds(jb * bt, bt), :]
                s = jax.lax.dot_general(
                    qbf_ref[0, h], kj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sm_scale  # [rpBT, bt]
                s = jnp.where(mask, s, NEG_INF)
                m_prev = m_ref[h]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                p = jnp.where(mask, p, 0.0)
                l_ref[h] = l_ref[h] * alpha + jnp.sum(p, axis=1, keepdims=True)
                m_ref[h] = m_new
                acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                    p.astype(vj.dtype), vj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    for h in range(H):
        l = jnp.maximum(l_ref[h], 1e-30)
        out_ref[0, h] = (acc_ref[h] / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kv4", "sm_scale", "window", "bt")
)
def prefix_prefill_attention_pallas(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hkv, D] chunk keys (RoPE'd)
    v: jax.Array,  # [T, Hkv, D]
    positions: jax.Array,  # [T] int32 (valid rows; padding handled via segs)
    segment_ids: jax.Array,  # [T] int32, 0 = padding
    data: jax.Array,  # [L, P, 2, ps, H*Dc] int8
    scales: jax.Array,  # [L, P, 2, 2H, ps]
    block_tables: jax.Array,  # [1, maxP] int32
    prefix_len: jax.Array,  # [] int32
    layer_idx: jax.Array,  # [] or [1] int32
    kv4: bool,
    sm_scale: float,
    window: int = 0,
    bt: int = 256,
) -> jax.Array:
    T, Hq, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    nT = T // bt
    rpBT = rep * bt
    twoH, ps = scales.shape[-2], scales.shape[-1]
    hdc = data.shape[-1]

    live = segment_ids > 0
    qpos_t = jnp.where(live, positions, NEG_FAR)  # [T]
    kpos_t = jnp.where(live, positions, POS_FAR)

    # group-per-kv-head query layout: [nT, Hkv, rep*bt, D], row r*bt + t
    qg = (
        q.astype(jnp.float32)
        .reshape(nT, bt, Hkv, rep, D)
        .transpose(0, 2, 3, 1, 4)
        .reshape(nT, Hkv, rpBT, D)
    )
    qscale = jnp.maximum(jnp.max(jnp.abs(qg), axis=3, keepdims=True), 1e-6) / 127.0
    qsum = jnp.sum(qg, axis=3, keepdims=True)
    qint = jnp.round(qg / qscale).astype(jnp.int8)
    if kv4:
        qlo, qhi = qint[..., : D // 2], qint[..., D // 2 :]
    else:
        qlo = qint
        qhi = jnp.zeros((nT, Hkv, rpBT, 1), jnp.int8)
    qmeta = jnp.concatenate([qscale * sm_scale, qsum * sm_scale], axis=3)
    qbf = qg.astype(jnp.bfloat16)
    qpos = (
        jnp.tile(qpos_t.reshape(nT, 1, bt), (1, rep, 1)).reshape(nT, rpBT, 1)
    )

    kself = jnp.swapaxes(k.astype(jnp.bfloat16), 0, 1)  # [Hkv, T, D]
    vself = jnp.swapaxes(v.astype(jnp.bfloat16), 0, 1)
    kpos = kpos_t.reshape(1, T)

    PCHUNK = max(1, min(2, 512 // ps))
    NBUF = 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((1, Hkv, rpBT, qlo.shape[3]), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, rpBT, qhi.shape[3]), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, rpBT, 2), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hkv, rpBT, D), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rpBT, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hkv, T, D), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hkv, T, D), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, rpBT, D), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 2, PCHUNK * ps, hdc), jnp.int8),
            pltpu.VMEM((NBUF, 2, twoH, PCHUNK * ps), scales.dtype),
            pltpu.VMEM((Hkv, rpBT, D), jnp.float32),
            pltpu.VMEM((Hkv, rpBT, 1), jnp.float32),
            pltpu.VMEM((Hkv, rpBT, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2, PCHUNK)),
        ],
    )
    S = block_tables.shape[1] * ps
    out = pl.pallas_call(
        functools.partial(
            _prefix_attn_kernel, ps=ps, H=Hkv, D=D, rep=rep, bt=bt, nT=nT,
            kv4=kv4, sm_scale=sm_scale, interpret=interpret_mode(),
            PCHUNK=PCHUNK, NBUF=NBUF, window=window,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nT, Hkv, rpBT, D), q.dtype),
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),  # prefix DMA reuses scratch
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Hq * T * (S + T // 2) * D,
            bytes_accessed=nT * 2 * S * hdc + 3 * Hq * T * D * 2,
            transcendentals=Hq * T * (S + T // 2),
        ),
    )(
        jnp.asarray(block_tables[0], jnp.int32),
        jnp.stack(
            [jnp.asarray(prefix_len, jnp.int32).reshape(()),
             jnp.asarray(layer_idx, jnp.int32).reshape(())]
        ),
        qlo, qhi, qmeta, qbf, qpos, kself, vself, kpos, data, scales,
    )
    # [nT, Hkv, rpBT, D] -> [T, Hq, D] (q head = hkv*rep + r)
    return (
        out.reshape(nT, Hkv, rep, bt, D)
        .transpose(0, 3, 1, 2, 4)
        .reshape(T, Hq, D)
    )


@register_pallas("prefix_prefill_attention")
def _prefix_dispatch(q, k, v, segment_ids, positions, cache, block_tables,
                     prefix_len, layer_idx, kv_bits, sm_scale,
                     sliding_window=None):
    import os

    T, Hq, D = q.shape
    ps = cache.page_size
    if os.environ.get("QSERVE_TPU_EXACT_ATTN", "0") == "1":
        return None
    if not _paged_supports(ps, D, cache.data.shape[-1]):
        return None
    bt = min(256, T)
    if T % bt != 0 or T > 4096:
        return None
    sm = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    return prefix_prefill_attention_pallas(
        q, k, v, positions, segment_ids, cache.data, cache.scales,
        block_tables, prefix_len, layer_idx, kv_bits == 4, sm,
        window=int(sliding_window or 0), bt=bt,
    )
