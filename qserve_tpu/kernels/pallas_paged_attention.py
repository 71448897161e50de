"""Pallas TPU paged decode attention with fused KV4/KV8 dequantization (N4b).

TPU-native replacement for the reference's TRT-LLM-derived MMHA kernel
(decoderMaskedMultiheadAttentionTemplate.hpp): one pass over each sequence's
quantized paged KV history with fused dequant, fp32 online softmax, and V
accumulation. Design:

  * KV pages are gathered by *array index* from the block table (scalar-
    prefetched into SMEM), not via raw device pointers (KVBlockArray);
  * the kernel reads the FULL stacked cache at a layer index — the layer
    loop above never slices the multi-GB arrays;
  * the CURRENT token's K/V are handled OUTSIDE the kernel: appends are
    deferred and batched, and the exact (unquantized) self-attention term is
    merged into the online-softmax state (acc, m, l) by a batched XLA
    epilogue (the reference MMHA self-attends in-kernel,
    Template.hpp:1221-1349 — on TPU that work is per-sequence serial; batched
    XLA does it vectorized over B);
  * likewise the block-diagonal int8 query construction happens once in
    batched XLA, not per kernel instance: the kernel receives MXU-ready
    int8 query planes. The kernel body is ONLY the per-page history loop —
    its fixed costs are DMA issue/wait, not VPU prep work;
  * the grid is (batch,) with megacore batch parallelism; PCHUNK pages are
    processed per loop iteration (one DMA per page, NBUF chunk buffers in
    flight) — the TPU analog of K_LOOP_UNROLL/cp.async scale preloading
    (Template.hpp:918-953) with per-iteration fixed costs amortized over
    PCHUNK*ps slots;
  * KV4 nibbles unpack with the packed-word mask trick (the reference's
    `w & 0x0F0F0F0F` LOP3 dequant, Utils.h:1943-1953, on VPU terms:
    pltpu.bitcast to int32, one mask op per 4 bytes);
  * ALL kv heads are processed by single MXU ops via a block-diagonal query
    matrix in GROUP-MAJOR row order (row g*H + h holds head h, group g), so
    per-head scale rows broadcast to the [G*H, ps2] score block by stacking
    G copies (cheap sublane concat) instead of interleaving repeats:
      scores = Q_blk(int8) @ k_plane^T   -- one s8xs8 MXU op per nibble plane
    (the K plane feeds the MXU straight from the nibble unpack with NO
    int->float conversion — the decode analog of the W4A8 GEMM's progressive
    dequant);
  * the V side requantizes (p*vs) rows to int8 so PV is also a straight
    s8 x s8 dot (SageAttention-style int8-P; error below the KV4 noise
    floor). Only the diagonal head blocks of pv_full are kept (cheap
    selects; the MXU was idle regardless);
  * the scale buffers are zeroed once per instance so lanes of never-DMA'd
    pages read exact 0.0 — beyond-history probabilities are exactly zero
    after exp(NEG_INF - m), so no extra masking passes are spent on them.

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
    # blocked inputs (group-major rows: row g*H + h); SB sequences/instance
    qlo_ref,  # [SB, GH, HDc] int8 block-diagonal low-half queries (VMEM)
    qhi_ref,  # [SB, GH, HDc] int8 high-half (KV8: unused dummy [SB, GH, 1])
    qmeta_ref,  # [SB, GH, 2] f32: col 0 = qscale*sm_scale, col 1 = qsum*sm_scale
    # HBM-resident cache (FULL stacked arrays; no per-layer slicing)
    data_ref,  # [L, P, 2, ps, H*Dc] int8 (ANY)
    scales_ref,  # [L, P, 2, 2H, ps] f32/bf16 (ANY)
    # outputs: raw online-softmax state (self-attn merged outside)
    acc_out,  # [SB, GH, D] f32
    m_out,  # [SB, GH, 1] f32
    l_out,  # [SB, GH, 1] f32
    # scratch (per in-instance sequence s)
    buf_d,  # [SB, NBUF, 2, PCHUNK*ps, H*Dc] int8
    buf_s,  # [SB, NBUF, 2, 2H, PCHUNK*ps] f32/bf16
    acc_ref,  # [GH, D] f32
    m_ref,  # [GH, 1] f32
    l_ref,  # [GH, 1] f32
    sems,  # DMA sems [SB, NBUF, 2, PCHUNK]
    *,
    ps: int,
    H: int,
    G: int,
    D: int,
    kv4: bool,
    interpret: bool,
    PCHUNK: int,
    NBUF: int,
    window: int,  # 0 = full attention; else positions [hist-window, hist)
    SB: int,  # sequences per grid instance
    ablate: str = "",  # dev-only (QSERVE_ATTN_ABLATE): skip one compute stage
):
    inst = pl.program_id(0)
    li = li_ref[0]
    dc = D // 2 if kv4 else D
    GH = G * H
    ps2 = PCHUNK * ps
    row_head = jax.lax.broadcasted_iota(jnp.int32, (GH, dc), 0) % H

    # lanes of pages never DMA'd must read FINITE scales (first use of the
    # scratch could otherwise hold NaN bit patterns); with 0.0 there, the
    # p*scale products of masked slots are exact zeros with no extra wheres
    buf_s[:] = jnp.zeros_like(buf_s)

    def seq_meta(s):
        b = inst * SB + s
        ctx = ctx_ref[b]
        hist = jnp.maximum(ctx - 1, 0)
        npages = jax.lax.div(hist + ps - 1, ps)
        nblocks = jax.lax.div(npages + PCHUNK - 1, PCHUNK)
        # sliding window: logical pages wholly below the window are never
        # read (their physical pages may already be cyclically overwritten —
        # the allocator reuses pages mod window_pages); the congruence
        # classes make page-granular aliasing exact under the position mask.
        if window > 0:
            # position hist attends the last `window` keys incl. itself
            win_lo = jnp.maximum(hist - window + 1, 0)
            lo_block = jax.lax.div(win_lo, ps * PCHUNK)
        else:
            lo_block = jnp.int32(0)
        return b, hist, npages, nblocks, lo_block

    want_data = ablate not in ("nodatadma", "nodma")
    want_scales = ablate not in ("noscaledma", "nodma")

    def start_block(s, b, npages, slot, blk):
        for j in range(PCHUNK):
            p = blk * PCHUNK + j

            @pl.when(p < npages)
            def _(j=j, p=p):
                page = bt_ref[b, p]
                if want_data:
                    pltpu.make_async_copy(
                        data_ref.at[li, page],
                        buf_d.at[s, slot, :, pl.ds(j * ps, ps), :],
                        sems.at[s, slot, 0, j],
                    ).start()
                if want_scales:
                    pltpu.make_async_copy(
                        scales_ref.at[li, page],
                        buf_s.at[s, slot, :, :, pl.ds(j * ps, ps)],
                        sems.at[s, slot, 1, j],
                    ).start()

    def wait_block(s, b, npages, slot, blk):
        for j in range(PCHUNK):
            p = blk * PCHUNK + j

            @pl.when(p < npages)
            def _(j=j, p=p):
                page = bt_ref[b, p]
                if want_data:
                    pltpu.make_async_copy(
                        data_ref.at[li, page],
                        buf_d.at[s, slot, :, pl.ds(j * ps, ps), :],
                        sems.at[s, slot, 0, j],
                    ).wait()
                if want_scales:
                    pltpu.make_async_copy(
                        scales_ref.at[li, page],
                        buf_s.at[s, slot, :, :, pl.ds(j * ps, ps)],
                        sems.at[s, slot, 1, j],
                    ).wait()

    # warm-up: start the first NBUF blocks of EVERY in-instance sequence up
    # front, so sequence s+1's pages are in flight while sequence s computes
    # (amortizes the DMA cold-start bubble across SB sequences)
    metas = [seq_meta(s) for s in range(SB)]
    for s in range(SB):
        b, hist, npages, nblocks, lo_block = metas[s]
        for j in range(NBUF):
            @pl.when(lo_block + j < nblocks)
            def _(s=s, b=b, npages=npages, lo_block=lo_block, j=j):
                blk = lo_block + j
                start_block(s, b, npages, jax.lax.rem(blk, NBUF), blk)

    def tile_g(row):  # [H, ps2] -> [GH, ps2] by stacking G copies (row g*H+h)
        if G == 1:
            return row
        return jnp.concatenate([row] * G, axis=0)

    for s in range(SB):
        b, hist, npages, nblocks, lo_block = metas[s]
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

        qlo = qlo_ref[s]  # [GH, HDc] int8
        qhi = qhi_ref[s] if kv4 else None
        qsc = qmeta_ref[s, :, 0:1]  # [GH, 1] qscale * sm_scale
        qsm = qmeta_ref[s, :, 1:2]  # [GH, 1] qsum * sm_scale

        def body(blk, _, s=s, b=b, hist=hist, npages=npages,
                 nblocks=nblocks, qlo=qlo, qhi=qhi, qsc=qsc, qsm=qsm):
            slot = jax.lax.rem(blk, NBUF)
            wait_block(s, b, npages, slot, blk)

            kp = buf_d[s, slot, 0]  # [ps2, HDc] int8
            vp = buf_d[s, slot, 1]
            if ablate == "dma":
                # DMA floor probe: wait the page DMAs, skip all compute (the
                # copies are side effects, so Mosaic keeps them live)
                acc_ref[:] += 1.0
                @pl.when(blk + NBUF < nblocks)
                def _():
                    start_block(s, b, npages, slot, blk + NBUF)
                return 0
            if kv4:
                if ablate == "nounpack":
                    k_lo = k_hi = kp  # skip the nibble mask/shift passes
                    v_lo, v_hi = vp, vp
                else:
                    k_lo, k_hi = _unpack_nibbles(kp, interpret)
                    v_lo, v_hi = _unpack_nibbles(vp, interpret)
            else:
                k_lo = kp  # KV8: stored u-128, s8 MXU-ready (append_layer)
                v_lo, v_hi = vp, None

            if ablate == "noscale":  # skip scale loads + casts + tiling
                ks = kz = vs = vz = jnp.float32(1.0)
            else:
                ks_h = buf_s[s, slot, 0, :H, :].astype(jnp.float32)  # [H, ps2]
                kz_h = buf_s[s, slot, 0, H:, :].astype(jnp.float32)
                vs_h = buf_s[s, slot, 1, :H, :].astype(jnp.float32)
                vz_h = buf_s[s, slot, 1, H:, :].astype(jnp.float32)
                if not kv4:
                    # KV8 stores x = u-128; k = u*ks + kz = x*ks + (kz+128*ks)
                    kz_h = kz_h + 128.0 * ks_h
                    vz_h = vz_h + 128.0 * vs_h
                ks = tile_g(ks_h)  # [GH, ps2]
                kz = tile_g(kz_h)
                vs = tile_g(vs_h)
                vz = tile_g(vz_h)

            if ablate == "noqk":  # skip the QK MXU dots (keep the epilogue)
                qk = jnp.broadcast_to(
                    qlo[:, :1].astype(jnp.int32), (GH, ps2)
                )
            else:
                # scores: one s8 x s8 MXU op per nibble plane (PCHUNK pages)
                qk = jax.lax.dot_general(
                    qlo, k_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if kv4:
                    qk = qk + jax.lax.dot_general(
                        qhi, k_hi, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )  # [GH, ps2]

            pos = blk * ps2 + jax.lax.broadcasted_iota(jnp.int32, (1, ps2), 1)
            valid = pos < hist  # [1, ps2]; the current token merges outside
            if window > 0:
                valid = valid & (pos > hist - window)
            # sm_scale is folded into qsc/qsm by the host-side prep
            s_gp = qk.astype(jnp.float32) * qsc * ks + qsm * kz
            s_gp = jnp.where(valid, s_gp, NEG_INF)

            # online softmax; invalid lanes give exp(NEG_INF - m) == 0
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s_gp, axis=1, keepdims=True))
            if ablate == "noexp":  # transcendental cost probe
                alpha = jnp.float32(1.0)
                p_gp = (s_gp - m_new) * 1e-6
            else:
                alpha = jnp.exp(m_prev - m_new)
                p_gp = jnp.exp(s_gp - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p_gp, axis=1, keepdims=True)
            m_ref[:] = m_new

            if ablate == "nopv":  # skip requant + PV dots + diag extraction
                acc_ref[:] = acc_ref[:] * alpha + p_gp[:, :D]
                @pl.when(blk + NBUF < nblocks)
                def _():
                    start_block(s, b, npages, slot, blk + NBUF)
                return 0

            # V: requantize (p*vs) rows to int8 -> s8 x s8 PV dot
            pvs_f = p_gp * vs  # [GH, ps2] f32, >= 0 (vs > 0)
            pq_scale = jnp.maximum(
                jnp.max(pvs_f, axis=1, keepdims=True), 1e-20
            ) / 127.0
            pvs_q = jnp.round(pvs_f / pq_scale).astype(jnp.int8)  # [GH, ps2]
            pvz = jnp.sum(p_gp * vz, axis=1, keepdims=True)  # [GH, 1]

            def diag_blocks(pv_full_i32):  # [GH, HDc] i32 -> [GH, dc] f32
                pv_full = pv_full_i32.astype(jnp.float32) * pq_scale
                if ablate == "nodiag":
                    return pv_full[:, :dc]
                out = jnp.zeros((GH, dc), jnp.float32)
                for h in range(H):
                    sel = (row_head == h).astype(jnp.float32)
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
                pv = jnp.concatenate([pv_lo, pv_hi], axis=1)  # [GH, D]
            else:
                pv = pv_lo
            acc_ref[:] = acc_ref[:] * alpha + (pv + pvz)

            # buffer slot is free: refill with block blk + NBUF
            @pl.when(blk + NBUF < nblocks)
            def _():
                start_block(s, b, npages, slot, blk + NBUF)
            return 0

        jax.lax.fori_loop(lo_block, nblocks, body, 0, unroll=False)

        acc_out[s] = acc_ref[:]
        m_out[s] = m_ref[:]
        l_out[s] = l_ref[:]


def supports(page_size: int, head_dim: int, hdc: int = 0) -> bool:
    """Pages must be lane-aligned; the packed plane's lane dim H*Dc must be
    lane-aligned too. head_dim 64 works when there are >= 4 kv heads (KV4):
    the block-diagonal layout packs 2+ heads per 128-lane block and the
    diagonal extraction uses static sub-128 lane slices (Mosaic legalizes
    static offsets; verified by the on-TPU D=64 parity test)."""
    if page_size % 128 != 0:
        return False
    if head_dim % 128 == 0:
        return True
    return head_dim % 64 == 0 and hdc % 128 == 0


@functools.partial(
    jax.jit, static_argnames=("kv4", "sm_scale", "window", "ablate", "tuning")
)
def paged_decode_attention_pallas(
    q: jax.Array,  # [B, Hq, D] (any float dtype)
    data: jax.Array,  # [L, P, 2, ps, H*Dc] int8 (full stacked cache)
    scales: jax.Array,  # [L, P, 2, 2H, ps] f32/bf16
    block_tables: jax.Array,  # [B, maxP] int32
    context_lens: jax.Array,  # [B] int32 (incl. current token)
    layer_idx: jax.Array,  # [] or [1] int32
    k_cur: jax.Array,  # [B, H, D] current-step K (RoPE'd, unquantized)
    v_cur: jax.Array,  # [B, H, D]
    kv4: bool,
    sm_scale: float,
    window: int = 0,  # 0 = full attention; else sliding window length
    ablate: str = "",  # dev-only in-kernel stage skip (see _paged_attn_kernel)
    tuning: tuple = (),  # (PCHUNK, NBUF, SB) env-string overrides | ()
) -> jax.Array:
    B, Hq, D = q.shape
    twoH, ps = scales.shape[-2], scales.shape[-1]
    H = twoH // 2
    hdc = data.shape[-1]
    dc = hdc // H
    G = Hq // H
    GH = G * H

    # ---- batched host-side prep (vectorized over B; the kernel only loops
    # over history pages) ----
    # group-major rows: row g*H + h holds (head h, group g)
    qg = (
        q.astype(jnp.float32)
        .reshape(B, H, G, D)
        .transpose(0, 2, 1, 3)
        .reshape(B, GH, D)
    )
    qscale = jnp.maximum(jnp.max(jnp.abs(qg), axis=2, keepdims=True), 1e-6) / 127.0
    qsum = jnp.sum(qg, axis=2, keepdims=True)  # exact q·1 for the zero term
    qint = jnp.round(qg / qscale).astype(jnp.int8)  # [B, GH, D]
    head_of_row = jnp.arange(GH, dtype=jnp.int32) % H  # [GH]
    col_head = jnp.arange(H, dtype=jnp.int32)  # [H]
    blockmask = (head_of_row[:, None] == col_head[None, :]).astype(jnp.int8)

    def block_diag(half):  # [B, GH, dc] int8 -> [B, GH, H*dc] int8
        x = half[:, :, None, :] * blockmask[None, :, :, None]
        return x.reshape(B, GH, H * dc)

    if kv4:
        qb_lo = block_diag(qint[:, :, : D // 2])
        qb_hi = block_diag(qint[:, :, D // 2 :])
    else:
        qb_lo = block_diag(qint)
        qb_hi = jnp.zeros((B, GH, 1), jnp.int8)  # unused dummy
    qmeta = jnp.concatenate(
        [qscale * sm_scale, qsum * sm_scale], axis=2
    )  # [B, GH, 2] f32

    # short histories favor small page chunks (less masked tail compute);
    # long histories amortize per-iteration fixed costs over more slots
    maxP = block_tables.shape[1]
    # page-buffer budget ~24MB of VMEM across SB sequences x NBUF buffers x
    # PCHUNK pages (each buffered page is 2*ps*hdc bytes of K+V data).
    # Measured at B=128/ctx1280 (8B geometry, 96-page budget):
    # (SB=8, NBUF=2, PCHUNK=6) -> 5625 tok/s vs (8,3,2) 5206 / (1,3,2) 4734.
    # tuning = (PCHUNK, NBUF, SB) env-string overrides, threaded through as a
    # STATIC arg by the dispatch so different configs interleaved in one
    # process compile distinct executables (None = budget-adaptive default).
    t_pchunk, t_nbuf, t_sb = tuning if tuning else (None, None, None)
    budget_pages = max(6, (24 << 20) // (2 * ps * hdc))
    PCHUNK = int(t_pchunk) if t_pchunk else min(6, maxP)
    NBUF = int(t_nbuf) if t_nbuf else 2
    # multiple sequences per grid instance when the batch allows: the later
    # sequences' warm-up page DMAs are issued before the first computes, so
    # the per-instance DMA cold-start bubble amortizes over all of them
    sb_fit = max(1, budget_pages // (NBUF * PCHUNK))
    SB = int(t_sb) if t_sb else min(8, sb_fit)
    while SB > 1 and (B % SB != 0 or B < 2 * SB):
        SB //= 2
    n_inst = B // SB

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_inst,),
        in_specs=[
            pl.BlockSpec((SB, GH, qb_lo.shape[2]), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, GH, qb_hi.shape[2]), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, GH, 2), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((SB, GH, D), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, GH, 1), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, GH, 1), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((SB, NBUF, 2, PCHUNK * ps, hdc), jnp.int8),
            pltpu.VMEM((SB, NBUF, 2, 2 * H, PCHUNK * ps), scales.dtype),
            pltpu.VMEM((GH, D), jnp.float32),
            pltpu.VMEM((GH, 1), jnp.float32),
            pltpu.VMEM((GH, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((SB, NBUF, 2, PCHUNK)),
        ],
    )
    acc, m, l = pl.pallas_call(
        functools.partial(
            _paged_attn_kernel, ps=ps, H=H, G=G, D=D, kv4=kv4,
            interpret=interpret_mode(), PCHUNK=PCHUNK, NBUF=NBUF,
            window=window, SB=SB, ablate=ablate,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, GH, D), jnp.float32),
            jax.ShapeDtypeStruct((B, GH, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, GH, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("parallel",),  # megacore over instances
            # SB=2 doubles the page buffers; MHA models (H=32) need more
            # than the 16MB default scoped budget (v5e: 128MB VMEM/core)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * D * maxP * ps,
            bytes_accessed=B * maxP * (
                2 * ps * hdc + 2 * 2 * H * ps * scales.dtype.itemsize
            ),
            transcendentals=B * Hq * maxP * ps,
        ),
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        block_tables, context_lens,
        qb_lo, qb_hi, qmeta, data, scales,
    )

    # ---- batched epilogue: exact self-attention on the current token,
    # merged into the online-softmax state, then normalization ----
    kc = k_cur.astype(jnp.float32)  # [B, H, D]
    vc = v_cur.astype(jnp.float32)
    s_self = (
        jnp.einsum("bhgd,bhd->bhg", qg.reshape(B, G, H, D).transpose(0, 2, 1, 3), kc)
        * sm_scale
    )  # [B, H, G]
    s_self = s_self.transpose(0, 2, 1).reshape(B, GH, 1)  # group-major
    vc_g = jnp.tile(vc, (1, G, 1))  # [B, GH, D] row g*H+h = head h
    m2 = jnp.maximum(m, s_self)
    alpha = jnp.exp(m - m2)
    p_self = jnp.exp(s_self - m2)
    l2 = jnp.maximum(l * alpha + p_self, 1e-30)
    out = (acc * alpha + p_self * vc_g) / l2  # [B, GH, D] group-major

    out = (
        out.reshape(B, G, H, D).transpose(0, 2, 1, 3).reshape(B, Hq, D)
    )
    return out.astype(q.dtype)


@register_pallas("paged_decode_attention")
def _paged_attn_dispatch(q, cache, block_tables, context_lens, layer_idx,
                         k_cur, v_cur, kv_bits, sm_scale, sliding_window=None):
    import os

    D = q.shape[-1]
    ps = cache.page_size
    if os.environ.get("QSERVE_TPU_EXACT_ATTN", "0") == "1":
        return None  # full-float XLA fallback (accuracy studies)
    if not supports(ps, D, cache.data.shape[-1]):
        return None  # dispatcher falls back to XLA
    sm = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    return paged_decode_attention_pallas(
        q, cache.data, cache.scales, block_tables, context_lens,
        layer_idx, k_cur, v_cur, kv_bits == 4, sm,
        window=int(sliding_window or 0),
        # dev-only stage-skip modes (dma/nounpack/noscale/noqk/noexp/nopv/
        # nodiag) and tuning overrides; static args so interleaved A/B runs
        # in one process get distinct executables (ablate_decode attnonly:..)
        ablate=os.environ.get("QSERVE_ATTN_ABLATE", ""),
        tuning=(
            os.environ.get("QSERVE_ATTN_PCHUNK"),
            os.environ.get("QSERVE_ATTN_NBUF"),
            os.environ.get("QSERVE_ATTN_SB"),
        ),
    )
