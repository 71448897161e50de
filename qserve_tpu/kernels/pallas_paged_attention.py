"""Pallas TPU paged decode attention with fused KV4/KV8 dequantization (N4b).

TPU-native replacement for the reference's TRT-LLM-derived MMHA kernel
(decoderMaskedMultiheadAttentionTemplate.hpp): one pass over each sequence's
quantized paged KV history with in-register dequant, fp32 online softmax,
and V accumulation. Differences by design:

  * KV pages are gathered by *array index* from the block table (scalar-
    prefetched into SMEM), not via raw device pointers (KVBlockArray);
  * the current step's K/V are appended by a separate scatter op before the
    kernel runs (TPU favors this split over the reference's in-kernel append,
    Template.hpp:1033-1349);
  * the grid iterates over the batch; K and V of one page arrive in ONE
    large DMA (data) + one small DMA (scales), double-buffered across the
    page loop — the TPU analog of the reference's K_LOOP_UNROLL/cp.async
    scale preloading (Template.hpp:918-953);
  * scores are computed as [G, ps] (slots on lanes) so the per-slot
    scale/zero dequant folds in as row-vector multiply-adds — the kernel
    contains zero transposes:
        scores = (q @ k_u.T) * ks + (q·1) * kz
        out   += (p * vs) @ v_u + rowsum(p * vz)
    (the subtraction-free dequant-fold, mirroring the reference's
    progressive-dequant philosophy on MXU/VPU terms).

Constraints for this kernel (dispatcher falls back to XLA otherwise):
page_size multiple of 128 and head_dim multiple of 128 (lane alignment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas

NEG_INF = -1e30


def _paged_attn_kernel(
    # scalar prefetch
    bt_ref,  # [B, maxP] int32 (SMEM)
    ctx_ref,  # [B] int32 (SMEM)
    # blocked inputs
    q_ref,  # [1, H, G, D] f32 (VMEM)
    # HBM-resident cache
    data_ref,  # [P, 2, psp, H*D] int8 (ANY)
    scales_ref,  # [P, 2, 2H, ps] f32 (ANY)
    # output
    out_ref,  # [1, H, G, D] f32 (VMEM)
    # scratch
    buf_d,  # [2, 2, psp, H*D] int8
    buf_s,  # [2, 2, 2H, ps] f32
    acc_ref,  # [H*G, D] f32
    m_ref,  # [H*G, 1] f32
    l_ref,  # [H*G, 1] f32
    sems,  # DMA sems [2, 2]
    *,
    ps: int,
    H: int,
    G: int,
    D: int,
    kv4: bool,
    sm_scale: float,
):
    b = pl.program_id(0)
    ctx = ctx_ref[b]
    npages = jax.lax.div(ctx + ps - 1, ps)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dma(slot, p):
        page = bt_ref[b, p]
        return (
            pltpu.make_async_copy(data_ref.at[page], buf_d.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(scales_ref.at[page], buf_s.at[slot], sems.at[slot, 1]),
        )

    @pl.when(npages > 0)
    def _():
        d0, s0 = dma(0, 0)
        d0.start()
        s0.start()

    def body(p, _):
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < npages)
        def _():
            d1, s1 = dma(1 - slot, p + 1)
            d1.start()
            s1.start()

        dw, sw = dma(slot, p)
        dw.wait()
        sw.wait()

        # slot positions of this page (lanes), masked against context length
        pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        valid = pos < ctx  # [1, ps]

        for h in range(H):  # static unroll over kv heads
            q_h = q_ref[0, h]  # [G, D] f32
            qsum = jnp.sum(q_h, axis=1, keepdims=True)  # [G, 1]

            def unpack(kv_idx):
                x = buf_d[slot, kv_idx, :, h * D : (h + 1) * D].astype(jnp.int32)
                if kv4:
                    lo = x & 0xF
                    hi = (x >> 4) & 0xF
                    x = jnp.concatenate([lo, hi], axis=0)  # [ps, D]
                else:
                    x = x & 0xFF
                return x.astype(jnp.float32)

            ks = buf_s[slot, 0, h : h + 1, :]  # [1, ps] scales of head h (K)
            kz = buf_s[slot, 0, H + h : H + h + 1, :]
            vs = buf_s[slot, 1, h : h + 1, :]
            vz = buf_s[slot, 1, H + h : H + h + 1, :]

            k_u = unpack(0)  # [ps, D] unscaled lattice values
            # scores[g, s] = sm * (q·k_u[s]) * ks[s] + sm * (q·1) * kz[s]
            qk = jax.lax.dot_general(
                q_h, k_u, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, ps]
            s_gp = (qk * ks + qsum * kz) * sm_scale
            s_gp = jnp.where(valid, s_gp, NEG_INF)

            m_prev = m_ref[h * G : (h + 1) * G, :]  # [G, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s_gp, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)  # [G, 1]
            p_gp = jnp.exp(s_gp - m_new)  # [G, ps]
            p_gp = jnp.where(valid, p_gp, 0.0)
            l_ref[h * G : (h + 1) * G, :] = l_ref[
                h * G : (h + 1) * G, :
            ] * alpha + jnp.sum(p_gp, axis=1, keepdims=True)
            m_ref[h * G : (h + 1) * G, :] = m_new

            v_u = unpack(1)  # [ps, D]
            # pv[g, d] = sum_s p[g,s]*(v_u[s,d]*vs[s] + vz[s])
            pv = jax.lax.dot_general(
                p_gp * vs, v_u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jnp.sum(p_gp * vz, axis=1, keepdims=True)
            acc_ref[h * G : (h + 1) * G, :] = (
                acc_ref[h * G : (h + 1) * G, :] * alpha + pv
            )
        return 0

    jax.lax.fori_loop(0, npages, body, 0, unroll=False)

    l = jnp.maximum(l_ref[:], 1e-30)  # [H*G, 1]
    out_ref[0] = (acc_ref[:] / l).reshape(H, G, D)


def supports(page_size: int, head_dim: int) -> bool:
    return page_size % 128 == 0 and head_dim % 128 == 0


@functools.partial(jax.jit, static_argnames=("kv4", "sm_scale"))
def paged_decode_attention_pallas(
    q: jax.Array,  # [B, Hq, D] (any float dtype)
    data: jax.Array,  # [P, 2, psp, H*D] int8
    scales: jax.Array,  # [P, 2, 2H, ps] f32
    block_tables: jax.Array,  # [B, maxP] int32
    context_lens: jax.Array,  # [B] int32
    kv4: bool,
    sm_scale: float,
) -> jax.Array:
    B, Hq, D = q.shape
    _, _, twoH, ps = scales.shape
    H = twoH // 2
    psp = data.shape[2]
    G = Hq // H

    qr = q.astype(jnp.float32).reshape(B, H, G, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, G, D), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, H, G, D), lambda b, *_: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, psp, H * D), jnp.int8),
            pltpu.VMEM((2, 2, 2 * H, ps), jnp.float32),
            pltpu.VMEM((H * G, D), jnp.float32),
            pltpu.VMEM((H * G, 1), jnp.float32),
            pltpu.VMEM((H * G, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    maxP = block_tables.shape[1]
    out = pl.pallas_call(
        functools.partial(
            _paged_attn_kernel, ps=ps, H=H, G=G, D=D, kv4=kv4, sm_scale=sm_scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, G, D), jnp.float32),
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * D * maxP * ps,
            bytes_accessed=B * maxP * (2 * psp * H * D + 2 * 2 * H * ps * 4),
            transcendentals=B * Hq * maxP * ps,
        ),
    )(block_tables, context_lens, qr, data, scales)
    return out.reshape(B, Hq, D).astype(q.dtype)


@register_pallas("paged_decode_attention")
def _paged_attn_dispatch(q, layer, block_tables, context_lens, kv_bits, sm_scale):
    D = q.shape[-1]
    ps = layer.page_size
    if not supports(ps, D):
        return None  # dispatcher falls back to XLA
    sm = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    return paged_decode_attention_pallas(
        q, layer.data, layer.scales, block_tables, context_lens,
        kv_bits == 4, sm,
    )
