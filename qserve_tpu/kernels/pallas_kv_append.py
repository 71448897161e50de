"""Pallas in-place KV-cache append (decode path).

XLA's scatter rewrites the whole cache array even when the operand is donated
(measured: ~18 ms/step on a 2.5GB Llama-3-8B cache for 48 token-rows). This
kernel updates the cache truly in place via input_output_aliases.

Mosaic constrains DMA slices to whole tiles, so single rows can't move
directly; instead, per token the kernel read-modify-writes
  * the aligned 8-sublane slot group of the data page ([2, 8, H*Dc] int8,
    ~8KB) — the row merge runs in the int32 bitcast domain (4 int8 sublanes
    per word), the same packed-word trick the GEMM unpack uses;
  * the whole scale block of the page ([2, 2H, ps] f32, ~16KB) — slots live
    on the lane axis there, so the update is a lane-masked select.
All DMAs for a layer are issued in overlapping phases. Precondition: valid
tokens target DISTINCT pages (decode guarantees this: every running sequence
exclusively owns its last page after copy-on-write).

Reference counterpart: the quantize+append half of the MMHA kernel
(decoderMaskedMultiheadAttentionTemplate.hpp K: :1221-1349, V: :1033-1113) —
there fused into attention; here a standalone batched step (quantization
itself runs in XLA: [L, T, H, D] elementwise, tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode

_GRP = 8  # sublane group per data RMW (aligned to the (8,128)(4,1) tiling)
_CHUNK = 32  # tokens per DMA phase (bounds live semaphores: sflag is ~2KB)


def _append_kernel(
    # scalar prefetch
    pages_ref,  # [T] int32 (SMEM)
    slots_ref,  # [T] int32 (SMEM)
    # blocked inputs
    rows_ref,  # [1, T, 2, HDc] int8 (VMEM) — this layer's packed rows
    scrows_ref,  # [1, T, 2, 2H] f32 (VMEM)
    # aliased in/out (ANY)
    data_ref,
    scales_ref,
    data_out,  # [L, P, 2, ps, HDc] int8
    scales_out,  # [L, P, 2, 2H, ps] f32
    # scratch
    dblk,  # [T, 2, GRP, HDc] int8
    sblk,  # [T, 2, 2H, ps] f32
    sem_dr,  # DMA [T]
    sem_dw,  # DMA [T]
    sem_sr,  # DMA [T]
    sem_sw,  # DMA [T]
    *,
    T: int,
    ps: int,
    interpret: bool,
):
    li = pl.program_id(0)

    def grp_of(slot):
        return pl.multiple_of((slot // _GRP) * _GRP, _GRP)

    # tokens are processed in chunks of _CHUNK (the sflag budget bounds the
    # number of live DMA semaphores); phases overlap within a chunk
    for c0 in range(0, T, _CHUNK):
      trange = range(c0, min(c0 + _CHUNK, T))
      # phase A: start all reads
      for t in trange:
        page = pages_ref[t]

        @pl.when(page >= 0)
        def _(t=t, page=page):
            g = grp_of(slots_ref[t])
            pltpu.make_async_copy(
                data_out.at[li, page, :, pl.ds(g, _GRP), :],
                dblk.at[t % _CHUNK], sem_dr.at[t % _CHUNK],
            ).start()
            pltpu.make_async_copy(
                scales_out.at[li, page], sblk.at[t % _CHUNK], sem_sr.at[t % _CHUNK]
            ).start()

      # phase B: merge + start writes
      for t in trange:
        page = pages_ref[t]

        @pl.when(page >= 0)
        def _(t=t, page=page):
            slot = slots_ref[t]
            g = grp_of(slot)
            pltpu.make_async_copy(
                data_out.at[li, page, :, pl.ds(g, _GRP), :],
                dblk.at[t % _CHUNK], sem_dr.at[t % _CHUNK],
            ).wait()
            row = rows_ref[0, t]  # [2, HDc] int8
            tc = t % _CHUNK
            if interpret:
                sub = jax.lax.broadcasted_iota(
                    jnp.int32, (2, _GRP, row.shape[-1]), 1
                )
                dblk[tc] = jnp.where(
                    sub == (slot - g),
                    jnp.broadcast_to(row[:, None, :], dblk.shape[1:]),
                    dblk[tc],
                )
            else:
                # int8 has no elementwise select on the VPU; merge the row
                # through the int32 word domain (4 sublanes per word)
                old = pltpu.bitcast(dblk[tc], jnp.int32)  # [2, GRP//4, HDc]
                word = (slot - g) // 4
                shift = ((slot - g) % 4) * 8
                keep = ~(jnp.int32(0xFF) << shift)
                byts = (row.astype(jnp.int32) & 0xFF) << shift  # [2, HDc]
                sub = jax.lax.broadcasted_iota(
                    jnp.int32, (2, _GRP // 4, old.shape[-1]), 1
                )
                merged = jnp.where(
                    sub == word, (old & keep) | byts[:, None, :], old
                )
                dblk[tc] = pltpu.bitcast(merged, jnp.int8)
            pltpu.make_async_copy(
                dblk.at[tc],
                data_out.at[li, page, :, pl.ds(g, _GRP), :],
                sem_dw.at[tc],
            ).start()

            pltpu.make_async_copy(
                scales_out.at[li, page], sblk.at[t % _CHUNK], sem_sr.at[t % _CHUNK]
            ).wait()
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (sblk.shape[1], sblk.shape[2], ps), 2
            )
            # merge in f32: Mosaic rejects the [2, 2H] -> [2, 2H, 1] reshape
            # on bf16 vectors (bf16 scale storage), and the upcast is tiny
            newv = scrows_ref[0, t].astype(jnp.float32)[:, :, None]  # [2,2H,1]
            sblk[tc] = jnp.where(
                lane == slot, newv, sblk[tc].astype(jnp.float32)
            ).astype(sblk.dtype)
            pltpu.make_async_copy(
                sblk.at[tc], scales_out.at[li, page], sem_sw.at[tc]
            ).start()

      # phase C: drain writes
      for t in trange:
        page = pages_ref[t]

        @pl.when(page >= 0)
        def _(t=t, page=page):
            g = grp_of(slots_ref[t])
            pltpu.make_async_copy(
                dblk.at[t % _CHUNK],
                data_out.at[li, page, :, pl.ds(g, _GRP), :],
                sem_dw.at[t % _CHUNK],
            ).wait()
            pltpu.make_async_copy(
                sblk.at[t % _CHUNK], scales_out.at[li, page],
                sem_sw.at[t % _CHUNK]
            ).wait()


def _page_write_kernel(
    # scalar prefetch
    pages_ref,  # [NS] int32 destination page per stage (-1 = skip)
    # inputs (ANY — staged pages are DMA'd HBM -> HBM)
    staged_d_ref,  # [L, NS, 2, ps, HDc] int8
    staged_s_ref,  # [L, NS, 2, 2H, ps] f32
    data_ref,
    scales_ref,
    data_out,  # aliased
    scales_out,  # aliased
    sem_d,
    sem_s,
):
    li = pl.program_id(0)
    NS = staged_d_ref.shape[1]
    for c0 in range(0, NS, _CHUNK):
        srange = range(c0, min(c0 + _CHUNK, NS))
        for s in srange:
            @pl.when(pages_ref[s] >= 0)
            def _(s=s):
                page = pages_ref[s]
                pltpu.make_async_copy(
                    staged_d_ref.at[li, s], data_out.at[li, page],
                    sem_d.at[s % _CHUNK],
                ).start()
                pltpu.make_async_copy(
                    staged_s_ref.at[li, s], scales_out.at[li, page],
                    sem_s.at[s % _CHUNK],
                ).start()
        for s in srange:
            @pl.when(pages_ref[s] >= 0)
            def _(s=s):
                page = pages_ref[s]
                pltpu.make_async_copy(
                    staged_d_ref.at[li, s], data_out.at[li, page],
                    sem_d.at[s % _CHUNK],
                ).wait()
                pltpu.make_async_copy(
                    staged_s_ref.at[li, s], scales_out.at[li, page],
                    sem_s.at[s % _CHUNK],
                ).wait()


@jax.jit
def kv_write_pages_inplace(
    data: jax.Array,  # [L, P, 2, ps, HDc] int8 (donated)
    scales: jax.Array,  # [L, P, 2, 2H, ps] f32 (donated)
    staged_d: jax.Array,  # [L, NS, 2, ps, HDc] int8
    staged_s: jax.Array,  # [L, NS, 2, 2H, ps] f32
    stage_pages: jax.Array,  # [NS] int32 (-1 = skip)
):
    """Write whole staged pages into the cache in place (prefill appends).

    The caller stages each touched page's full contents in a SMALL array
    (XLA scatter over ~T/ps pages instead of the multi-GB cache), then this
    kernel DMAs staged pages HBM->HBM to their physical slots. Precondition:
    prompts start at slot 0 of fresh pages (always true: prefill and
    preemption-by-recompute process whole prompts), so unwritten tail slots
    of a partial page are never-read garbage until decode RMWs them.
    """
    L = data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((_CHUNK,)),
            pltpu.SemaphoreType.DMA((_CHUNK,)),
        ],
    )
    return pl.pallas_call(
        _page_write_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(data.shape, data.dtype),
            jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
    )(stage_pages, staged_d, staged_s, data, scales)


@jax.jit
def kv_append_inplace(
    data: jax.Array,  # [L, P, 2, ps, HDc] int8 (donated)
    scales: jax.Array,  # [L, P, 2, 2H, ps] f32 (donated)
    rows: jax.Array,  # [L, T, 2, HDc] int8 packed token rows
    scrows: jax.Array,  # [L, T, 2, 2H] f32 scale+zero rows
    page_ids: jax.Array,  # [T] int32 (-1 = drop)
    slots: jax.Array,  # [T] int32
):
    L, T = rows.shape[0], rows.shape[1]
    HDc = rows.shape[-1]
    twoH = scrows.shape[-1]
    ps = scales.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, T, 2, HDc), lambda l, *_: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 2, twoH), lambda l, *_: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((min(T, _CHUNK), 2, _GRP, HDc), jnp.int8),
            pltpu.VMEM((min(T, _CHUNK), 2, twoH, ps), scales.dtype),
            pltpu.SemaphoreType.DMA((min(T, _CHUNK),)),
            pltpu.SemaphoreType.DMA((min(T, _CHUNK),)),
            pltpu.SemaphoreType.DMA((min(T, _CHUNK),)),
            pltpu.SemaphoreType.DMA((min(T, _CHUNK),)),
        ],
    )
    new_data, new_scales = pl.pallas_call(
        functools.partial(_append_kernel, T=T, ps=ps,
                          interpret=interpret_mode()),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(data.shape, data.dtype),
            jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        ],
        # operand indices include the scalar-prefetch args
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
    )(page_ids, slots, rows, scrows, data, scales)
    return new_data, new_scales
