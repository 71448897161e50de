"""Pallas TPU flash attention for packed variable-length prefill (N4 prefill).

Replaces the reference's external flash-attn varlen call
(modeling/models/llama_w4a8_unpad.py:232-242): a causal, segment-masked
online-softmax attention over the padding-free packed token stream the
engine builds (sequences contiguous in T, identified by segment id; 0 =
padding). GQA is folded INTO the kernel rows: one grid instance processes
all `rep = Hq/Hkv` query heads of a kv head as a [rep*BT, D] row block, so
k/v stream once per kv head (not once per q head) and each grid step feeds
the MXU rep x more work — at Llama-3-8B prefill shapes this cut the grid
from (32, 8, 8) = 2048 steps/layer to (8, 4, 4) = 128 and the measured step
cost ~3x (per-step fixed overheads dominated the fine grid; the dots
themselves are ~0.2 ms/layer at peak).

Grid (hkv, i, j) with the key block j innermost; blocks j > i are never
fetched (their index map clamps to i, and Pallas skips the re-fetch when the
block index repeats) and never computed (pl.when) — the block-level causal
skip that flash-attn gets from its varlen cu_seqlens loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas

NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # [1, rep, BT, D]  (all query heads of this kv head)
    k_ref,  # [1, BK, D]
    v_ref,  # [1, BK, D]
    sq_ref,  # [BT, 1] int32 segment ids (query side)
    sk_ref,  # [1, BK] int32 segment ids (key side)
    out_ref,  # [1, rep, BT, D]
    acc_ref,  # [rep*BT, D] f32
    m_ref,  # [rep*BT, 1] f32
    l_ref,  # [rep*BT, 1] f32
    *,
    rep: int,
    bt: int,
    bk: int,
    sm_scale: float,
    nj: int,
    window: int,  # 0 = full causal; else keys with k_pos > q_pos - window
):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # block-level skip: beyond-causal blocks and (sliding window) blocks
    # wholly below every query row's window
    compute = j <= i
    if window > 0:
        compute = compute & ((j + 1) * bk > i * bt - window + 1)

    @pl.when(compute)
    def _():
        # bf16 operands, f32 accumulate: full-rate MXU (f32 dots run at
        # 1/8 rate and prefill attention is compute-bound)
        q = q_ref[0].reshape(rep * bt, q_ref.shape[-1])  # sublane-dim merge
        k = k_ref[0]  # [BK, D]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * sm_scale
        )  # [rep*BT, BK]

        # row r holds query token i*bt + (r % bt) of head r // bt
        q_pos = i * bt + (
            jax.lax.broadcasted_iota(jnp.int32, (rep * bt, bk), 0) % bt
        )
        k_pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (rep * bt, bk), 1)
        seg_q = (
            pltpu.repeat(sq_ref[:], rep, axis=0) if rep > 1 else sq_ref[:]
        )  # [rep*BT, 1]
        seg_k = sk_ref[:]  # [1, BK]
        mask = (seg_q == seg_k) & (seg_q > 0) & (q_pos >= k_pos)
        if window > 0:
            # packed prompts are consecutive in the stream, so stream
            # indices difference == position difference within a segment
            mask = mask & (k_pos > q_pos - window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_new
        v = v_ref[0]  # bf16
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == nj - 1)
    def _():
        l = jnp.maximum(l_ref[:], 1e-30)
        o = acc_ref[:] / l
        out_ref[0] = o.reshape(rep, bt, out_ref.shape[-1]).astype(out_ref.dtype)


def _pick_bt(T: int) -> int:
    for c in (512, 256, 128):
        if T % c == 0:
            return c
    return T


@functools.partial(jax.jit, static_argnames=("sm_scale", "window"))
def flash_prefill_attention_pallas(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [T, Hkv, D]
    v: jax.Array,  # [T, Hkv, D]
    segment_ids: jax.Array,  # [T] int32, 0 = padding
    sm_scale: float,
    window: int = 0,
) -> jax.Array:
    T, Hq, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    bt = bk = min(T, _pick_bt(T))
    nT = pl.cdiv(T, bt)

    # [Hkv, rep, T, D]: query heads grouped under their kv head
    qt = jnp.swapaxes(q, 0, 1).reshape(Hkv, rep, T, D)
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)
    seg_col = segment_ids.reshape(T, 1)
    seg_row = segment_ids.reshape(1, T)

    def clamp(j, i):
        return jnp.minimum(j, i)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, rep=rep, bt=bt, bk=bk, sm_scale=sm_scale, nj=nT,
            window=window,
        ),
        grid=(Hkv, nT, nT),
        in_specs=[
            pl.BlockSpec((1, rep, bt, D), lambda h, i, j: (h, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda h, i, j: (h, clamp(j, i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda h, i, j: (h, clamp(j, i), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda h, i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda h, i, j: (0, clamp(j, i)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rep, bt, D), lambda h, i, j: (h, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hkv, rep, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rep * bt, D), jnp.float32),
            pltpu.VMEM((rep * bt, 1), jnp.float32),
            pltpu.VMEM((rep * bt, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # folded-GQA score blocks ([rep*512, 512] f32) plus double
            # buffering exceed the 16MB default scoped limit
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Hq * T * T * D // 2,
            bytes_accessed=2 * (Hq + 2 * Hkv) * T * D,
            transcendentals=Hq * T * T // 2,
        ),
    )(qt, kt, vt, seg_col, seg_row)
    return jnp.swapaxes(out.reshape(Hq, T, D), 0, 1)  # [T, Hq, D]


@register_pallas("prefill_attention")
def _prefill_dispatch(q, k, v, segment_ids, sm_scale, sliding_window=None):
    T, Hq, D = q.shape
    # D=64 runs with lane-padded blocks (verified by the on-TPU D=64 test)
    if D % 64 != 0 or T % 128 != 0:
        return None
    sm = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    return flash_prefill_attention_pallas(
        q, k, v, segment_ids, sm, window=int(sliding_window or 0)
    )
