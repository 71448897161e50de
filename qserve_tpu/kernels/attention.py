"""Attention ops: packed-varlen prefill and paged quantized decode.

XLA fallback implementations; Pallas TPU kernels (kernels/flash_attention.py,
kernels/paged_attention.py) register over these via ops.register_pallas.

Reference counterparts: flash_attn_varlen_func for prefill
(modeling/models/llama_w4a8_unpad.py:232-242) and the TRT-LLM-derived MMHA
decode kernel (decoderMaskedMultiheadAttentionTemplate.hpp) — here re-designed
around array-indexed KV pages instead of device pointers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.kernels.ops import _impl

NEG_INF = -1e30


def prefill_attention(
    q: jax.Array,  # [T, Hq, D] (RoPE applied)
    k: jax.Array,  # [T, Hkv, D]
    v: jax.Array,  # [T, Hkv, D]
    segment_ids: jax.Array,  # [T] int32, 0 = padding, >0 = sequence id
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Causal self-attention over a packed batch of variable-length prompts.

    Padding-free packing: sequences are contiguous in T, identified by
    segment id; the mask is (same segment) & (causal) [& (within window)].
    Positions within a segment are CONSECUTIVE in T (how pack_prefill lays
    prompts out), so the window mask can use stream indices directly.
    """
    fn = _impl("prefill_attention")
    if fn is not None:
        out = fn(q, k, v, segment_ids, sm_scale, sliding_window)
        if out is not None:  # None = config unsupported by the kernel
            return out

    T, Hq, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    sm = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    kq = jnp.repeat(k, rep, axis=1)  # [T, Hq, D]
    vq = jnp.repeat(v, rep, axis=1)

    scores = jnp.einsum(
        "thd,shd->hts", q.astype(jnp.float32), kq.astype(jnp.float32)
    ) * sm
    same = segment_ids[:, None] == segment_ids[None, :]
    valid = (segment_ids > 0)[:, None] & (segment_ids > 0)[None, :]
    ti = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    causal = si <= ti
    mask = same & causal & valid
    if sliding_window is not None:
        mask = mask & (si > ti - sliding_window)
    scores = jnp.where(mask[None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hts,shd->thd", p, vq.astype(jnp.float32))
    return out.astype(q.dtype)


def prefix_prefill_attention(
    q: jax.Array,  # [T, Hq, D] chunk queries (RoPE'd, positions >= start)
    k: jax.Array,  # [T, Hkv, D] chunk keys
    v: jax.Array,  # [T, Hkv, D]
    segment_ids: jax.Array,  # [T] int32, 0 = padding (one live segment)
    positions: jax.Array,  # [T] int32 absolute positions in the sequence
    cache: kvc.KVCache,
    block_tables: jax.Array,  # [1, maxP] int32 — the sequence's pages
    prefix_len: jax.Array,  # [] int32 cached positions [0, prefix_len)
    layer_idx,
    kv_bits: int,
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Chunked-prefill attention: the chunk attends its own tokens causally
    PLUS the sequence's already-cached prefix pages (chunked prefill and
    prefix compute-skip; the reference rejects both cases,
    ref core/scheduler.py:192-201 / prefix.py). One sequence per step by
    scheduler construction.

    XLA implementation: online-softmax scan over fixed-size page chunks, so
    peak transient memory is O(Hq * T * chunk) — independent of
    max_model_len (the naive [Hq, T, S+T] score tensor would be GBs per
    layer at 8K contexts).
    """
    fn = _impl("prefix_prefill_attention")
    if fn is not None:
        out = fn(q, k, v, segment_ids, positions, cache, block_tables,
                 prefix_len, layer_idx, kv_bits, sm_scale, sliding_window)
        if out is not None:
            return out

    T, Hq, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    sm = sm_scale if sm_scale is not None else 1.0 / (D**0.5)
    layer = cache.layer(layer_idx)
    ps = layer.page_size
    maxP = block_tables.shape[1]

    # chunk the cached prefix: ~1K keys of transient score tensor at a time
    ppc = max(1, 1024 // ps)
    nchunks = -(-maxP // ppc)
    tables = jnp.concatenate(
        [block_tables[0], jnp.zeros((nchunks * ppc - maxP,), jnp.int32)]
    ).reshape(nchunks, ppc)
    chunk_base = jnp.arange(nchunks, dtype=jnp.int32) * (ppc * ps)

    qf = q.astype(jnp.float32)
    qv = segment_ids > 0

    def body(carry, chunk):
        pages, base = chunk
        m, l, acc = carry
        kc, vc = kvc.gather_dequant_layer(layer, pages[None], kv_bits)
        kc = jnp.repeat(kc[0], rep, axis=1)  # [cS, Hq, D]
        vc = jnp.repeat(vc[0], rep, axis=1)
        cS = kc.shape[0]
        key_pos = base + jnp.arange(cS, dtype=jnp.int32)
        key_valid = key_pos < prefix_len
        mask = key_valid[None, :] & qv[:, None] & (
            key_pos[None, :] <= positions[:, None]
        )
        if sliding_window is not None:
            mask = mask & (key_pos[None, :] > positions[:, None] - sliding_window)
        scores = jnp.einsum("thd,shd->hts", qf, kc) * sm
        scores = jnp.where(mask[None], scores, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("hts,shd->htd", p, vc)
        return (m_new, l, acc), None

    init = (
        jnp.full((Hq, T, 1), NEG_INF, jnp.float32),
        jnp.zeros((Hq, T, 1), jnp.float32),
        jnp.zeros((Hq, T, D), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, (tables, chunk_base))

    # chunk self-attention (the T new keys), merged into the running softmax
    ks = jnp.repeat(k.astype(jnp.float32), rep, axis=1)  # [T, Hq, D]
    vs = jnp.repeat(v.astype(jnp.float32), rep, axis=1)
    mask = qv[None, :] & qv[:, None] & (
        positions[None, :] <= positions[:, None]
    )
    if sliding_window is not None:
        mask = mask & (positions[None, :] > positions[:, None] - sliding_window)
    scores = jnp.einsum("thd,shd->hts", qf, ks) * sm
    scores = jnp.where(mask[None], scores, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    corr = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new)
    l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * corr + jnp.einsum("hts,shd->htd", p, vs)

    out = acc / jnp.maximum(l, 1e-30)
    return jnp.swapaxes(out, 0, 1).astype(q.dtype)


def paged_decode_attention(
    q: jax.Array,  # [B, Hq, D] (RoPE applied, current step)
    cache: kvc.KVCache,  # FULL stacked cache (appends deferred, see below)
    block_tables: jax.Array,  # [B, maxP] int32
    context_lens: jax.Array,  # [B] int32 (including current token)
    layer_idx,  # int32 layer index into the stacked cache
    k_cur: jax.Array,  # [B, Hkv, D] current-step K (RoPE'd, unquantized)
    v_cur: jax.Array,  # [B, Hkv, D]
    kv_bits: int,
    sm_scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
) -> jax.Array:
    """Single-token decode attention over the quantized paged KV history.

    The cache holds positions < ctx-1; the current token's K/V are separate
    inputs and self-attended exactly (the reference MMHA appends + attends
    in-kernel, Template.hpp:1221-1349 — here appends are batched per step
    instead, so the big cache arrays see one scatter, not L of them).
    sliding_window: attend only the last `window` keys (incl. the current
    token); pairs with the allocator's cyclic page reuse
    (core/block_manager.py, reference block_manager.py:192-225).
    """
    fn = _impl("paged_decode_attention")
    if fn is not None:
        out = fn(q, cache, block_tables, context_lens, layer_idx,
                 k_cur, v_cur, kv_bits, sm_scale, sliding_window)
        if out is not None:  # None = config unsupported by the kernel
            return out

    B, Hq, D = q.shape
    layer = cache.layer(layer_idx)
    ps = layer.page_size
    maxP = block_tables.shape[1]
    sm = sm_scale if sm_scale is not None else 1.0 / (D**0.5)

    k, v = kvc.gather_dequant_layer(layer, block_tables, kv_bits)  # [B, S, Hkv, D]
    Hkv = k.shape[2]
    rep = Hq // Hkv
    S = maxP * ps
    # append the current token as one extra (exact) history column
    k = jnp.concatenate([k, k_cur.astype(jnp.float32)[:, None]], axis=1)
    v = jnp.concatenate([v, v_cur.astype(jnp.float32)[:, None]], axis=1)

    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, D)
    scores = jnp.einsum("bhrd,bshd->bhrs", qf, k) * sm
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S + 1), 1)
    # history valid below ctx-1; the appended column (index S) is the self
    hist = jnp.maximum(context_lens - 1, 0)[:, None]
    in_hist = pos < hist
    if sliding_window is not None:
        in_hist = in_hist & (pos > hist - sliding_window)
    mask = in_hist | (pos == S)
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhrs,bshd->bhrd", p, v)
    return out.reshape(B, Hq, D).astype(q.dtype)
