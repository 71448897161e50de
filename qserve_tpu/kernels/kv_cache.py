"""Paged, quantized KV cache as plain JAX arrays.

TPU-native replacement for the reference's pointer-indexed KVBlockArray
(kernels/csrc/fused_attention/kvCacheUtils.h:47-126) and CacheEngine pools
(qserve/worker/cache_engine.py): pages are *array indices* into a global pool,
never device pointers.

Layout (stacked on a leading layer axis for lax.scan):
  data   : int8 [L, P, 2, ps, H*Dc]   axis 2: 0=K 1=V
           KV4: Dc = D//2 — two UINT4 values pack per byte along HEAD_DIM,
           half-split per head: dim d < D/2 in the low nibble, d >= D/2 in
           the high nibble (quant/packing.py pack_kv4).
           KV8: Dc = D, one byte per value.
  scales : f32 [L, P, 2, 2*H, ps]     row h = per-slot scales of head h,
           row H+h = per-slot zeros of head h (slots on the lane axis so a
           whole page's scales DMA as one 128-lane-aligned block).

Why this shape (vs the reference's inline page-tail scale bytes,
cache_engine.py:60-66, and vs packing along the slot axis):
  * a token's K (or V) occupies ONE contiguous [H*Dc] data row — appends are
    plain row scatters with no read-modify-write of shared bytes, at decode
    and prefill alike (the reference quantizes+appends inside its kernels;
    on TPU a separate scatter step wants token-owned rows);
  * one page's K+V arrive in ONE large DMA (data) + one small DMA (scales);
  * nibble unpack in-kernel is the packed-word mask trick (1 VPU op per
    4 bytes); per-head access is a lane slice;
  * the decode kernel computes scores as [G, ps] (slots on lanes), so the
    per-slot scale/zero read as [1, ps] row vectors — dequant folds in with
    zero transposes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from qserve_tpu.quant import packing, qoq


class KVCache(NamedTuple):
    data: jax.Array  # int8 [L, P, 2, ps, H*Dc] (or per-layer, rank 5 -> 4)
    scales: jax.Array  # f32 [L, P, 2, 2*H, ps]

    @property
    def num_layers(self) -> int:
        assert self.data.ndim == 5, "stacked cache expected"
        return self.data.shape[0]

    @property
    def num_pages(self) -> int:
        return self.data.shape[-4]

    @property
    def page_size(self) -> int:
        return self.data.shape[-2]

    @property
    def num_kv_heads(self) -> int:
        return self.scales.shape[-2] // 2

    def head_dim(self, kv_bits: int) -> int:
        dc = self.data.shape[-1] // self.num_kv_heads
        return dc * 2 if kv_bits == 4 else dc

    def layer(self, i) -> "KVCache":
        return KVCache(self.data[i], self.scales[i])


def create_kv_cache(
    num_layers: int,
    num_pages: int,
    num_kv_heads: int,
    page_size: int,
    head_dim: int,
    kv_bits: int = 4,
    scale_dtype=None,
) -> KVCache:
    assert head_dim % 2 == 0
    dc = head_dim // 2 if kv_bits == 4 else head_dim
    if scale_dtype is None:
        # bf16 scales halve the 12.5% KV4 scale-byte overhead (both HBM
        # bandwidth and capacity); bf16 roundoff on the scale (~0.4%) is far
        # below the 4-bit lattice rounding noise. Requires the scale block's
        # 2H sublane dim to stay bf16-tile (16) aligned for whole-page DMAs;
        # smaller-H geometries keep f32 (padding 2H up to the bf16 tile
        # would cancel the byte saving exactly, so f32 is optimal there).
        scale_dtype = (
            jnp.bfloat16 if (2 * num_kv_heads) % 16 == 0 else jnp.float32
        )
        if scale_dtype is jnp.float32 and num_kv_heads > 1:
            from qserve_tpu.logger import init_logger

            init_logger(__name__).info(
                "KV scales stored f32: 2*num_kv_heads=%d not bf16-tile "
                "aligned", 2 * num_kv_heads,
            )
    return KVCache(
        data=jnp.zeros(
            (num_layers, num_pages, 2, page_size, num_kv_heads * dc), jnp.int8
        ),
        scales=jnp.zeros(
            (num_layers, num_pages, 2, 2 * num_kv_heads, page_size), scale_dtype
        ),
    )


def quantize_kv_unpacked(
    x: jax.Array, kv_bits: int, zero_point: bool
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[T, H, D] fp -> (q [T, H, D] int32 in [0, 2^bits-1], scale, zero [T, H]).

    Per-token-per-head asymmetric min/max quant, matching the reference's
    RoPE+KV-update kernel semantics (applyBiasRopeUpdateKVCache.h:306-452).
    The symmetric variant (kv_zp=False) is stored in the same unsigned affine
    form with zero = -2^(bits-1) * scale, so dequant is uniform.
    """
    q, scale, zero = qoq.quantize_kv(x, bits=kv_bits, asymmetric=zero_point)
    q = q.astype(jnp.int32) & 0xFF
    if not zero_point:
        half = 1 << (kv_bits - 1)
        q = (q + half) & ((1 << kv_bits) - 1)
        zero = -half * scale
    return q, scale[..., 0], zero[..., 0]


def append_layer(
    layer: KVCache,
    k_new: jax.Array,  # [T, H, D] fp (already RoPE'd)
    v_new: jax.Array,  # [T, H, D] fp
    page_ids: jax.Array,  # [T] int32 destination page per token (-1 = drop)
    slots: jax.Array,  # [T] int32 slot within page
    kv_bits: int,
    zero_point: bool,
) -> KVCache:
    """Quantize and scatter T tokens into one layer's pages.

    Every token owns whole bytes (KV4 packs along head_dim), so this is a
    plain row scatter — no read-modify-write, no two-pass nibble merge.
    Invalid (padding) tokens are routed OUT OF BOUNDS and dropped by scatter
    mode="drop".
    """
    T, H, D = k_new.shape
    P = layer.data.shape[0]
    kq, ks, kz = quantize_kv_unpacked(k_new, kv_bits, zero_point)
    vq, vs, vz = quantize_kv_unpacked(v_new, kv_bits, zero_point)
    q = jnp.stack([kq, vq], axis=1)  # [T, 2, H, D] int32
    if kv_bits == 4:
        q = packing.pack_kv4(q)  # [T, 2, H, D/2], nibbles in int8 carrier
        rows = q.reshape(T, 2, -1).astype(jnp.uint8).astype(jnp.int8)
    else:
        # KV8 stores u-128 so the decode kernel's s8 MXU dot consumes it
        # directly; the +128 folds into the zero term (kz + 128*ks)
        rows = (q - 128).reshape(T, 2, -1).astype(jnp.int8)

    valid = page_ids >= 0
    safe_pages = jnp.where(valid, page_ids, P)
    data = layer.data.at[safe_pages, :, slots, :].set(rows, mode="drop")

    # scales: [T, 2, 2H] -> lane position `slot` of (page, :, :)
    sc = jnp.stack(
        [jnp.concatenate([ks, kz], -1), jnp.concatenate([vs, vz], -1)], axis=1
    )
    scales = layer.scales.at[safe_pages, :, :, slots].set(
        sc.astype(layer.scales.dtype), mode="drop"
    )
    return KVCache(data=data, scales=scales)


def _quantize_rows(k_all, v_all, kv_bits, zero_point):
    """[L, T, H, D] k/v -> packed data rows [L, T, 2, H*Dc] int8 +
    scale rows [L, T, 2, 2H] f32."""
    L, T = k_all.shape[:2]
    kq, ks, kz = quantize_kv_unpacked(k_all, kv_bits, zero_point)
    vq, vs, vz = quantize_kv_unpacked(v_all, kv_bits, zero_point)
    q = jnp.stack([kq, vq], axis=2)  # [L, T, 2, H, D] int32
    if kv_bits == 4:
        q = packing.pack_kv4(q)
        rows = q.reshape(L, T, 2, -1).astype(jnp.uint8).astype(jnp.int8)
    else:
        rows = (q - 128).reshape(L, T, 2, -1).astype(jnp.int8)
    sc = jnp.stack(
        [jnp.concatenate([ks, kz], -1), jnp.concatenate([vs, vz], -1)], axis=2
    )  # [L, T, 2, 2H]
    return rows, sc


# decode steps route through the Pallas in-place kernel below this many
# token-rows; larger (prefill) batches use the XLA scatter, whose whole-array
# rewrite amortizes over the prompt
_INPLACE_MAX_T = 256


def append_all_layers(
    cache: KVCache,
    k_all: jax.Array,  # [L, T, H, D] fp (already RoPE'd)
    v_all: jax.Array,  # [L, T, H, D]
    page_ids: jax.Array,  # [T] int32 (-1 = drop)
    slots: jax.Array,  # [T] int32
    kv_bits: int,
    zero_point: bool,
    unique_pages: bool = False,
    max_stages: int = 0,
) -> KVCache:
    """One batched append of every layer's tokens (decode defers the
    per-layer appends and issues this once per step). On TPU the append runs
    as a Pallas kernel with input_output_aliases — XLA's scatter rewrites the
    entire multi-GB cache even when donated.

    unique_pages=True asserts no two valid tokens target the same page (true
    for decode: every running sequence exclusively owns its last page after
    copy-on-write) and enables the per-token RMW kernel, whose per-page
    scale-block read-modify-writes would race on shared pages.

    max_stages > 0 enables the prefill path: tokens stage into full-page
    buffers (packed prompts fill pages from slot 0 in consecutive runs) and
    whole pages DMA into place. max_stages must upper-bound the number of
    distinct pages touched (ceil(T/ps) + num_prompts is always enough)."""
    from qserve_tpu.kernels.ops import use_pallas

    L, T, H, D = k_all.shape
    P = cache.data.shape[1]
    ps = cache.page_size
    rows, sc = _quantize_rows(k_all, v_all, kv_bits, zero_point)
    sc = sc.astype(cache.scales.dtype)

    if use_pallas() and unique_pages and T <= _INPLACE_MAX_T:
        from qserve_tpu.kernels.pallas_kv_append import kv_append_inplace

        data, scales = kv_append_inplace(
            cache.data, cache.scales, rows, sc, page_ids, slots,
        )
        return KVCache(data=data, scales=scales)

    if use_pallas() and max_stages > 0:
        from qserve_tpu.kernels.pallas_kv_append import kv_write_pages_inplace

        NS = max_stages
        valid = page_ids >= 0
        boundary = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), page_ids[1:] != page_ids[:-1]]
        )
        stage_idx = jnp.cumsum(boundary.astype(jnp.int32)) - 1  # [T]
        stage_safe = jnp.where(valid & (stage_idx < NS), stage_idx, NS)
        hdc = rows.shape[-1]
        # Payload staging by GATHER, not scatter: a per-token scatter into
        # the staged pages serializes on TPU (measured ~18 ms of the
        # 2048-token prefill step). Every staged run fills its page from
        # slot 0 upward (prompts and chunk continuations are page-aligned),
        # so the flat staged position j = stage*ps + slot is STRICTLY
        # INCREASING over valid tokens (padding is trailing) and the inverse
        # map is a searchsorted; gap/tail slots of partial pages pick up
        # neighboring-token garbage instead of zeros — those slots are
        # never read (finite values, masked by context-length everywhere).
        j = jnp.where(
            valid & (stage_idx < NS), stage_idx * ps + slots,
            jnp.int32(1 << 30),
        )
        src = jnp.searchsorted(
            j, jnp.arange(NS * ps, dtype=jnp.int32), side="left"
        )
        src = jnp.clip(src, 0, T - 1).astype(jnp.int32)
        staged_d = (
            jnp.take(jnp.swapaxes(rows, 1, 2), src, axis=2)
            .reshape(L, 2, NS, ps, hdc)
            .transpose(0, 2, 1, 3, 4)
        )
        staged_s = (
            jnp.take(jnp.swapaxes(sc, 1, 2), src, axis=2)
            .reshape(L, 2, NS, ps, 2 * H)
            .transpose(0, 2, 1, 4, 3)
        )
        stage_pages = jnp.full((NS + 1,), -1, jnp.int32)
        stage_pages = stage_pages.at[stage_safe].set(page_ids, mode="drop")
        # Dedup destination pages: prefix sharing can put one physical page
        # in two prompts' tables within the same prefill batch; the kernel
        # assumes distinct pages (overlapping in-flight DMAs otherwise).
        # Duplicate payloads are identical (same prefix tokens, deterministic
        # quantization), so keep the first occurrence, dump the rest.
        sp = stage_pages[:NS]
        dup = (sp[:, None] == sp[None, :]) & (
            jnp.arange(NS)[None, :] < jnp.arange(NS)[:, None]
        )
        sp = jnp.where((sp >= 0) & jnp.any(dup, axis=1), -1, sp)
        stage_pages = stage_pages.at[:NS].set(sp)
        data, scales = kv_write_pages_inplace(
            cache.data, cache.scales, staged_d, staged_s, stage_pages[:NS]
        )
        return KVCache(data=data, scales=scales)

    valid = page_ids >= 0
    safe_pages = jnp.where(valid, page_ids, P)
    # non-adjacent advanced indices put the index dim FIRST: values are
    # [T, L, 2, ...] — move T in front of the per-layer rows
    data = cache.data.at[:, safe_pages, :, slots, :].set(
        jnp.swapaxes(rows, 0, 1), mode="drop"
    )
    scales = cache.scales.at[:, safe_pages, :, :, slots].set(
        jnp.swapaxes(sc, 0, 1).astype(cache.scales.dtype), mode="drop"
    )
    return KVCache(data=data, scales=scales)


def gather_dequant_layer(
    layer: KVCache,
    block_tables: jax.Array,  # [B, maxP] int32 (pad with 0)
    kv_bits: int,
) -> Tuple[jax.Array, jax.Array]:
    """Gather + dequantize a layer's pages (XLA-fallback attention path).

    Returns (k, v) as f32 [B, maxP*ps, H, D].
    """
    B, maxP = block_tables.shape
    ps = layer.page_size
    H = layer.num_kv_heads
    D = layer.head_dim(kv_bits)
    dc = layer.data.shape[-1] // H

    d = layer.data[block_tables].astype(jnp.int32)  # [B,maxP,2,ps,H*Dc]
    d = d.reshape(B, maxP, 2, ps, H, dc)
    if kv_bits == 4:
        d = d & 0xFF
        lo = d & 0xF
        hi = (d >> 4) & 0xF
        d = jnp.concatenate([lo, hi], axis=-1)  # [B,maxP,2,ps,H,D]
    else:
        d = d + 128  # stored as u-128 (see append_layer)
    x = d.astype(jnp.float32)

    s = layer.scales[block_tables]  # [B,maxP,2,2H,ps]
    sc = jnp.swapaxes(s[..., :H, :], -1, -2)[..., None]  # [B,maxP,2,ps,H,1]
    zp = jnp.swapaxes(s[..., H:, :], -1, -2)[..., None]
    out = x * sc + zp  # [B,maxP,2,ps,H,D]
    k = out[:, :, 0].reshape(B, maxP * ps, H, D)
    v = out[:, :, 1].reshape(B, maxP * ps, H, D)
    return k, v
