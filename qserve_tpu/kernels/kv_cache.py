"""Paged, quantized KV cache as plain JAX arrays.

TPU-native replacement for the reference's pointer-indexed KVBlockArray
(kernels/csrc/fused_attention/kvCacheUtils.h:47-126) and CacheEngine pools
(qserve/worker/cache_engine.py): pages are *array indices* into a global pool,
never device pointers.

Layout (stacked on a leading layer axis for lax.scan):
  data   : int8 [L, P, 2, ps_packed, H*D]   axis 2: 0=K 1=V
           KV4: ps_packed = ps//2 — two UINT4 values pack per byte along the
           SLOT (sublane) axis, half-split: slot s < ps/2 in the low nibble of
           row s, slot s >= ps/2 in the high nibble of row s - ps/2.
           KV8: ps_packed = ps, one byte per value.
  scales : f32 [L, P, 2, 2*H, ps]           row h = per-slot scales of head h,
           row H+h = per-slot zeros of head h.

Why this shape (vs the reference's inline page-tail scale bytes,
cache_engine.py:60-66, and vs a naive [P, H, ps, D/2] layout):
  * the lane (last) dim of every array is a multiple of 128 whenever
    head_dim is — Mosaic tiling imposes 128-lane alignment on DMA slices;
  * one page's K+V arrive in ONE large DMA (data) + one small DMA (scales);
  * nibble unpack in-kernel is mask/shift + a sublane concat (same trick as
    the W4 weight packing); per-head access is a 128-aligned lane slice;
  * per-slot scale/zero read as [1, ps] row vectors — the decode kernel
    computes scores as [G, ps] so dequant folds in with zero transposes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from qserve_tpu.quant import qoq


class KVCache(NamedTuple):
    data: jax.Array  # int8 [L, P, 2, ps_packed, H*D] (or per-layer, rank 5)
    scales: jax.Array  # f32 [L, P, 2, 2*H, ps]

    @property
    def num_layers(self) -> int:
        assert self.data.ndim == 6, "stacked cache expected"
        return self.data.shape[0]

    @property
    def num_pages(self) -> int:
        return self.data.shape[-4]

    @property
    def page_size(self) -> int:
        return self.scales.shape[-1]

    @property
    def num_kv_heads(self) -> int:
        return self.scales.shape[-2] // 2

    @property
    def kv4(self) -> bool:
        return self.page_size != self.data.shape[-2]

    @property
    def head_dim(self) -> int:
        return self.data.shape[-1] // self.num_kv_heads

    def layer(self, i) -> "KVCache":
        return KVCache(self.data[i], self.scales[i])


def create_kv_cache(
    num_layers: int,
    num_pages: int,
    num_kv_heads: int,
    page_size: int,
    head_dim: int,
    kv_bits: int = 4,
    scale_dtype=jnp.float32,
) -> KVCache:
    assert page_size % 2 == 0
    psp = page_size // 2 if kv_bits == 4 else page_size
    return KVCache(
        data=jnp.zeros(
            (num_layers, num_pages, 2, psp, num_kv_heads * head_dim), jnp.int8
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

    Invalid (padding) tokens are routed OUT OF BOUNDS and dropped by scatter
    mode="drop" — routing them to any real page would race genuine writes
    (XLA scatter with duplicate indices has unspecified order).
    """
    T = k_new.shape[0]
    P = layer.data.shape[0]
    ps = layer.page_size
    kq, ks, kz = quantize_kv_unpacked(k_new, kv_bits, zero_point)
    vq, vs, vz = quantize_kv_unpacked(v_new, kv_bits, zero_point)
    q = jnp.stack([kq, vq], axis=1).reshape(T, 2, -1)  # [T, 2, H*D] int32
    valid = page_ids >= 0

    if kv_bits == 8:
        safe_pages = jnp.where(valid, page_ids, P)
        data = layer.data.at[safe_pages, :, slots].set(
            q.astype(jnp.uint8).astype(jnp.int8), mode="drop"
        )
    else:
        # KV4: read-modify-write the shared byte. Two sequential passes (low
        # nibbles then high nibbles) so a prefill batch writing both halves
        # of the same byte never collides within one scatter.
        ps2 = ps // 2
        rows = slots % ps2
        is_hi = slots >= ps2
        data = layer.data

        def rmw(data, sel, shift, keep_mask):
            pages_sel = jnp.where(valid & sel, page_ids, P)
            gather_pages = jnp.where(valid & sel, page_ids, 0)
            old = data[gather_pages, :, rows].astype(jnp.int32) & 0xFF
            newbyte = (old & keep_mask) | (q << shift)
            newbyte = newbyte.astype(jnp.uint8).astype(jnp.int8)
            return data.at[pages_sel, :, rows].set(newbyte, mode="drop")

        data = rmw(data, ~is_hi, 0, 0xF0)
        data = rmw(data, is_hi, 4, 0x0F)

    # scales: [P, 2, 2H, ps]; token writes column `slot` of rows [h] and [H+h]
    sc = jnp.stack(
        [jnp.concatenate([ks, kz], -1), jnp.concatenate([vs, vz], -1)], axis=1
    )  # [T, 2, 2H]
    safe_pages = jnp.where(valid, page_ids, P)
    scales = layer.scales.at[safe_pages, :, :, slots].set(
        sc.astype(layer.scales.dtype), mode="drop"
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
    D = layer.head_dim

    d = layer.data[block_tables].astype(jnp.int32) & 0xFF  # [B,maxP,2,psp,HD]
    if kv_bits == 4:
        lo = d & 0xF
        hi = (d >> 4) & 0xF
        d = jnp.concatenate([lo, hi], axis=-2)  # [B,maxP,2,ps,HD]
    x = d.astype(jnp.float32).reshape(B, maxP, 2, ps, H, D)

    s = layer.scales[block_tables]  # [B,maxP,2,2H,ps]
    sc = jnp.swapaxes(s[..., :H, :], -1, -2)[..., None]  # [B,maxP,2,ps,H,1]
    zp = jnp.swapaxes(s[..., H:, :], -1, -2)[..., None]
    out = x * sc + zp  # [B,maxP,2,ps,H,D]
    k = out[:, :, 0].reshape(B, maxP * ps, H, D)
    v = out[:, :, 1].reshape(B, maxP * ps, H, D)
    return k, v
