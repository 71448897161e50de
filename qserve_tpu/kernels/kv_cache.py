"""Paged, quantized KV cache as plain JAX arrays.

TPU-native replacement for the reference's pointer-indexed KVBlockArray
(kernels/csrc/fused_attention/kvCacheUtils.h:47-126) and CacheEngine pools
(qserve/worker/cache_engine.py): pages are *array indices* into a global pool,
never device pointers; per-token-per-head scale/zero live in separate arrays
instead of inline bytes at a page-tail offset (cache_engine.py:60-66).

Layout (per layer, stacked on a leading layer axis for lax.scan):
  data  : int8 [L, P, H, ps, Dc]  Dc = head_dim (KV8) or head_dim//2 (KV4 packed)
  scale : f32  [L, P, H, ps]
  zero  : f32  [L, P, H, ps]
Head-major within the page so a decode-attention kernel instance reading one
kv head gets a contiguous [ps, Dc] tile.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from qserve_tpu.quant import packing, qoq


class KVCache(NamedTuple):
    k_data: jax.Array
    k_scale: jax.Array
    k_zero: jax.Array
    v_data: jax.Array
    v_scale: jax.Array
    v_zero: jax.Array

    @property
    def num_layers(self) -> int:
        assert self.k_data.ndim == 5, "stacked [L,P,H,ps,Dc] cache expected"
        return self.k_data.shape[0]

    @property
    def num_pages(self) -> int:
        return self.k_data.shape[-4]

    @property
    def num_kv_heads(self) -> int:
        return self.k_data.shape[-3]

    @property
    def page_size(self) -> int:
        return self.k_data.shape[-2]

    def layer(self, i) -> "KVCache":
        return KVCache(*(a[i] for a in self))


def create_kv_cache(
    num_layers: int,
    num_pages: int,
    num_kv_heads: int,
    page_size: int,
    head_dim: int,
    kv_bits: int = 4,
    scale_dtype=jnp.float32,
) -> KVCache:
    dc = head_dim // 2 if kv_bits == 4 else head_dim
    data_shape = (num_layers, num_pages, num_kv_heads, page_size, dc)
    ss = (num_layers, num_pages, num_kv_heads, page_size)
    z = jnp.zeros
    return KVCache(
        k_data=z(data_shape, jnp.int8),
        k_scale=z(ss, scale_dtype),
        k_zero=z(ss, scale_dtype),
        v_data=z(data_shape, jnp.int8),
        v_scale=z(ss, scale_dtype),
        v_zero=z(ss, scale_dtype),
    )


def quantize_kv_for_store(
    x: jax.Array, kv_bits: int, zero_point: bool
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[T, H, D] fp -> (data [T, H, Dc] int8, scale [T, H], zero [T, H]).

    Per-token-per-head asymmetric min/max quant, matching the reference's
    RoPE+KV-update kernel semantics (applyBiasRopeUpdateKVCache.h:306-452).
    The symmetric variant (kv_zp=False) is stored in the same unsigned affine
    form with zero = -2^(bits-1) * scale, so dequant is uniform.
    """
    q, scale, zero = qoq.quantize_kv(x, bits=kv_bits, asymmetric=zero_point)
    if not zero_point:
        half = 1 << (kv_bits - 1)
        # shift signed lattice to unsigned: q_u = q_s + half
        q = (
            ((q.astype(jnp.int32) + half) & ((1 << kv_bits) - 1))
            .astype(jnp.uint8)
            .astype(jnp.int8)
        )
        zero = -half * scale
    if kv_bits == 4:
        q = packing.pack_kv4(q)
    return q, scale[..., 0], zero[..., 0]


def append_layer(
    layer: KVCache,
    k_new: jax.Array,  # [T, H, D] fp (already RoPE'd)
    v_new: jax.Array,  # [T, H, D] fp
    page_ids: jax.Array,  # [T] int32 destination page per token
    slots: jax.Array,  # [T] int32 slot within page
    kv_bits: int,
    zero_point: bool,
) -> KVCache:
    """Quantize and scatter T tokens into one layer's pages.

    Tokens with page_id < 0 are dropped (write masked to a scratch page).
    """
    kq, ks, kz = quantize_kv_for_store(k_new, kv_bits, zero_point)
    vq, vs, vz = quantize_kv_for_store(v_new, kv_bits, zero_point)
    # [T, H, Dc] -> scatter at [page, :, slot, :]. Invalid (padding) tokens are
    # routed OUT OF BOUNDS and dropped by scatter mode="drop" — routing them to
    # any real page would race genuine writes to that slot (XLA scatter with
    # duplicate indices has unspecified order).
    num_pages = layer.k_data.shape[0]
    safe_pages = jnp.where(page_ids >= 0, page_ids, num_pages)

    def scat(buf, vals):
        # buf [P, H, ps, ...]; vals [T, H, ...] -> buf[page, :, slot] = vals
        return buf.at[safe_pages, :, slots].set(vals, mode="drop")

    return KVCache(
        k_data=scat(layer.k_data, kq),
        k_scale=scat(layer.k_scale, ks),
        k_zero=scat(layer.k_zero, kz),
        v_data=scat(layer.v_data, vq),
        v_scale=scat(layer.v_scale, vs),
        v_zero=scat(layer.v_zero, vz),
    )


def gather_dequant_layer(
    layer: KVCache,
    block_tables: jax.Array,  # [B, maxP] int32 (pad with 0)
    kv_bits: int,
) -> Tuple[jax.Array, jax.Array]:
    """Gather + dequantize a layer's pages for the XLA-fallback attention.

    Returns (k, v) as f32 [B, maxP*ps, H, D].
    """
    B, maxP = block_tables.shape
    _, H, ps, dc = layer.k_data.shape

    def deq(data, scale, zero):
        d = data[block_tables]  # [B, maxP, H, ps, Dc]
        if kv_bits == 4:
            d = packing.unpack_kv4(d)  # [B, maxP, H, ps, D]
            x = (d.astype(jnp.int32) & 0xF).astype(jnp.float32)
        else:
            x = (d.astype(jnp.int32) & 0xFF).astype(jnp.float32)
        s = scale[block_tables][..., None]  # [B, maxP, H, ps, 1]
        z = zero[block_tables][..., None]
        out = x * s + z
        # [B, maxP, H, ps, D] -> [B, maxP*ps, H, D]
        return out.transpose(0, 1, 3, 2, 4).reshape(B, maxP * ps, H, -1)

    k = deq(layer.k_data, layer.k_scale, layer.k_zero)
    v = deq(layer.v_data, layer.v_scale, layer.v_zero)
    return k, v
