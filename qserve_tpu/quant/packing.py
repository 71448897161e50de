"""Compute-aware W4 packing for the TPU MXU.

The reference packs UINT4 weights for CUDA tensor-core ldmatrix order (32x32
tile permute + interleaved nibbles, w4a8_linear.py:200-322). That permutation
is meaningless on TPU. The TPU-native equivalent keeps the same *principle* —
lay the nibbles out so the in-kernel unpack is pure lane-local mask/shift with
no shuffles — but targets the MXU/VPU layout:

  * Weights live as [K, N] (contraction dim on sublanes, output channels on
    the 128-wide lane dim).
  * Two UINT4 values pack into one int8 along K, *half-tile split*: within
    each contiguous K-tile of ``pack_tile`` rows, the low nibbles hold rows
    [0, pack_tile/2) and the high nibbles hold rows [pack_tile/2, pack_tile).
    In-kernel unpack of a packed tile is then
        lo = p & 0xF; hi = (p >> 4) & 0xF; w = concat([lo, hi], axis=0)
    which Mosaic lowers to two vector ops and a contiguous copy — no
    sublane interleave.

Kernels must therefore use a K block size that is a multiple of ``pack_tile``.
PACK_TILE = 512 unpacked rows (256 packed int8 sublanes) matches the GEMM
kernels in qserve_tpu/kernels/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PACK_TILE = 512  # unpacked K rows per packing unit


def pack_w4(q: jax.Array, pack_tile: int = PACK_TILE) -> jax.Array:
    """Pack UINT4 values (int8 carrier, [K, N]) into nibbles, [K//2, N] int8.

    K must be divisible by pack_tile (pad first if needed); pack_tile must be
    even.
    """
    K, N = q.shape
    if K % pack_tile != 0:
        # Fall back to one tile spanning all of K (still even).
        assert K % 2 == 0, f"K={K} must be even"
        pack_tile = K
    half = pack_tile // 2
    t = q.reshape(K // pack_tile, 2, half, N).astype(jnp.int32) & 0xF
    lo, hi = t[:, 0], t[:, 1]
    packed = lo | (hi << 4)
    return packed.astype(jnp.int8).reshape(K // 2, N)


def unpack_w4(packed: jax.Array, pack_tile: int = PACK_TILE) -> jax.Array:
    """Inverse of pack_w4: [K//2, N] int8 -> [K, N] int8 with values 0..15."""
    Kh, N = packed.shape
    K = Kh * 2
    if K % pack_tile != 0:
        pack_tile = K
    half = pack_tile // 2
    p = packed.reshape(K // pack_tile, half, N).astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    return (
        jnp.stack([lo, hi], axis=1).reshape(K, N).astype(jnp.int8)
    )


def unpack_w4_block(p_block: jax.Array) -> jax.Array:
    """Unpack a single packed K-tile inside a kernel: [bk/2, N] -> [bk, N].

    The block must be exactly one packing unit (bk == pack_tile) or an
    integer number of them handled by the caller's index math.
    """
    x = p_block.astype(jnp.int32)
    lo = (x & 0xF).astype(jnp.int8)
    hi = ((x >> 4) & 0xF).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def pack_kv4(q: jax.Array) -> jax.Array:
    """Pack UINT4 KV values along the last (head_dim) axis: [..., D] -> [..., D//2].

    Layout: low nibble = element 2*i, high nibble = element 2*i+1? No —
    half-split like pack_w4 so the unpack is a concat along the last axis:
    low nibbles hold [0, D/2), high nibbles hold [D/2, D).
    """
    D = q.shape[-1]
    assert D % 2 == 0
    x = q.astype(jnp.int32) & 0xF
    lo, hi = x[..., : D // 2], x[..., D // 2 :]
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_kv4(packed: jax.Array) -> jax.Array:
    """[..., D//2] int8 -> [..., D] int8 values 0..15."""
    x = packed.astype(jnp.int32)
    lo = x & 0xF
    hi = (x >> 4) & 0xF
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)
