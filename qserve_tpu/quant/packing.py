"""Compute-aware W4 packing for the TPU MXU.

The reference packs UINT4 weights for CUDA tensor-core ldmatrix order (32x32
tile permute + interleaved nibbles, w4a8_linear.py:200-322). That permutation
is meaningless on TPU. The TPU-native equivalent keeps the same *principle* —
lay the nibbles out so the in-kernel unpack is pure lane-local mask/shift with
no shuffles or copies — but targets the MXU/VPU layout:

  * Weights live as [K, N] (contraction dim on sublanes, output channels on
    the 128-wide lane dim).
  * Two UINT4 values pack into one int8 along K with a **global half-split**:
    packed row r holds K-row r in its low nibble and K-row r + K/2 in its
    high nibble. The GEMM kernels then never reassemble [K, N] at all — they
    compute

        acc += a[:, r0 : r0+bk2]            @ (p & 0xF)
             + a[:, K/2+r0 : K/2+r0+bk2]    @ ((p >> 4) & 0xF)

    i.e. two contiguous activation slices against the two nibble planes, all
    mask/shift work in the int8 domain on the VPU (no int32 widening, no
    sublane concat). This is the MXU-shaped analog of the reference's
    AND/shift-only unpack (qgemm/w4a8_per_chn/gemm_cuda.cu:276-301).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_w4(q: jax.Array) -> jax.Array:
    """Pack UINT4 values (int8 carrier, [K, N]) into [K//2, N] int8.

    Global half-split: packed[r] = q[r] | (q[r + K/2] << 4). K must be even.
    """
    K, N = q.shape
    assert K % 2 == 0, f"K={K} must be even"
    x = q.astype(jnp.int32) & 0xF
    lo, hi = x[: K // 2], x[K // 2 :]
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_w4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_w4: [..., K//2, N] int8 -> [..., K, N] int8, 0..15
    (leading dims = stacked layers/experts)."""
    x = packed.astype(jnp.int32)
    lo = x & 0xF
    hi = (x >> 4) & 0xF
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


def unpack_w4_nibbles(
    p_block: jax.Array, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """In-kernel nibble split: [bk2, N] int8 -> (lo, hi) [bk2, N] int8, 0..15.

    Mosaic has no int8 elementwise arithmetic, so the compiled path uses the
    packed-word trick (the reference's `w & 0x0F0F0F0F` unpack,
    gemm_cuda.cu:276-301, retargeted): pltpu.bitcast packs 4 int8 sublanes
    into one int32 lane, ONE mask op then extracts 4 nibbles at once —
    per-byte extraction is grouping-invariant, so the sublane packing doesn't
    matter. ~1 VPU op per 4 bytes instead of ~5 per byte via int32 widening.
    bk2 must be a multiple of 4. The interpret path (CPU tests) widens
    explicitly because pltpu.bitcast is compile-only.
    """
    if interpret:
        x = p_block.astype(jnp.int32)
        lo = (x & 0xF).astype(jnp.int8)
        hi = ((x >> 4) & 0xF).astype(jnp.int8)
        return lo, hi
    from jax.experimental.pallas import tpu as pltpu

    x = pltpu.bitcast(p_block, jnp.int32)  # [bk2/4, N]
    lo = pltpu.bitcast(x & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast(
        jax.lax.shift_right_logical(x, 4) & 0x0F0F0F0F, jnp.int8
    )
    return lo, hi


def pack_kv4(q: jax.Array) -> jax.Array:
    """Pack UINT4 KV values along the last (head_dim) axis: [..., D] -> [..., D//2].

    Half-split like pack_w4 so the unpack is a concat along the last axis:
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
