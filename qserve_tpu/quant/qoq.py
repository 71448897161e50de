"""QoQ (quattuor-octo-quattuor) quantization math — pure JAX, CPU-runnable.

This is the numerical core of the W4A8KV4 scheme from the QServe paper,
re-derived for TPU from the reference semantics:

  * Per-channel W4 (group_size == -1): asymmetric UINT4 weights with one fp
    scale per output channel plus a pre-multiplied "scaled zero"
    (``s1_szero = s1_scale * zero``).  The GEMM stays subtraction-free: the
    zero-point correction happens in the epilogue using the per-token
    activation sum (reference: kernels/csrc/qgemm/w4a8_per_chn/gemm_cuda.cu:564-593).
  * Per-group W4 (group_size == 128): two-level "progressive" quantization.
    Level 1 is a per-output-channel fp scale mapping fp16 weights onto the
    INT8 lattice; level 2 quantizes that INT8 intermediate to UINT4 with
    *integer* (uint8 scale, int8 zero) per-group parameters so that
    ``w_i8 = q_u4 * s2_scale + s2_zero`` is exact int8 arithmetic
    (reference: kernels/csrc/qgemm/w4a8_per_group/gemm_cuda.cu:271-326).
  * W8: symmetric per-channel INT8 weights (reference: w8a8_linear.py).
  * Activations: per-token symmetric INT8 with round-to-nearest-even
    (reference float_to_int8_rn, kernels/csrc/utils.cuh:79); the per-channel
    W4 path also consumes the per-token activation *sum* for the zero-point
    correction (reference: fused_kernels invoke_quant_fuse_sum).
  * KV cache: per-token, per-head asymmetric UINT4/UINT8 with an fp scale and
    offset stored next to the page data
    (reference: kernels/csrc/fused_attention/applyBiasRopeUpdateKVCache.h:279-452).

Everything here is plain jax.numpy so it runs on CPU for golden tests and is
the parity reference for the Pallas kernels in qserve_tpu/kernels/.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

# Value lattices.
UINT4_MAX = 15
INT8_MIN = -128
INT8_MAX = 127


def _rne(x: jax.Array) -> jax.Array:
    """Round to nearest even (matches CUDA float_to_int8_rn / cvt.rni)."""
    return jnp.round(x)  # jnp.round implements round-half-to-even


def quantize_activation_per_token(
    x: jax.Array, with_sum: bool = False
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Per-token symmetric INT8 quantization.

    Args:
      x: [..., K] float activations.
      with_sum: also return the per-token sum of the *dequantized* values
        (scale * sum(q_i8)) — the act-sum consumed by the per-channel
        zero-point correction in the GEMM epilogue.

    Returns:
      (q_i8 [..., K], scale [..., 1] f32, sum [..., 1] f32 or None)
    """
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(_rne(x / scale), INT8_MIN, INT8_MAX).astype(jnp.int8)
    s = None
    if with_sum:
        s = (
            jnp.sum(q.astype(jnp.int32), axis=-1, keepdims=True).astype(jnp.float32)
            * scale
        )
    return q, scale, s


class PerChannelW4(NamedTuple):
    """Per-channel (group_size=-1) W4 parameters, layout [K, N] for TPU.

    qweight: UINT4 values in an int8 carrier, shape [K, N] (unpacked) —
      packing to 2-nibbles-per-byte happens in quant/packing.py.
    s1_scale: f32 [N]   — per-output-channel scale.
    s1_szero: f32 [N]   — scale * zero_point (pre-multiplied).
    """

    qweight: jax.Array
    s1_scale: jax.Array
    s1_szero: jax.Array


class PerGroupW4(NamedTuple):
    """Per-group (group_size=G) two-level W4 parameters, layout [K, N].

    qweight: UINT4 values in int8 carrier, [K, N].
    s2_scale: uint8-valued int8 carrier, [K//G, N]  (level-2 integer scale).
    s2_zero:  int8, [K//G, N]                        (level-2 integer zero).
    s1_scale: f32 [N]                                (level-1 fp scale).
    """

    qweight: jax.Array
    s2_scale: jax.Array
    s2_zero: jax.Array
    s1_scale: jax.Array


class W8(NamedTuple):
    """Symmetric per-channel INT8 weights, layout [K, N]."""

    qweight: jax.Array  # int8 [K, N]
    scale: jax.Array  # f32 [N]


def quantize_weight_per_channel(w: jax.Array) -> PerChannelW4:
    """Asymmetric per-output-channel UINT4 quantization.

    Args:
      w: [K, N] float weights (note: [in, out], transposed vs the reference's
        [OC, IC] — TPU wants N on the lane dimension).
    """
    w = w.astype(jnp.float32)
    wmax = jnp.max(w, axis=0)
    wmin = jnp.min(w, axis=0)
    scale = jnp.maximum(wmax - wmin, 1e-8) / UINT4_MAX
    zero = jnp.clip(_rne(-wmin / scale), 0, UINT4_MAX)
    q = jnp.clip(_rne(w / scale) + zero, 0, UINT4_MAX).astype(jnp.int8)
    return PerChannelW4(
        qweight=q,
        s1_scale=scale.astype(jnp.float32),
        s1_szero=(scale * zero).astype(jnp.float32),
    )


def dequantize_per_channel(p: PerChannelW4) -> jax.Array:
    """Float reconstruction: (q - zero) * scale == q*scale - szero."""
    return (
        p.qweight.astype(jnp.float32) * p.s1_scale[None, :] - p.s1_szero[None, :]
    )


def quantize_weight_per_group(w: jax.Array, group_size: int = 128) -> PerGroupW4:
    """Two-level progressive quantization (QoQ per-group path).

    Level 1: per-channel symmetric mapping onto INT8:  w8 = w / s1, s1 = amax/127.
    Level 2: per-group asymmetric UINT4 with integer scale/zero such that the
      reconstruction  w8_hat = q*s2 + z2  stays exactly on the INT8 lattice.

    Args:
      w: [K, N] float weights; K must be divisible by group_size.
    """
    K, N = w.shape
    assert K % group_size == 0, f"K={K} not divisible by group_size={group_size}"
    G = K // group_size
    w = w.astype(jnp.float32)

    # Level 1: per-channel fp scale onto int8 range.
    amax = jnp.max(jnp.abs(w), axis=0)
    s1 = jnp.maximum(amax, 1e-8) / 127.0
    w8 = w / s1[None, :]  # float in [-127, 127]

    # Level 2: per-group integer asymmetric uint4.
    wg = w8.reshape(G, group_size, N)
    gmax = jnp.max(wg, axis=1)  # [G, N]
    gmin = jnp.min(wg, axis=1)
    # Integer scale >= 1 so q*s2+z2 spans the group range on the int8 lattice.
    s2 = jnp.ceil(jnp.maximum(gmax - gmin, 1e-8) / UINT4_MAX)
    s2 = jnp.clip(s2, 1, 255)
    z2 = jnp.clip(_rne(gmin), INT8_MIN, INT8_MAX)
    # Ensure q*s2 + z2 stays within int8 for q in [0, 15]:
    # z2 >= -128 by clip; top end 15*s2 + z2 <= 127 must hold -> clamp s2.
    s2 = jnp.minimum(s2, jnp.floor((127.0 - z2) / UINT4_MAX))
    s2 = jnp.maximum(s2, 1.0)
    q = _rne((wg - z2[:, None, :]) / s2[:, None, :])
    q = jnp.clip(q, 0, UINT4_MAX).astype(jnp.int8).reshape(K, N)

    return PerGroupW4(
        qweight=q,
        s2_scale=s2.astype(jnp.int16).astype(jnp.int8),  # uint8 values in int8 carrier
        s2_zero=z2.astype(jnp.int8),
        s1_scale=s1.astype(jnp.float32),
    )


def pergroup_level2_int8(p: PerGroupW4, group_size: int = 128) -> jax.Array:
    """Level-2 reconstruction: the exact INT8 intermediate weights [K, N]."""
    K, N = p.qweight.shape
    G = K // group_size
    q = p.qweight.reshape(G, group_size, N).astype(jnp.int32)
    s2 = p.s2_scale.astype(jnp.int32) & 0xFF  # uint8 semantics
    w8 = q * s2[:, None, :] + p.s2_zero.astype(jnp.int32)[:, None, :]
    return w8.reshape(K, N).astype(jnp.int8)


def dequantize_per_group(p: PerGroupW4, group_size: int = 128) -> jax.Array:
    """Float reconstruction of per-group weights."""
    w8 = pergroup_level2_int8(p, group_size).astype(jnp.float32)
    return w8 * p.s1_scale[None, :]


def quantize_weight_w8(w: jax.Array) -> W8:
    """Symmetric per-output-channel INT8 (W8A8 path)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(_rne(w / scale), INT8_MIN, INT8_MAX).astype(jnp.int8)
    return W8(qweight=q, scale=scale.astype(jnp.float32))


def dequantize_w8(p: W8) -> jax.Array:
    return p.qweight.astype(jnp.float32) * p.scale[None, :]


# ---------------------------------------------------------------------------
# Reference GEMMs (the math the Pallas kernels must reproduce bit-for-bit on
# the integer part and within float tolerance on the epilogue).
# ---------------------------------------------------------------------------


def w4a8_gemm_per_channel_ref(
    a_i8: jax.Array,
    a_scale: jax.Array,
    a_sum: jax.Array,
    p: PerChannelW4,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """out = (A·Q) * s1 * a_scale  -  s1_szero * a_sum.

    a_i8: [M, K] int8; a_scale/a_sum: [M, 1] f32; weights [K, N].
    Reference epilogue: w4a8_per_chn/gemm_cuda.cu:564-593.
    """
    psum = jax.lax.dot_general(
        a_i8,
        p.qweight,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    out = psum * p.s1_scale[None, :] * a_scale - p.s1_szero[None, :] * a_sum
    return out.astype(out_dtype)


def w4a8_gemm_per_group_ref(
    a_i8: jax.Array,
    a_scale: jax.Array,
    p: PerGroupW4,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """out = (A · (Q*s2+z2)) * s1 * a_scale — two-level progressive dequant.

    Reference: w4a8_per_group/gemm_cuda.cu:619-625.
    """
    w8 = pergroup_level2_int8(p, group_size)
    psum = jax.lax.dot_general(
        a_i8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    out = psum * p.s1_scale[None, :] * a_scale
    return out.astype(out_dtype)


def w8a8_gemm_ref(
    a_i8: jax.Array,
    a_scale: jax.Array,
    p: W8,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """out = (A·W) * w_scale * a_scale (reference: w8a8_gemm_cuda.cu:503-530)."""
    psum = jax.lax.dot_general(
        a_i8, p.qweight, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    out = psum * p.scale[None, :] * a_scale
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# KV cache quantization (per-token, per-head, asymmetric).
# ---------------------------------------------------------------------------


def quantize_kv(
    x: jax.Array, bits: int = 4, asymmetric: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Quantize K or V along the last (head_dim) axis.

    Args:
      x: [..., head_dim] float.
      bits: 4 or 8.
      asymmetric: use min/max + zero offset (kv_zp=True in the reference);
        otherwise symmetric amax.

    Returns:
      (q, scale, zero): q carries UINT4 (0..15) or UINT8-as-int8... — stored as
      int8 with values in [0, 2^bits-1] for asymmetric, or signed for symmetric.
      Reconstruction: x_hat = q * scale + zero.
    """
    x = x.astype(jnp.float32)
    qmax = (1 << bits) - 1
    if asymmetric:
        mx = jnp.max(x, axis=-1, keepdims=True)
        mn = jnp.min(x, axis=-1, keepdims=True)
        scale = jnp.maximum(mx - mn, 1e-8) / qmax
        zero = mn
        q = jnp.clip(_rne((x - mn) / scale), 0, qmax)
    else:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        half = qmax // 2  # 7 or 127
        scale = jnp.maximum(amax, 1e-8) / half
        zero = jnp.zeros_like(amax)
        q = jnp.clip(_rne(x / scale), -half - 1, half)
    # uint8 values may exceed int8 range; carry uint4/uint8 in an int32->int8
    # two's-complement byte so bit patterns survive.
    q = q.astype(jnp.int32).astype(jnp.uint8).astype(jnp.int8)
    return q, scale, zero


def dequantize_kv(q: jax.Array, scale: jax.Array, zero: jax.Array) -> jax.Array:
    """x_hat = q * scale + zero (q interpreted as unsigned byte)."""
    qu = q.astype(jnp.int32) & 0xFF
    # Symmetric path stored signed values; asymmetric stored 0..qmax. The
    # asymmetric path never exceeds 255 so the &0xFF view is correct for it;
    # for symmetric we must sign-extend. Disambiguate by zero==0 is fragile —
    # instead callers of the symmetric path use dequantize_kv_signed.
    return qu.astype(jnp.float32) * scale + zero


def dequantize_kv_signed(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale
