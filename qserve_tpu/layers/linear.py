"""Quantized linear layers as parameter pytrees + apply functions.

TPU-native counterparts of the reference's torch modules
(modeling/layers/quantized_linear/w4a8_linear.py, w8a8_linear.py): parameters
are plain arrays in [K, N] layout (contraction dim leading, output channels on
the 128-lane axis), packed for lane-local unpack (quant/packing.py) instead of
the CUDA ldmatrix interleave (w4a8_linear.py:200-322).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from qserve_tpu.kernels import ops
from qserve_tpu.quant import packing, qoq


class QuantAct(NamedTuple):
    """Per-token quantized activation produced by the fused producer ops."""

    q: jax.Array  # int8 [T, K]
    scale: jax.Array  # f32 [T, 1]
    asum: Optional[jax.Array]  # f32 [T, 1] (per-channel W4 path only)


class W4ChnLinear(NamedTuple):
    qweight: jax.Array  # int8 [K//2, N] packed nibbles
    s1_scale: jax.Array  # f32 [N]
    s1_szero: jax.Array  # f32 [N]


class W4GrpLinear(NamedTuple):
    qweight: jax.Array  # int8 [K//2, N]
    s2_scale: jax.Array  # int8 (uint8 values) [K//G, N]
    s2_zero: jax.Array  # int8 [K//G, N]
    s1_scale: jax.Array  # f32 [N]


class W8Linear(NamedTuple):
    qweight: jax.Array  # int8 [K, N]
    scale: jax.Array  # f32 [N]


class W16Linear(NamedTuple):
    weight: jax.Array  # bf16 [K, N]


LinearParams = Union[W4ChnLinear, W4GrpLinear, W8Linear, W16Linear]


def needs_act_sum(p: LinearParams) -> bool:
    return isinstance(p, W4ChnLinear)


def apply_linear(
    p: LinearParams,
    x: Union[QuantAct, jax.Array],
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    idx=None,
) -> jax.Array:
    """idx: optional int32 [d] indices addressing d leading stacked dims on
    every field of p (layer scan / expert loop): the quantized GEMM kernels
    read blocks straight out of the stacked arrays via scalar prefetch, so
    the loop never materializes per-layer weight slices."""
    if isinstance(p, W16Linear):
        assert isinstance(x, jax.Array), "w16 path takes fp activations"
        w = p.weight
        if idx is not None:
            for i in range(w.ndim - 2):
                w = jax.lax.dynamic_index_in_dim(
                    w, jnp.asarray(idx).reshape(-1)[i], 0, keepdims=False
                )
        return ops.matmul(x, w, out_dtype)
    assert isinstance(x, QuantAct), "quantized path takes QuantAct"
    if isinstance(p, W4ChnLinear):
        assert x.asum is not None, "per-channel W4 needs the act-sum"
        return ops.w4a8_gemm_per_chn(
            x.q, x.scale, x.asum, p.qweight, p.s1_scale, p.s1_szero, out_dtype,
            idx,
        )
    if isinstance(p, W4GrpLinear):
        return ops.w4a8_gemm_per_group(
            x.q, x.scale, p.qweight, p.s2_scale, p.s2_zero, p.s1_scale,
            group_size, out_dtype, idx,
        )
    if isinstance(p, W8Linear):
        return ops.w8a8_gemm(x.q, x.scale, p.qweight, p.scale, out_dtype, idx)
    raise TypeError(f"unknown linear params {type(p)}")


def supports_routed(p: LinearParams) -> bool:
    """Can apply_linear_routed run this flavor? (All current flavors.)"""
    return isinstance(p, (W4ChnLinear, W4GrpLinear, W8Linear, W16Linear))


def apply_linear_routed(
    p: LinearParams,
    x: Union[QuantAct, jax.Array],
    block_idx: jax.Array,  # int32 [nb, d]: M block m's ((layer,) expert)
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Grouped MoE expert GEMM over a sorted+padded [M, K] token stream:
    each M/nb-row block multiplies ONE expert's weights (block_idx[m]).
    FLOPs scale with top_k instead of num_experts (the reference's
    unreleased moe_helpers grouped GEMM, ref mixtral_w4a8_unpad.py:288)."""
    if isinstance(p, W16Linear):
        assert isinstance(x, jax.Array), "w16 path takes fp activations"
        return ops.matmul_routed(x, p.weight, block_idx, out_dtype)
    assert isinstance(x, QuantAct), "quantized path takes QuantAct"
    if isinstance(p, W4ChnLinear):
        assert x.asum is not None
        return ops.w4a8_gemm_per_chn_routed(
            x.q, x.scale, x.asum, p.qweight, p.s1_scale, p.s1_szero,
            block_idx, out_dtype,
        )
    if isinstance(p, W4GrpLinear):
        return ops.w4a8_gemm_per_group_routed(
            x.q, x.scale, p.qweight, p.s2_scale, p.s2_zero, p.s1_scale,
            block_idx, group_size, out_dtype,
        )
    if isinstance(p, W8Linear):
        return ops.w8a8_gemm_routed(
            x.q, x.scale, p.qweight, p.scale, block_idx, out_dtype
        )
    raise TypeError(f"no routed path for {type(p)}")


def quantize_linear_from_float(
    w: jax.Array, weight_bits: int, group_size: int = -1
) -> LinearParams:
    """Quantize a float [K, N] weight into the packed serving format."""
    if weight_bits == 16:
        return W16Linear(weight=w.astype(jnp.bfloat16))
    if weight_bits == 8:
        p = qoq.quantize_weight_w8(w)
        return W8Linear(qweight=p.qweight, scale=p.scale)
    if weight_bits == 4:
        if group_size == -1:
            p = qoq.quantize_weight_per_channel(w)
            return W4ChnLinear(
                qweight=packing.pack_w4(p.qweight),
                s1_scale=p.s1_scale,
                s1_szero=p.s1_szero,
            )
        p = qoq.quantize_weight_per_group(w, group_size)
        return W4GrpLinear(
            qweight=packing.pack_w4(p.qweight),
            s2_scale=p.s2_scale,
            s2_zero=p.s2_zero,
            s1_scale=p.s1_scale,
        )
    raise ValueError(f"weight_bits={weight_bits}")


def dequantize_linear(p: LinearParams, group_size: int = 128) -> jax.Array:
    """Float reconstruction [K, N] (for tests / golden comparisons)."""
    if isinstance(p, W16Linear):
        return p.weight.astype(jnp.float32)
    if isinstance(p, W8Linear):
        return qoq.dequantize_w8(qoq.W8(p.qweight, p.scale))
    if isinstance(p, W4ChnLinear):
        q = packing.unpack_w4(p.qweight)
        return qoq.dequantize_per_channel(qoq.PerChannelW4(q, p.s1_scale, p.s1_szero))
    if isinstance(p, W4GrpLinear):
        q = packing.unpack_w4(p.qweight)
        return qoq.dequantize_per_group(
            qoq.PerGroupW4(q, p.s2_scale, p.s2_zero, p.s1_scale), group_size
        )
    raise TypeError(type(p))
