"""Pallas TPU fusions for the elementwise/quant ops (N5/N6/N7).

TPU-native equivalents of the reference's fused CUDA kernels
(kernels/csrc/fused_kernels.cu invoke_quant[_fuse_sum],
layernorm_kernels.cu rms_norm_general[_fuse_sum],
activation_kernels.cu silu_and_mul + quant): each op is ONE pass over the
activation block — read x, reduce (amax / var), scale, round, store int8 —
where the XLA fallback lowers to several HBM round trips (measured
~2.4 ms/step at decode B=128 vs a ~0.5 ms traffic roofline; SURVEY.md §2.4
translation note said XLA fusion was fine — the measured step disagreed).

Numerics match quant/qoq.py exactly: f32 compute, round-half-even
(jnp.round = the reference's float_to_int8_rn), clip to [-128, 127],
act-sum = scale * sum(q).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas


def _pick_bm(T: int, width: int) -> int:
    """Largest divisor of T (multiple of 8) keeping the f32 block <= ~4MB
    (the kernel lives in f32 registers ~3 blocks deep; with the 64MB scoped
    limit and double-buffered input DMA that stays comfortable)."""
    cap = max(8, (4 << 20) // (4 * max(width, 1)))
    best = 0
    for d in range(min(cap, T), 0, -1):
        if T % d == 0 and d % 8 == 0:
            best = d
            break
    return best  # 0 => no aligned divisor; caller falls back to XLA


def _quantize_store(y, q_ref, s_ref, sum_ref):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    qf = jnp.clip(jnp.round(y / scale), -128.0, 127.0)
    q_ref[:] = qf.astype(jnp.int8)
    s_ref[:] = scale
    # sum of int8 codes is exactly representable in f32 (|sum| <= 127*K < 2^24)
    sum_ref[:] = jnp.sum(qf, axis=-1, keepdims=True) * scale


def _quant_kernel(x_ref, q_ref, s_ref, sum_ref):
    _quantize_store(x_ref[:].astype(jnp.float32), q_ref, s_ref, sum_ref)


def _rmsnorm_quant_kernel(x_ref, w_ref, q_ref, s_ref, sum_ref, *, eps: float):
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    _quantize_store(y, q_ref, s_ref, sum_ref)


def _add_rmsnorm_quant_kernel(x_ref, d_ref, w_ref, h_ref, q_ref, s_ref,
                              sum_ref, *, eps: float):
    """Residual add fused with RMSNorm->quant: one pass instead of a
    standalone XLA add fusion (read h + delta, write h_new) followed by the
    norm kernel re-reading h_new — saves an HBM round trip of the hidden
    state and a dispatch per residual site (2 per decoder layer)."""
    hf = x_ref[:].astype(jnp.float32) + d_ref[:].astype(jnp.float32)
    h_ref[:] = hf.astype(h_ref.dtype)
    # normalize the ROUNDED residual (exactly what the unfused path reads)
    hr = h_ref[:].astype(jnp.float32)
    var = jnp.mean(hr * hr, axis=-1, keepdims=True)
    y = hr * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    _quantize_store(y, q_ref, s_ref, sum_ref)


def _silu_mul_quant_kernel(x_ref, q_ref, s_ref, sum_ref, *, inter: int):
    g = x_ref[:, :inter].astype(jnp.float32)
    u = x_ref[:, inter:].astype(jnp.float32)
    y = g * jax.lax.logistic(g) * u
    _quantize_store(y, q_ref, s_ref, sum_ref)


def _call(kernel, x, extra_operands, bm: int, out_width: int):
    T, W = x.shape
    grid = (T // bm,)
    in_specs = [
        pl.BlockSpec((bm, W), lambda m: (m, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(op.shape, lambda m: (0,) * op.ndim,
                     memory_space=pltpu.VMEM)
        for op in extra_operands
    ]
    q, s, asum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, out_width), lambda m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, out_width), jnp.int8),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # v5e has 128MB/core; the 16MB default rejects the f32
            # intermediates of the widest (silu, 28K-lane) blocks
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(x, *extra_operands)
    return q, s, asum


@functools.partial(jax.jit, static_argnames=("with_sum",))
def _quant_jit(x, with_sum):
    bm = _pick_bm(x.shape[0], x.shape[1])
    q, s, asum = _call(_quant_kernel, x, (), bm, x.shape[1])
    return q, s, (asum if with_sum else None)


@register_pallas("quant_per_token")
def _quant_dispatch(x, with_sum):
    if x.ndim != 2:
        return None
    T, W = x.shape
    if W % 128 != 0 or _pick_bm(T, W) == 0:
        return None  # unaligned shape -> XLA fallback
    return _quant_jit(x, with_sum)


@functools.partial(jax.jit, static_argnames=("eps", "with_sum"))
def _rmsnorm_quant_jit(x, weight, eps, with_sum):
    bm = _pick_bm(x.shape[0], x.shape[1])
    q, s, asum = _call(
        functools.partial(_rmsnorm_quant_kernel, eps=eps),
        x, (weight.reshape(1, -1),), bm, x.shape[1],
    )
    return q, s, (asum if with_sum else None)


@register_pallas("rmsnorm_quant")
def _rmsnorm_quant_dispatch(x, weight, eps, with_sum):
    if x.ndim != 2:
        return None
    T, W = x.shape
    if W % 128 != 0 or _pick_bm(T, W) == 0:
        return None
    return _rmsnorm_quant_jit(x, weight, float(eps), with_sum)


@functools.partial(jax.jit, static_argnames=("eps", "with_sum"))
def _add_rmsnorm_quant_jit(h, delta, weight, eps, with_sum):
    T, W = h.shape
    bm = _pick_bm(T, W)
    grid = (T // bm,)
    blk = lambda m: (m, 0)
    h_new, q, s, asum = pl.pallas_call(
        functools.partial(_add_rmsnorm_quant_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda m: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, W), h.dtype),
            jax.ShapeDtypeStruct((T, W), jnp.int8),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(h, delta, weight.reshape(1, -1))
    return h_new, q, s, (asum if with_sum else None)


@register_pallas("add_rmsnorm_quant")
def _add_rmsnorm_quant_dispatch(h, delta, weight, eps, with_sum):
    if h.ndim != 2 or h.shape != delta.shape:
        return None
    T, W = h.shape
    if W % 128 != 0 or _pick_bm(T, W) == 0:
        return None
    return _add_rmsnorm_quant_jit(h, delta, weight, float(eps), with_sum)


@functools.partial(jax.jit, static_argnames=("with_sum",))
def _silu_mul_quant_jit(gate_up, with_sum):
    T, W2 = gate_up.shape
    inter = W2 // 2
    bm = _pick_bm(T, W2)
    q, s, asum = _call(
        functools.partial(_silu_mul_quant_kernel, inter=inter),
        gate_up, (), bm, inter,
    )
    return q, s, (asum if with_sum else None)


@register_pallas("silu_mul_quant")
def _silu_mul_quant_dispatch(gate_up, with_sum):
    if gate_up.ndim != 2:
        return None
    T, W2 = gate_up.shape
    inter = W2 // 2
    if inter % 128 != 0 or _pick_bm(T, W2) == 0:
        return None
    return _silu_mul_quant_jit(gate_up, with_sum)
