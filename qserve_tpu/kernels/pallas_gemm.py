"""Pallas TPU kernels for the QoQ quantized GEMMs (N1/N2/N3).

TPU-native equivalents of the reference CUDA extensions
qgemm_w4a8_per_chn / qgemm_w4a8_per_group / qgemm_w8a8
(kernels/csrc/qgemm/*/gemm_cuda.cu). Same math, different machine:

  * UINT4 weights arrive packed two-per-byte along K in half-tile order
    (quant/packing.py) so the in-kernel unpack is mask/shift + a contiguous
    concat — no sublane shuffles (the TPU analog of the reference's
    AND/shift-only nibble unpack, gemm_cuda.cu:276-301);
  * the MXU does int8 x int8 -> int32 via dot_general(preferred int32),
    replacing mma.sync.m16n8k32.s8 (gemm_cuda.cu:130-146);
  * per-channel epilogue is the subtraction-free zero correction
    out = psum*s1*a_scale - s1_szero*a_sum (gemm_cuda.cu:564-593);
  * per-group level-2 dequant (w_i8 = q*s2 + z2, int8 lattice) runs on the
    VPU between unpack and the MXU dot (per_group/gemm_cuda.cu:271-326);
  * K is the innermost grid dim with an int32 VMEM accumulator, giving the
    double-buffered HBM->VMEM weight pipeline the reference builds by hand
    with cp.async stages (gemm_cuda.cu:403-417).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas
from qserve_tpu.quant.packing import PACK_TILE


def _unpack_block(w_packed_i32: jax.Array) -> jax.Array:
    """[bk/2, bn] int32 -> [bk, bn] int8 (values 0..15), half-tile order."""
    lo = (w_packed_i32 & 0xF).astype(jnp.int8)
    hi = ((w_packed_i32 >> 4) & 0xF).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def _pick_bk(K: int) -> int:
    return PACK_TILE if K % PACK_TILE == 0 else K


def _pick(m: int, cands) -> int:
    for c in cands:
        if m % c == 0:
            return c
    return m


# ---------------------------------------------------------------------------
# N1: W4A8 per-channel
# ---------------------------------------------------------------------------


def _w4a8_chn_kernel(a_ref, w_ref, s1_ref, sz_ref, as_ref, asum_ref,
                     out_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_block(w_ref[:].astype(jnp.int32))  # [bk, bn] int8 0..15
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        psum = acc_ref[:].astype(jnp.float32)
        out = psum * s1_ref[:] * as_ref[:] - sz_ref[:] * asum_ref[:]
        out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w4a8_gemm_per_chn_pallas(
    a_i8, a_scale, a_sum, qweight_packed, s1_scale, s1_szero,
    out_dtype=jnp.bfloat16,
):
    M, K = a_i8.shape
    N = qweight_packed.shape[1]
    bk = _pick_bk(K)
    bm = _pick(M, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    bn = _pick(N, (512, 256, 128))
    nk = K // bk
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), nk)

    return pl.pallas_call(
        functools.partial(_w4a8_chn_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
    )(a_i8, qweight_packed, s1_scale.reshape(1, N), s1_szero.reshape(1, N),
      a_scale.reshape(M, 1), a_sum.reshape(M, 1))


@register_pallas("w4a8_gemm_per_chn")
def _w4a8_chn_dispatch(a_i8, a_scale, a_sum, qw, s1, sz, out_dtype):
    return w4a8_gemm_per_chn_pallas(a_i8, a_scale, a_sum, qw, s1, sz, out_dtype)


# ---------------------------------------------------------------------------
# N2: W4A8 per-group (two-level progressive dequant)
# ---------------------------------------------------------------------------


def _w4a8_grp_kernel(a_ref, w_ref, s2s_ref, s2z_ref, s1_ref, as_ref,
                     out_ref, acc_ref, *, nk: int, bk: int, group: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_u4 = _unpack_block(w_ref[:].astype(jnp.int32)).astype(jnp.int32)  # [bk,bn]
    gpb = bk // group  # groups in this K block
    bn = w_u4.shape[1]
    # level-2: w_i8 = q*s2 + z2 on the int8 lattice (VPU)
    s2s = (s2s_ref[pl.ds(k * gpb, gpb), :].astype(jnp.int32)) & 0xFF
    s2z = s2z_ref[pl.ds(k * gpb, gpb), :].astype(jnp.int32)
    wg = w_u4.reshape(gpb, group, bn)
    w_i8 = (wg * s2s[:, None, :] + s2z[:, None, :]).reshape(bk, bn).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], w_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        psum = acc_ref[:].astype(jnp.float32)
        out_ref[:] = (psum * s1_ref[:] * as_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def w4a8_gemm_per_group_pallas(
    a_i8, a_scale, qweight_packed, s2_scale, s2_zero, s1_scale,
    group_size=128, out_dtype=jnp.bfloat16,
):
    M, K = a_i8.shape
    N = qweight_packed.shape[1]
    G = K // group_size
    bk = _pick_bk(K)
    bm = _pick(M, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    bn = _pick(N, (512, 256, 128))
    nk = K // bk
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), nk)

    return pl.pallas_call(
        functools.partial(_w4a8_grp_kernel, nk=nk, bk=bk, group=group_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            # full K/G rows of the group scales for this N tile
            pl.BlockSpec((G, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + 2 * G * N + M * N * 2,
            transcendentals=0,
        ),
    )(a_i8, qweight_packed, s2_scale, s2_zero, s1_scale.reshape(1, N),
      a_scale.reshape(M, 1))


@register_pallas("w4a8_gemm_per_group")
def _w4a8_grp_dispatch(a_i8, a_scale, qw, s2s, s2z, s1, group_size, out_dtype):
    return w4a8_gemm_per_group_pallas(
        a_i8, a_scale, qw, s2s, s2z, s1, group_size, out_dtype
    )


# ---------------------------------------------------------------------------
# N3: W8A8
# ---------------------------------------------------------------------------


def _w8a8_kernel(a_ref, w_ref, ws_ref, as_ref, out_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        psum = acc_ref[:].astype(jnp.float32)
        out_ref[:] = (psum * ws_ref[:] * as_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w8a8_gemm_pallas(a_i8, a_scale, qweight, w_scale, out_dtype=jnp.bfloat16):
    M, K = a_i8.shape
    N = qweight.shape[1]
    bk = _pick(K, (512, 256, 128))
    bm = _pick(M, (256, 128, 64, 32, 16, 8, 4, 2, 1))
    bn = _pick(N, (512, 256, 128))
    nk = pl.cdiv(K, bk)
    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn), nk)

    return pl.pallas_call(
        functools.partial(_w8a8_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n, k: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        interpret=interpret_mode(),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
    )(a_i8, qweight, w_scale.reshape(1, N), a_scale.reshape(M, 1))


@register_pallas("w8a8_gemm")
def _w8a8_dispatch(a_i8, a_scale, qw, ws, out_dtype):
    return w8a8_gemm_pallas(a_i8, a_scale, qw, ws, out_dtype)
