"""Public compute-op API with XLA fallback implementations.

Each op has the signature the model layers call. The Pallas TPU kernels in
this package register themselves here and are used when (a) running on TPU
and (b) not explicitly disabled; otherwise the pure-XLA fallbacks run (CPU
tests, interpret mode, and as the parity reference).

Op inventory mirrors the reference's native extensions (SURVEY.md §2.4):
  N1 w4a8_gemm_per_chn    <- qgemm_w4a8_per_chn
  N2 w4a8_gemm_per_group  <- qgemm_w4a8_per_group
  N3 w8a8_gemm            <- qgemm_w8a8
  N4 prefill/decode attention + KV append  <- fused_attention
  N5 quant_per_token      <- fused_kernels invoke_quant[_fuse_sum]
  N6 rmsnorm_quant        <- layernorm_ops rms_norm_general[_fuse_sum]
  N7 silu_mul_quant       <- activation_ops silu_and_mul + quant
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qserve_tpu.quant import packing, qoq

_PALLAS_REGISTRY = {}


def register_pallas(name: str):
    def deco(fn):
        _PALLAS_REGISTRY[name] = fn
        return fn

    return deco


@functools.cache
def use_pallas() -> bool:
    """Dispatch to Pallas kernels? TPU only (or forced via env for tests)."""
    if os.environ.get("QSERVE_TPU_FORCE_XLA", "0") == "1":
        return False
    if os.environ.get("QSERVE_TPU_FORCE_PALLAS", "0") == "1":
        return True  # e.g. interpret-mode testing on CPU
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def interpret_mode() -> bool:
    return os.environ.get("QSERVE_TPU_INTERPRET", "0") == "1"


def _impl(name: str):
    if use_pallas() and name in _PALLAS_REGISTRY:
        return _PALLAS_REGISTRY[name]
    return None


# ---------------------------------------------------------------------------
# N5: per-token dynamic activation quantization
# ---------------------------------------------------------------------------


def quant_per_token(
    x: jax.Array, with_sum: bool = False
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """fp -> (int8 [T,K], scale f32 [T,1], act-sum f32 [T,1] | None)."""
    fn = _impl("quant_per_token")
    if fn is not None:
        out = fn(x, with_sum)
        if out is not None:  # None = shape unsupported by the kernel
            return out
    return qoq.quantize_activation_per_token(x, with_sum)


# ---------------------------------------------------------------------------
# N6: fused RMSNorm -> per-token INT8 quant
# ---------------------------------------------------------------------------


def rmsnorm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def add_rmsnorm_quant(
    h: jax.Array, delta: jax.Array, weight: jax.Array,
    eps: float = 1e-6, with_sum: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
    """Residual add + RMSNorm + per-token INT8 quant in one pass.

    Returns (h_new = h + delta (h.dtype), int8 q, scale, asum|None) — the
    fused form of the `h = h + o; rmsnorm_quant(h, ...)` pair at both
    residual sites of a decoder layer."""
    fn = _impl("add_rmsnorm_quant")
    if fn is not None:
        out = fn(h, delta, weight, eps, with_sum)
        if out is not None:
            return out
    h_new = (
        h.astype(jnp.float32) + delta.astype(jnp.float32)
    ).astype(h.dtype)
    q, s, asum = rmsnorm_quant(h_new, weight, eps, with_sum)
    return h_new, q, s, asum


def rmsnorm_quant(
    x: jax.Array, weight: jax.Array, eps: float = 1e-6, with_sum: bool = False
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """RMSNorm fused with per-token INT8 quantization (+ optional act-sum)."""
    fn = _impl("rmsnorm_quant")
    if fn is not None:
        out = fn(x, weight, eps, with_sum)
        if out is not None:
            return out
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return qoq.quantize_activation_per_token(y, with_sum)


# ---------------------------------------------------------------------------
# N7: fused SwiGLU -> per-token INT8 quant
# ---------------------------------------------------------------------------


def silu_mul_quant(
    gate_up: jax.Array, with_sum: bool = False
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """[T, 2*I] (gate ++ up) -> silu(gate)*up, quantized per token."""
    fn = _impl("silu_mul_quant")
    if fn is not None:
        out = fn(gate_up, with_sum)
        if out is not None:
            return out
    g, u = jnp.split(gate_up.astype(jnp.float32), 2, axis=-1)
    y = jax.nn.silu(g) * u
    return qoq.quantize_activation_per_token(y, with_sum)


def silu_mul(gate_up: jax.Array) -> jax.Array:
    g, u = jnp.split(gate_up.astype(jnp.float32), 2, axis=-1)
    return (jax.nn.silu(g) * u).astype(gate_up.dtype)


# ---------------------------------------------------------------------------
# N1/N2/N3: quantized GEMMs
# ---------------------------------------------------------------------------


def _slice_idx(arr: jax.Array, idx, lead: int) -> jax.Array:
    """XLA-fallback indexing of a stacked operand by [layer(/expert)] idx."""
    for i in range(lead):
        arr = jax.lax.dynamic_index_in_dim(
            arr, jnp.asarray(idx).reshape(-1)[i], axis=0, keepdims=False
        )
    return arr


def w4a8_gemm_per_chn(
    a_i8: jax.Array,
    a_scale: jax.Array,
    a_sum: jax.Array,
    qweight_packed: jax.Array,
    s1_scale: jax.Array,
    s1_szero: jax.Array,
    out_dtype=jnp.bfloat16,
    idx=None,
) -> jax.Array:
    """idx: optional int32 [d] indices into d leading stacked dims of the
    weight operands (layer / expert) — the Pallas kernel then DMAs blocks
    straight from the full stacked arrays, so the layer/expert loop never
    slices (never copies) the weights."""
    fn = _impl("w4a8_gemm_per_chn")
    if fn is not None:
        out = fn(a_i8, a_scale, a_sum, qweight_packed, s1_scale, s1_szero,
                 out_dtype, idx)
        if out is not None:  # None = shape unsupported by the kernel
            return out
    lead = qweight_packed.ndim - 2
    w = packing.unpack_w4(_slice_idx(qweight_packed, idx, lead))
    p = qoq.PerChannelW4(
        w, _slice_idx(s1_scale, idx, lead), _slice_idx(s1_szero, idx, lead)
    )
    return qoq.w4a8_gemm_per_channel_ref(a_i8, a_scale, a_sum, p, out_dtype)


def w4a8_gemm_per_group(
    a_i8: jax.Array,
    a_scale: jax.Array,
    qweight_packed: jax.Array,
    s2_scale: jax.Array,
    s2_zero: jax.Array,
    s1_scale: jax.Array,
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
    idx=None,
) -> jax.Array:
    fn = _impl("w4a8_gemm_per_group")
    if fn is not None:
        out = fn(
            a_i8, a_scale, qweight_packed, s2_scale, s2_zero, s1_scale,
            group_size, out_dtype, idx,
        )
        if out is not None:  # None = shape unsupported by the kernel
            return out
    lead = qweight_packed.ndim - 2
    w = packing.unpack_w4(_slice_idx(qweight_packed, idx, lead))
    p = qoq.PerGroupW4(
        w, _slice_idx(s2_scale, idx, lead), _slice_idx(s2_zero, idx, lead),
        _slice_idx(s1_scale, idx, lead),
    )
    return qoq.w4a8_gemm_per_group_ref(a_i8, a_scale, p, group_size, out_dtype)


def w8a8_gemm(
    a_i8: jax.Array,
    a_scale: jax.Array,
    qweight: jax.Array,
    w_scale: jax.Array,
    out_dtype=jnp.bfloat16,
    idx=None,
) -> jax.Array:
    fn = _impl("w8a8_gemm")
    if fn is not None:
        return fn(a_i8, a_scale, qweight, w_scale, out_dtype, idx)
    lead = qweight.ndim - 2
    return qoq.w8a8_gemm_ref(
        a_i8, a_scale,
        qoq.W8(_slice_idx(qweight, idx, lead), _slice_idx(w_scale, idx, lead)),
        out_dtype,
    )


def matmul(x: jax.Array, w: jax.Array, out_dtype=None) -> jax.Array:
    """Plain bf16 matmul on the MXU (w16a16 path)."""
    out_dtype = out_dtype or x.dtype
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_dtype)


# ---------------------------------------------------------------------------
# Routed (grouped) MoE GEMMs — per-M-block expert indices
# ---------------------------------------------------------------------------


def _gather_block_idx(arr: jax.Array, block_idx: jax.Array) -> jax.Array:
    """Stacked operand [..., lead dims ..., *rest] -> per-block slices
    [nb, *rest] via the [nb, d] leading-index array (XLA fallback only —
    the Pallas kernels index the stacked arrays in place)."""
    nb, d = block_idx.shape
    for i in range(d):
        take = block_idx[:, i]
        if i == 0:
            arr = arr[take]  # [nb, ...]
        else:
            arr = jnp.take_along_axis(
                arr, take.reshape((nb,) + (1,) * (arr.ndim - 1)), axis=1
            )[:, 0]
    return arr


def w4a8_gemm_per_chn_routed(
    a_i8: jax.Array,  # [M, K] sorted+padded token stream; M % nb == 0
    a_scale: jax.Array,
    a_sum: jax.Array,
    qweight_packed: jax.Array,  # [(L,) n_exp, K//2, N]
    s1_scale: jax.Array,
    s1_szero: jax.Array,
    block_idx: jax.Array,  # int32 [nb, d]: block m's ((layer,) expert)
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Grouped per-channel W4A8 GEMM: each M block multiplies ONE expert's
    weights (MoE routed dispatch) — FLOPs and weight DMA scale with top_k."""
    fn = _impl("w4a8_gemm_per_chn_routed")
    if fn is not None:
        out = fn(a_i8, a_scale, a_sum, qweight_packed, s1_scale, s1_szero,
                 block_idx, out_dtype)
        if out is not None:
            return out
    nb = block_idx.shape[0]
    M, K = a_i8.shape
    bm = M // nb
    w = packing.unpack_w4(_gather_block_idx(qweight_packed, block_idx))
    s1 = _gather_block_idx(s1_scale, block_idx)  # [nb, N]
    sz = _gather_block_idx(s1_szero, block_idx)
    psum = jax.lax.dot_general(
        a_i8.reshape(nb, bm, K), w,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # [nb, bm, N]
    out = (
        psum * s1[:, None, :] * a_scale.reshape(nb, bm, 1)
        - sz[:, None, :] * a_sum.reshape(nb, bm, 1)
    )
    return out.reshape(M, -1).astype(out_dtype)


def w8a8_gemm_routed(
    a_i8: jax.Array,
    a_scale: jax.Array,
    qweight: jax.Array,  # [(L,) n_exp, K, N]
    w_scale: jax.Array,
    block_idx: jax.Array,  # int32 [nb, d]
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    fn = _impl("w8a8_gemm_routed")
    if fn is not None:
        out = fn(a_i8, a_scale, qweight, w_scale, block_idx, out_dtype)
        if out is not None:
            return out
    nb = block_idx.shape[0]
    M, K = a_i8.shape
    bm = M // nb
    w = _gather_block_idx(qweight, block_idx)  # [nb, K, N]
    ws = _gather_block_idx(w_scale, block_idx)  # [nb, N]
    psum = jax.lax.dot_general(
        a_i8.reshape(nb, bm, K), w,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    out = psum * ws[:, None, :] * a_scale.reshape(nb, bm, 1)
    return out.reshape(M, -1).astype(out_dtype)


def w4a8_gemm_per_group_routed(
    a_i8: jax.Array,
    a_scale: jax.Array,
    qweight_packed: jax.Array,  # [(L,) n_exp, K//2, N]
    s2_scale: jax.Array,
    s2_zero: jax.Array,
    s1_scale: jax.Array,
    block_idx: jax.Array,  # int32 [nb, d]
    group_size: int = 128,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    fn = _impl("w4a8_gemm_per_group_routed")
    if fn is not None:
        out = fn(a_i8, a_scale, qweight_packed, s2_scale, s2_zero, s1_scale,
                 block_idx, group_size, out_dtype)
        if out is not None:
            return out
    nb = block_idx.shape[0]
    M, K = a_i8.shape
    bm = M // nb
    w = packing.unpack_w4(_gather_block_idx(qweight_packed, block_idx))
    p = qoq.PerGroupW4(
        w,
        _gather_block_idx(s2_scale, block_idx),
        _gather_block_idx(s2_zero, block_idx),
        _gather_block_idx(s1_scale, block_idx),
    )
    out = jax.vmap(
        lambda a, asc, pp: qoq.w4a8_gemm_per_group_ref(
            a, asc, pp, group_size, out_dtype
        )
    )(a_i8.reshape(nb, bm, K), a_scale.reshape(nb, bm, 1), p)
    return out.reshape(M, -1)


def matmul_routed(
    x: jax.Array,  # [M, K] bf16 sorted+padded token stream
    w: jax.Array,  # [(L,) n_exp, K, N] bf16
    block_idx: jax.Array,  # int32 [nb, d]
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Routed w16a16 expert GEMM (per-block weight gather + batched dot)."""
    nb = block_idx.shape[0]
    M, K = x.shape
    bm = M // nb
    wb = _gather_block_idx(w, block_idx)  # [nb, K, N]
    out = jax.lax.dot_general(
        x.reshape(nb, bm, K), wb,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )
    return out.reshape(M, -1).astype(out_dtype)
