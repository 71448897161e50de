"""Pallas TPU kernels for the QoQ quantized GEMMs (N1/N2/N3).

TPU-native equivalents of the reference CUDA extensions
qgemm_w4a8_per_chn / qgemm_w4a8_per_group / qgemm_w8a8
(kernels/csrc/qgemm/*/gemm_cuda.cu). Same math, different machine:

  * UINT4 weights arrive packed two-per-byte along K with a *global
    half-split* (quant/packing.py): packed row r carries K-row r (low nibble)
    and K-row r + K/2 (high nibble). The kernel never rebuilds [K, N]; it
    computes two dots against the nibble planes with contiguous activation
    slices — the TPU analog of the reference's AND/shift-only unpack
    (gemm_cuda.cu:276-301), with all mask/shift work in the int8 domain on
    the VPU (no widening, no sublane shuffles);
  * the MXU does int8 x int8 -> int32 via dot_general(preferred int32),
    replacing mma.sync.m16n8k32.s8 (gemm_cuda.cu:130-146);
  * per-channel epilogue is the subtraction-free zero correction
    out = psum*s1*a_scale - s1_szero*a_sum (gemm_cuda.cu:564-593);
  * per-group level-2 dequant becomes *group-partial accumulation*:
    sum_k a_k (q_k s2_g + z2_g) = sum_g [ s2_g dot(a_g, q_g) + z2_g asum_g ]
    — the s2/z2 ladder folds in as per-group int32 rescales of MXU partials
    instead of per-element weight fixup (per_group/gemm_cuda.cu:271-326);
  * the full activation row block [bm, K] stays resident in VMEM across the
    K grid (decode M is small), so each grid step issues ONE large weight DMA
    (~1MB) — the double-buffered HBM->VMEM weight pipeline the reference
    builds by hand with cp.async stages (gemm_cuda.cu:403-417).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas
from qserve_tpu.quant.packing import unpack_w4_nibbles


def _blk(ref, lead: int):
    """Read a ref whose logical block may carry `lead` size-1 leading dims
    (stacked layer/expert operands indexed by scalar-prefetched indices)."""
    if lead == 0:
        return ref[:]
    if lead == 1:
        return ref[0]
    return ref[0, 0]


def _largest_divisor(n: int, cap: int, multiple: int = 1) -> int:
    """Largest d <= cap with n % d == 0 and d % multiple == 0 (or n itself)."""
    best = None
    for d in range(min(cap, n), 0, -1):
        if n % d == 0 and d % multiple == 0:
            best = d
            break
    return best if best is not None else n

def _pick_bn(N: int) -> int:
    for c in (512, 256, 128):
        if N % c == 0:
            return c
    return N


def _pick_bm(M: int, K: int) -> int:
    # The A block [bm, K] stays VMEM-resident across the (n, k) grid (its
    # index map is constant in n/k, so Mosaic keeps one buffer), and weights
    # stream ceil(M/bm) times. At prefill shapes the refetch factor is the
    # whole ballgame: a 6MB cap made down_proj (K=14336) restream its 28MB
    # of packed weights 8x per 2048-token step. ~30MB of A + [bm, bn] acc +
    # out + double-buffered ~1MB weight blocks still fit the 64MB scoped
    # limit (v5e: 128MB/core). QSERVE_GEMM_BM_MB tunes the cap.
    import os as _os

    cap_mb = int(_os.environ.get("QSERVE_GEMM_BM_MB", "30"))
    cap = max(32, (cap_mb << 20) // max(K, 1))
    return M if M <= cap else _largest_divisor(M, cap, 1)


def _pick_bk2(K2: int, bn: int, multiple: int = 1) -> int:
    # ~1MB weight DMA per grid step; K blocks must also keep the dynamic
    # activation lane slices 128-aligned
    multiple = max(multiple, 128) if K2 % 128 == 0 else multiple
    target = max(128, (1 << 20) // bn)
    best = _largest_divisor(K2, target, multiple)
    if best < 512 and K2 * bn <= (3 << 20):
        return K2  # awkward K (e.g. 11008): one whole-K block instead
    return best


# ---------------------------------------------------------------------------
# N1: W4A8 per-channel
# ---------------------------------------------------------------------------


def _w4a8_chn_kernel(a_ref, w_ref, s1_ref, sz_ref, as_ref, asum_ref,
                     out_ref, acc_ref, *, nk: int, bk2: int, k_half: int,
                     lead: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = unpack_w4_nibbles(_blk(w_ref, lead), interpret_mode())  # [bk2, bn]
    a_lo = a_ref[:, pl.ds(k * bk2, bk2)]
    a_hi = a_ref[:, pl.ds(k_half + k * bk2, bk2)]
    acc_ref[:] += jax.lax.dot_general(
        a_lo, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ) + jax.lax.dot_general(
        a_hi, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        psum = acc_ref[:].astype(jnp.float32)
        out = psum * _blk(s1_ref, lead) * as_ref[:] - _blk(sz_ref, lead) * asum_ref[:]
        out_ref[:] = out.astype(out_ref.dtype)


def _ix_maps(idx, lead: int, per_block: bool = False):
    """Index-map builders for (stacked, plain) operands of a (m, n, k) grid.

    Stacked operands prepend `lead` indices read from the scalar-prefetched
    idx ref (layer / expert); plain operands ignore the prefetch refs.
    per_block=True: idx is [nb, lead] and row m supplies block m's leading
    indices (routed MoE: each M block belongs to one expert)."""

    def ix(t_map):
        def f(m, n, k, *refs):
            if idx is None:
                return t_map(m, n, k)
            if per_block:
                return tuple(refs[0][m, i] for i in range(lead)) + t_map(m, n, k)
            return tuple(refs[0][i] for i in range(lead)) + t_map(m, n, k)

        return f

    def ix_plain(t_map):
        def f(m, n, k, *refs):
            return t_map(m, n, k)

        return f

    return ix, ix_plain


def _maybe_stacked_call(kernel, grid, in_specs, out_spec, out_shape, scratch,
                        cost, operands, idx, per_block: bool = False):
    """pallas_call that scalar-prefetches stacked-operand indices when given.

    idx: None (plain operands), an int32 [d] array of leading indices into
    stacked operands (e.g. [layer] or [layer, expert]), or — per_block=True —
    an int32 [nb, d] array giving each M block its own leading indices;
    in_specs entries are (block, index_map_fn) where stacked operands' index
    maps already consume the prefetched ref accordingly.
    """
    if idx is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=grid,
            in_specs=in_specs, out_specs=out_spec,
            scratch_shapes=scratch,
        )
        args = operands
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=in_specs, out_specs=out_spec,
            scratch_shapes=scratch,
        )
        idx = jnp.asarray(idx, jnp.int32)
        args = (idx if per_block else idx.reshape(-1), *operands)
        inner = kernel
        kernel = lambda idx_ref, *refs: inner(*refs)  # idx only feeds index maps
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            # the k grid dim (3-D grids) serializes into the accumulator;
            # 2-D grids (whole-K kernels) have no cross-step state
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary")
                if len(grid) == 3 else ("parallel",) * len(grid)
            ),
            # v5e has 128MB VMEM/core; the 16MB default scoped limit rejects
            # prefill-shape kernels once XLA promotes their output tensor
            # into scoped space
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=cost,
    )(*args)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w4a8_gemm_per_chn_pallas(
    a_i8, a_scale, a_sum, qweight_packed, s1_scale, s1_szero,
    out_dtype=jnp.bfloat16, idx=None,
):
    """Per-channel W4A8 GEMM. qweight_packed may carry leading stacked dims
    (layers / experts) addressed by `idx`; the kernel then DMAs weight blocks
    straight out of the full stacked array — the layer scan never slices
    (and so never copies) the weights."""
    M, K = a_i8.shape
    N = qweight_packed.shape[-1]
    lead = qweight_packed.ndim - 2
    assert (idx is None) == (lead == 0)
    K2 = K // 2
    bn = _pick_bn(N)
    bm = _pick_bm(M, K)
    bk2 = _pick_bk2(K2, bn)
    nk = K2 // bk2
    grid = (pl.cdiv(M, bm), N // bn, nk)
    lead1 = (1,) * lead

    ix, ix_plain = _ix_maps(idx, lead)

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (bk2, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    s1 = s1_scale.reshape(*s1_scale.shape[:lead], 1, N)
    sz = s1_szero.reshape(*s1_szero.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w4a8_chn_kernel, nk=nk, bk2=bk2, k_half=K2,
                          lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n, k: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [pltpu.VMEM((bm, bn), jnp.int32)],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight_packed, s1, sz,
         a_scale.reshape(M, 1), a_sum.reshape(M, 1)),
        idx,
    )


def _w4a8_chn_bigm_kernel(a_ref, w_ref, s1_ref, sz_ref, as_ref, asum_ref,
                          out_ref, acc_ref, *, nk: int, lead: int):
    """Prefill-shape variant: A streams in (bm, 2, bk2) half-split blocks so
    the weight block (k, n) is fetched ONCE for the whole M range — the
    A-resident layout refetches all weights per M block, a ~(M/bm)x HBM tax
    exactly where M is large."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = unpack_w4_nibbles(_blk(w_ref, lead), interpret_mode())
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:, 0], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + jax.lax.dot_general(
        a_ref[:, 1], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        psum = acc_ref[:].astype(jnp.float32)
        out = psum * _blk(s1_ref, lead) * as_ref[:] - _blk(sz_ref, lead) * asum_ref[:]
        out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w4a8_gemm_per_chn_bigm_pallas(
    a_i8, a_scale, a_sum, qweight_packed, s1_scale, s1_szero,
    out_dtype=jnp.bfloat16, idx=None,
):
    M, K = a_i8.shape
    N = qweight_packed.shape[-1]
    lead = qweight_packed.ndim - 2
    K2 = K // 2
    # half-split-major activations: a2[:, 0] pairs with the low-nibble rows,
    # a2[:, 1] with the high-nibble rows (one cheap XLA relayout of A)
    a2 = jnp.stack([a_i8[:, :K2], a_i8[:, K2:]], axis=1)  # [M, 2, K2]
    # large M blocks cut the weight-refetch factor to ceil(M/bm); the caps
    # keep the kernel's scoped-VMEM footprint (Mosaic multi-buffers the
    # streamed blocks) under the 16MB budget
    import os as _os

    bm_cap = int(_os.environ.get("QSERVE_BIGM_BM", "1024"))
    bn_cap = int(_os.environ.get("QSERVE_BIGM_BN", "1024"))
    bk_cap = int(_os.environ.get("QSERVE_BIGM_BK2", "256"))
    bm = M if M <= bm_cap else _largest_divisor(M, bm_cap, 1)
    bn = _largest_divisor(N, bn_cap, 128 if N % 128 == 0 else 1)
    bk2 = _largest_divisor(K2, bk_cap, 128 if K2 % 128 == 0 else 1)
    nk = K2 // bk2
    grid = (pl.cdiv(M, bm), N // bn, nk)
    lead1 = (1,) * lead
    ix, ix_plain = _ix_maps(idx, lead)

    in_specs = [
        pl.BlockSpec((bm, 2, bk2), ix_plain(lambda m, n, k: (m, 0, k)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (bk2, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    s1 = s1_scale.reshape(*s1_scale.shape[:lead], 1, N)
    sz = s1_szero.reshape(*s1_szero.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w4a8_chn_bigm_kernel, nk=nk, lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n, k: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [pltpu.VMEM((bm, bn), jnp.int32)],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + M * N * 2,
            transcendentals=0,
        ),
        (a2, qweight_packed, s1, sz,
         a_scale.reshape(M, 1), a_sum.reshape(M, 1)),
        idx,
    )


def _bigm_wins(M: int, K: int, N: int) -> bool:
    """HBM-traffic model: A-resident refetches W ceil(M/bm_old) times; the
    streamed-A path refetches A ceil(N/1024) times but W only ceil(M/1024)
    times. The streamed path wins for big-K matrices (e.g. down_proj at
    prefill, where the A-resident bm collapses to ~128 rows)."""
    import os as _os

    # Disabled by default: the streamed-A layout's small strided A segments
    # measured SLOWER than the A-resident path even where the byte model
    # favors it (chained prefill harness: 301ms vs 172ms). Kept as an
    # experimental path (QSERVE_TPU_BIGM=1) and for its parity tests; the
    # production fix is the larger A-resident bm cap in _pick_bm.
    if _os.environ.get("QSERVE_TPU_BIGM", "0") != "1":
        return False
    bm_old = _pick_bm(M, K)
    if bm_old >= M or M % 128 != 0:
        return False
    W = K * N // 2
    A = M * K
    old = W * -(-M // bm_old) + A
    new = W * -(-M // 1024) + A * -(-N // 1024)
    return new < old


@register_pallas("w4a8_gemm_per_chn")
def _w4a8_chn_dispatch(a_i8, a_scale, a_sum, qw, s1, sz, out_dtype, idx=None):
    M, K = a_i8.shape
    if _bigm_wins(M, K, qw.shape[-1]):
        return w4a8_gemm_per_chn_bigm_pallas(
            a_i8, a_scale, a_sum, qw, s1, sz, out_dtype, idx
        )
    return w4a8_gemm_per_chn_pallas(
        a_i8, a_scale, a_sum, qw, s1, sz, out_dtype, idx
    )


# ---------------------------------------------------------------------------
# N2: W4A8 per-group (two-level progressive dequant via group partials)
# ---------------------------------------------------------------------------


def _w4a8_grp_kernel(a_ref, w_ref, s2s_lo_ref, s2z_lo_ref, s2s_hi_ref,
                     s2z_hi_ref, gsum_lo_ref, gsum_hi_ref, s1_ref, as_ref,
                     out_ref, acc_ref, zacc_ref,
                     *, nk: int, bk2: int, k_half: int, group: int,
                     lead: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        zacc_ref[:] = jnp.zeros_like(zacc_ref)

    gpb = bk2 // group  # whole groups per nibble plane of this block
    lo, hi = unpack_w4_nibbles(_blk(w_ref, lead), interpret_mode())  # [bk2, bn]

    def plane(a_start, w_plane, s2s):
        # sum_g s2[g] * dot(a_g, q_g); s2 rows arrive as per-K-block
        # BlockSpec slices so all in-kernel row indexing is static — Mosaic
        # rejects dynamic sub-tile row slices
        acc = jnp.zeros(acc_ref.shape, jnp.int32)
        for gi in range(gpb):  # static unroll: gpb is small (bk2/group)
            a_g = a_ref[:, pl.ds(a_start + gi * group, group)]
            q_g = w_plane[gi * group : (gi + 1) * group, :]
            dot_g = jax.lax.dot_general(
                a_g, q_g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [bm, bn]
            s2 = s2s[gi : gi + 1, :] & 0xFF
            acc += dot_g * s2
        return acc

    s2s_lo = _blk(s2s_lo_ref, lead).astype(jnp.int32)  # [gpb, bn]
    s2s_hi = _blk(s2s_hi_ref, lead).astype(jnp.int32)
    acc_ref[:] += plane(k * bk2, lo, s2s_lo)
    acc_ref[:] += plane(k_half + k * bk2, hi, s2s_hi)
    # the zero-point term sum_g asum[:, g] * z2[g, :] is ONE MXU f32 dot per
    # plane instead of 2 VPU passes per group (asum*z2 products are < 2^21
    # per group, so the f32 accumulation is exact at any realistic K)
    # HIGHEST precision: the default f32 MXU path multiplies in bf16, which
    # rounds the up-to-2^14 integer gsum values (compiled-parity failures at
    # ~0.85e-1 abs); bf16x3 keeps the integer products exact
    zacc_ref[:] += jax.lax.dot_general(
        gsum_lo_ref[0].astype(jnp.float32),
        _blk(s2z_lo_ref, lead).astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + jax.lax.dot_general(
        gsum_hi_ref[0].astype(jnp.float32),
        _blk(s2z_hi_ref, lead).astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(k == nk - 1)
    def _():
        psum = acc_ref[:].astype(jnp.float32) + zacc_ref[:]
        out_ref[:] = (psum * _blk(s1_ref, lead) * as_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def w4a8_gemm_per_group_pallas(
    a_i8, a_scale, qweight_packed, s2_scale, s2_zero, s1_scale,
    group_size=128, out_dtype=jnp.bfloat16, idx=None,
):
    M, K = a_i8.shape
    N = qweight_packed.shape[-1]
    lead = qweight_packed.ndim - 2
    assert (idx is None) == (lead == 0)
    K2 = K // 2
    G = K // group_size
    assert K2 % group_size == 0, "need K/2 divisible by group size"
    bn = _pick_bn(N)
    bm = _pick_bm(M, K)
    # scale-row blocks are (bk2/group, bn): Mosaic wants the sublane dim
    # divisible by 8, so K blocks carry whole groups in multiples of 8
    bk2 = _pick_bk2(K2, bn, multiple=8 * group_size)
    nk = K2 // bk2
    gpb = bk2 // group_size
    grid = (pl.cdiv(M, bm), N // bn, nk)
    lead1 = (1,) * lead
    ix, ix_plain = _ix_maps(idx, lead)

    # per-group activation row-sums, computed ONCE in batched XLA instead of
    # per (n, k) grid step on the kernel's VPU. Relayout [M, G] -> [2*nk, M,
    # gpb] so each k grid step's block is a FULL-lane tile (lane blocks of
    # gpb over a [M, G] array violate Mosaic's %128-or-full lane rule);
    # leading index k = lo-plane block, nk + k = hi-plane block.
    gsum = jnp.sum(
        a_i8.astype(jnp.int32).reshape(M, G, group_size), axis=2
    )  # [M, G] — groups in K order; lo plane = first G/2, hi = last G/2
    gsum3 = gsum.reshape(M, 2 * nk, gpb).transpose(1, 0, 2)

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (bk2, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        # per-K-block group-scale rows: low-nibble plane covers groups of
        # K rows [k*bk2, (k+1)*bk2) = scale-row block k; the high plane's
        # rows sit nk blocks later (global half-split packing)
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (nk + k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (nk + k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, gpb), ix_plain(lambda m, n, k: (k, m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, gpb), ix_plain(lambda m, n, k: (nk + k, m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    s1 = s1_scale.reshape(*s1_scale.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w4a8_grp_kernel, nk=nk, bk2=bk2, k_half=K2,
                          group=group_size, lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n, k: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [pltpu.VMEM((bm, bn), jnp.int32), pltpu.VMEM((bm, bn), jnp.float32)],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + 2 * G * N + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight_packed, s2_scale, s2_zero, s2_scale, s2_zero,
         gsum3, gsum3, s1, a_scale.reshape(M, 1)),
        idx,
    )


def _w4a8_grp_whole_kernel(a_ref, w_ref, s2s_ref, s2z_ref, gsum_ref, s1_ref,
                           as_ref, out_ref, *, gpp: int, group: int,
                           k_half: int, lead: int):
    """Ragged-K per-group kernel: ONE k step holding the full K strip.

    For K where K2 has no multiple-of-8-groups divisor (Llama-2 down_proj
    K=11008 -> 43 groups/plane; 13B K=13824 -> 54), per-k-block scale tiles
    can't meet the int8 sublane alignment. Instead the scale/zero/gsum
    operands arrive as FULL-row blocks (row dim never sliced -> no sublane
    alignment constraint; in-kernel row indexing is static), and the whole
    weight column strip [K2, bn] streams per (m, n) step."""
    lo, hi = unpack_w4_nibbles(_blk(w_ref, lead), interpret_mode())  # [K2, bn]
    s2s = _blk(s2s_ref, lead).astype(jnp.int32)  # [2*gpp, bn]

    def plane(a_start, w_plane, row0):
        acc = jnp.zeros(out_ref.shape, jnp.int32)
        for gi in range(gpp):
            a_g = a_ref[:, pl.ds(a_start + gi * group, group)]
            q_g = w_plane[gi * group : (gi + 1) * group, :]
            dot_g = jax.lax.dot_general(
                a_g, q_g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s2 = s2s[row0 + gi : row0 + gi + 1, :] & 0xFF
            acc += dot_g * s2
        return acc

    acc = plane(0, lo, 0) + plane(k_half, hi, gpp)
    # zero-point term for BOTH planes as one MXU f32 dot (exact: per-group
    # asum*z2 products are < 2^21, far inside f32's integer range)
    zacc = jax.lax.dot_general(
        gsum_ref[:].astype(jnp.float32),
        _blk(s2z_ref, lead).astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # see _w4a8_grp_kernel note
    )
    out = (acc.astype(jnp.float32) + zacc) * _blk(s1_ref, lead) * as_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def w4a8_gemm_per_group_whole_pallas(
    a_i8, a_scale, qweight_packed, s2_scale, s2_zero, s1_scale,
    group_size=128, out_dtype=jnp.bfloat16, idx=None,
):
    M, K = a_i8.shape
    N = qweight_packed.shape[-1]
    lead = qweight_packed.ndim - 2
    assert (idx is None) == (lead == 0)
    K2 = K // 2
    assert K2 % group_size == 0
    gpp = K2 // group_size  # groups per nibble plane
    bn = _pick_bn(N)
    # whole-K A strip resident: cap its VMEM footprint like _pick_bm
    bm = _pick_bm(M, K)
    grid = (pl.cdiv(M, bm), N // bn)
    lead1 = (1,) * lead

    def ix(t_map):
        def f(m, n, *refs):
            if idx is None:
                return t_map(m, n)
            return tuple(refs[0][i] for i in range(lead)) + t_map(m, n)

        return f

    def ix_plain(t_map):
        def f(m, n, *refs):
            return t_map(m, n)

        return f

    # per-group activation row-sums (both planes), int32 [M, 2*gpp]
    gsum = jnp.sum(
        a_i8.astype(jnp.int32).reshape(M, 2 * gpp, group_size), axis=2
    )

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (K2, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (2 * gpp, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (2 * gpp, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 2 * gpp), ix_plain(lambda m, n: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    s1 = s1_scale.reshape(*s1_scale.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w4a8_grp_whole_kernel, gpp=gpp, group=group_size,
                          k_half=K2, lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N // 2 + 2 * gpp * 2 * N + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight_packed, s2_scale, s2_zero, gsum, s1,
         a_scale.reshape(M, 1)),
        idx,
    )


@register_pallas("w4a8_gemm_per_group")
def _w4a8_grp_dispatch(a_i8, a_scale, qw, s2s, s2z, s1, group_size, out_dtype,
                       idx=None):
    K2 = a_i8.shape[1] // 2
    if K2 % (8 * group_size) != 0:
        # ragged group counts (K=11008 -> 43 groups/plane): whole-K-strip
        # kernel with full-row scale blocks (was an XLA bail-out in round 2)
        if K2 % group_size != 0:
            return None  # K not group-divisible at all -> XLA reference
        return w4a8_gemm_per_group_whole_pallas(
            a_i8, a_scale, qw, s2s, s2z, s1, group_size, out_dtype, idx
        )
    return w4a8_gemm_per_group_pallas(
        a_i8, a_scale, qw, s2s, s2z, s1, group_size, out_dtype, idx
    )


# ---------------------------------------------------------------------------
# N3: W8A8
# ---------------------------------------------------------------------------


def _w8a8_kernel(a_ref, w_ref, ws_ref, as_ref, out_ref, acc_ref,
                 *, nk: int, bk: int, lead: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:, pl.ds(k * bk, bk)], _blk(w_ref, lead), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        psum = acc_ref[:].astype(jnp.float32)
        out_ref[:] = (psum * _blk(ws_ref, lead) * as_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w8a8_gemm_pallas(a_i8, a_scale, qweight, w_scale, out_dtype=jnp.bfloat16,
                     idx=None):
    M, K = a_i8.shape
    N = qweight.shape[-1]
    lead = qweight.ndim - 2
    assert (idx is None) == (lead == 0)
    bn = _pick_bn(N)
    bm = _pick_bm(M, K)
    bk = _pick_bk2(K, bn)
    nk = K // bk
    grid = (pl.cdiv(M, bm), N // bn, nk)
    lead1 = (1,) * lead
    ix, ix_plain = _ix_maps(idx, lead)

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (bk, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    ws = w_scale.reshape(*w_scale.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w8a8_kernel, nk=nk, bk=bk, lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n, k: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [pltpu.VMEM((bm, bn), jnp.int32)],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight, ws, a_scale.reshape(M, 1)),
        idx,
    )


@register_pallas("w8a8_gemm")
def _w8a8_dispatch(a_i8, a_scale, qw, ws, out_dtype, idx=None):
    return w8a8_gemm_pallas(a_i8, a_scale, qw, ws, out_dtype, idx)


# ---------------------------------------------------------------------------
# Routed (grouped) MoE GEMMs: per-M-block expert indices
# ---------------------------------------------------------------------------
#
# MegaBlocks-style grouped GEMM for the MoE prefill dispatch
# (models/llama.py::_moe_mlp_routed): tokens arrive sorted by expert and
# padded so each bm-row block belongs to exactly ONE expert; block_idx[m]
# carries that block's leading stacked indices ((layer,) expert). Same
# kernels as the dense path — only the weight-block index maps change, so
# FLOPs and weight DMA scale with top_k instead of num_experts (the
# reference's unreleased moe_helpers would run a torch grouped GEMM here,
# ref mixtral_w4a8_unpad.py:288).


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w4a8_gemm_per_chn_routed_pallas(
    a_i8, a_scale, a_sum, qweight_packed, s1_scale, s1_szero, block_idx,
    out_dtype=jnp.bfloat16,
):
    """block_idx: int32 [nb, d] per-M-block leading indices; M % nb == 0."""
    M, K = a_i8.shape
    N = qweight_packed.shape[-1]
    nb, lead = block_idx.shape
    assert lead == qweight_packed.ndim - 2
    assert M % nb == 0
    bm = M // nb
    K2 = K // 2
    bn = _pick_bn(N)
    bk2 = _pick_bk2(K2, bn)
    nk = K2 // bk2
    grid = (nb, N // bn, nk)
    lead1 = (1,) * lead
    ix, ix_plain = _ix_maps(block_idx, lead, per_block=True)

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (bk2, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    s1 = s1_scale.reshape(*s1_scale.shape[:lead], 1, N)
    sz = s1_szero.reshape(*s1_szero.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w4a8_chn_kernel, nk=nk, bk2=bk2, k_half=K2,
                          lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n, k: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [pltpu.VMEM((bm, bn), jnp.int32)],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + nb * (K * N // 2) + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight_packed, s1, sz,
         a_scale.reshape(M, 1), a_sum.reshape(M, 1)),
        block_idx, per_block=True,
    )


@register_pallas("w4a8_gemm_per_chn_routed")
def _w4a8_chn_routed_dispatch(a_i8, a_scale, a_sum, qw, s1, sz, block_idx,
                              out_dtype):
    return w4a8_gemm_per_chn_routed_pallas(
        a_i8, a_scale, a_sum, qw, s1, sz, block_idx, out_dtype
    )


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w8a8_gemm_routed_pallas(a_i8, a_scale, qweight, w_scale, block_idx,
                            out_dtype=jnp.bfloat16):
    M, K = a_i8.shape
    N = qweight.shape[-1]
    nb, lead = block_idx.shape
    assert lead == qweight.ndim - 2
    assert M % nb == 0
    bm = M // nb
    bn = _pick_bn(N)
    bk = _pick_bk2(K, bn)
    nk = K // bk
    grid = (nb, N // bn, nk)
    lead1 = (1,) * lead
    ix, ix_plain = _ix_maps(block_idx, lead, per_block=True)

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (bk, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    ws = w_scale.reshape(*w_scale.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w8a8_kernel, nk=nk, bk=bk, lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n, k: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [pltpu.VMEM((bm, bn), jnp.int32)],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + nb * K * N + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight, ws, a_scale.reshape(M, 1)),
        block_idx, per_block=True,
    )


@register_pallas("w8a8_gemm_routed")
def _w8a8_routed_dispatch(a_i8, a_scale, qw, ws, block_idx, out_dtype):
    return w8a8_gemm_routed_pallas(a_i8, a_scale, qw, ws, block_idx, out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def w4a8_gemm_per_group_routed_pallas(
    a_i8, a_scale, qweight_packed, s2_scale, s2_zero, s1_scale, block_idx,
    group_size=128, out_dtype=jnp.bfloat16,
):
    """Grouped (per-M-block expert) two-level W4A8 GEMM."""
    M, K = a_i8.shape
    N = qweight_packed.shape[-1]
    nb, lead = block_idx.shape
    assert lead == qweight_packed.ndim - 2
    assert M % nb == 0
    bm = M // nb
    K2 = K // 2
    G = K // group_size
    assert K2 % group_size == 0
    bn = _pick_bn(N)
    bk2 = _pick_bk2(K2, bn, multiple=8 * group_size)
    nk = K2 // bk2
    gpb = bk2 // group_size
    grid = (nb, N // bn, nk)
    lead1 = (1,) * lead
    ix, ix_plain = _ix_maps(block_idx, lead, per_block=True)

    gsum = jnp.sum(
        a_i8.astype(jnp.int32).reshape(M, G, group_size), axis=2
    )  # [M, G]
    # full-lane gsum tiles per k block (see w4a8_gemm_per_group_pallas)
    gsum3 = gsum.reshape(M, 2 * nk, gpb).transpose(1, 0, 2)

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (bk2, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (nk + k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (gpb, bn), ix(lambda m, n, k: (nk + k, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, gpb), ix_plain(lambda m, n, k: (k, m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm, gpb), ix_plain(lambda m, n, k: (nk + k, m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n, k: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n, k: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    s1 = s1_scale.reshape(*s1_scale.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w4a8_grp_kernel, nk=nk, bk2=bk2, k_half=K2,
                          group=group_size, lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n, k: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [pltpu.VMEM((bm, bn), jnp.int32), pltpu.VMEM((bm, bn), jnp.float32)],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + nb * (K * N // 2) + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight_packed, s2_scale, s2_zero, s2_scale, s2_zero,
         gsum3, gsum3, s1, a_scale.reshape(M, 1)),
        block_idx, per_block=True,
    )


@functools.partial(jax.jit, static_argnames=("group_size", "out_dtype"))
def w4a8_gemm_per_group_whole_routed_pallas(
    a_i8, a_scale, qweight_packed, s2_scale, s2_zero, s1_scale, block_idx,
    group_size=128, out_dtype=jnp.bfloat16,
):
    """Ragged-K grouped (per-M-block expert) two-level W4A8 GEMM.

    The routed analog of w4a8_gemm_per_group_whole_pallas: for K where K2
    has no multiple-of-8-groups divisor (K=11008 -> 43 groups/plane), the
    scale/zero/gsum operands arrive as FULL-row blocks and each (m, n) grid
    step streams the whole [K2, bn] weight strip of block m's expert.
    Closes the last routed-MoE XLA bail-out (reference bar:
    kernels/csrc/qgemm/w4a8_per_group/gemm_cuda.cu:271-326 — the reference
    has no grouped per-group GEMM at all, mixtral_w4a8_unpad.py:288)."""
    M, K = a_i8.shape
    N = qweight_packed.shape[-1]
    nb, lead = block_idx.shape
    assert lead == qweight_packed.ndim - 2
    assert M % nb == 0
    bm = M // nb
    K2 = K // 2
    assert K2 % group_size == 0
    gpp = K2 // group_size  # groups per nibble plane
    bn = _pick_bn(N)
    grid = (nb, N // bn)
    lead1 = (1,) * lead

    def ix(t_map):
        def f(m, n, *refs):
            return tuple(refs[0][m, i] for i in range(lead)) + t_map(m, n)

        return f

    def ix_plain(t_map):
        def f(m, n, *refs):
            return t_map(m, n)

        return f

    # per-group activation row-sums (both planes), int32 [M, 2*gpp]
    gsum = jnp.sum(
        a_i8.astype(jnp.int32).reshape(M, 2 * gpp, group_size), axis=2
    )

    in_specs = [
        pl.BlockSpec((bm, K), ix_plain(lambda m, n: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (K2, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (2 * gpp, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (2 * gpp, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 2 * gpp), ix_plain(lambda m, n: (m, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(lead1 + (1, bn), ix(lambda m, n: (0, n)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), ix_plain(lambda m, n: (m, 0)),
                     memory_space=pltpu.VMEM),
    ]
    s1 = s1_scale.reshape(*s1_scale.shape[:lead], 1, N)
    return _maybe_stacked_call(
        functools.partial(_w4a8_grp_whole_kernel, gpp=gpp, group=group_size,
                          k_half=K2, lead=lead),
        grid, in_specs,
        pl.BlockSpec((bm, bn), ix_plain(lambda m, n: (m, n)),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((M, N), out_dtype),
        [],
        pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + nb * (K * N // 2) + M * N * 2,
            transcendentals=0,
        ),
        (a_i8, qweight_packed, s2_scale, s2_zero, gsum, s1,
         a_scale.reshape(M, 1)),
        block_idx, per_block=True,
    )


@register_pallas("w4a8_gemm_per_group_routed")
def _w4a8_grp_routed_dispatch(a_i8, a_scale, qw, s2s, s2z, s1, block_idx,
                              group_size, out_dtype):
    K2 = a_i8.shape[1] // 2
    if K2 % (8 * group_size) != 0:
        if K2 % group_size != 0:
            return None  # K not group-divisible at all -> XLA routed fallback
        # ragged group counts (K=11008 -> 43 groups/plane): whole-K-strip
        # routed kernel (was an XLA bail-out through round 4)
        return w4a8_gemm_per_group_whole_routed_pallas(
            a_i8, a_scale, qw, s2s, s2z, s1, block_idx, group_size, out_dtype
        )
    return w4a8_gemm_per_group_routed_pallas(
        a_i8, a_scale, qw, s2s, s2z, s1, block_idx, group_size, out_dtype
    )
