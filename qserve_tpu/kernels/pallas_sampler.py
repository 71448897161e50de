"""Pallas TPU kernel for filtered (top-k / top-p) token sampling.

Replaces the XLA streaming-bisection slow path in layers/sampler.py (the
reference Sampler applies HF top-k/top-p warpers then multinomial,
modeling/layers/sampler.py:47-93).  The XLA path is HBM-bound: each of the
14 bisection passes re-streams the [B, V] logits (+ probs) from HBM —
measured ~3 ms/step at [128, 128256] on v5e.  Here each kernel instance
loads its block of rows into VMEM ONCE and runs the entire search locally:

  * logit values are mapped to monotone int32 keys (sign-flip trick) so
    the threshold bisection runs on INTEGER keys — 32 halvings converge to
    adjacent representable floats, making the kept sets exact (the XLA
    path needs 14 x 8-ary float passes to get "past f32 resolution");
  * top-k   = counting bisection  f(t) = #{key > t}            >= k
  * top-p   = weighted bisection  f(t) = sum probs[key > t]    >= p
    (probs from an in-VMEM softmax over the top-k-masked row; the
    keep-while-strictly-greater-mass < p rule and tie handling match
    layers/sampler.threshold_mask exactly);
  * the draw is a Gumbel-argmax over the masked row using the on-core
    PRNG (pltpu.prng_random_bits) — no [B, V] uniform tensor ever
    touches HBM.

Total HBM traffic: one read of the logits + a [B] token write.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qserve_tpu.kernels.ops import interpret_mode, register_pallas

NEG_INF = -1e30  # matches layers/sampler.NEG_INF
_ROWS = 8  # rows per kernel instance ([8, 128256] f32 block = 4.1 MB)


def _bc(x, dtype, interpret):
    """Same-width bitcast (pltpu.bitcast has no CPU interpret lowering)."""
    if interpret:
        return jax.lax.bitcast_convert_type(x, dtype)
    return pltpu.bitcast(x, dtype)


def _keys_of(x, interpret):
    """Monotone f32 -> int32 key map (order-preserving for all finite x):
    non-negative floats keep their bit pattern, negative floats get their
    low 31 bits flipped (reversing the within-negatives order while staying
    below every non-negative key). Adjacent int32 keys are adjacent
    representable floats, so integer bisection terminates on exact value
    boundaries. Mosaic can reduce/compare int32 (not uint32), so the KEYS
    stay signed; only the bisection interval arithmetic runs in uint32
    (see _bisect_keys) because the key span can exceed int32 range."""
    bits = _bc(x, jnp.int32, interpret)
    return jnp.where(bits >= 0, bits, bits ^ jnp.int32(0x7FFFFFFF))


def _bisect_keys(lo_s, hi_s, f_of_mid, target, interpret):
    """Largest int32 key t in [lo_s, hi_s) with f(t) >= target (per row).

    Interval endpoints are carried as uint32 (key ^ top-bit is a monotone
    bijection onto unsigned order) so `hi - lo` never overflows; each probe
    converts back to the signed key for the [R, V] comparison inside
    f_of_mid. Invariant-free start: if f(lo) < target already, every probe
    fails and lo is returned unchanged (the keep-all answer), matching the
    XLA bisection's fallback semantics."""

    top = jnp.uint32(0x80000000)

    def to_u(s):
        return _bc(s, jnp.uint32, interpret) ^ top

    def to_s(u):
        return _bc(u ^ top, jnp.int32, interpret)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + jax.lax.shift_right_logical(
            hi - lo, jnp.uint32(1)
        )  # in [lo, hi)
        f = f_of_mid(to_s(mid))
        ge = f >= target
        lo = jnp.where(ge, mid, lo)
        hi = jnp.where(ge, hi, mid)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, 32, body, (to_u(lo_s), to_u(hi_s)))
    return to_s(lo)


def _sample_kernel(seed_ref, x_ref, keff_ref, p_ref, *rest,
                   do_topk: bool, do_topp: bool, use_prng: bool):
    # use_prng: on-core PRNG (TPU). Otherwise a caller-supplied Gumbel
    # noise operand stands in (pltpu.prng_* has no CPU interpret lowering).
    if use_prng:
        (out_ref,) = rest
        gum_ref = None
    else:
        gum_ref, out_ref = rest
    interpret = not use_prng
    x = x_ref[:].astype(jnp.float32)  # [R, V] scaled logits
    R, V = x.shape
    keys = _keys_of(x, interpret)
    rowmax_k = jnp.max(keys, axis=-1, keepdims=True)
    rowmin_k = jnp.min(keys, axis=-1, keepdims=True)

    if do_topk:
        # kept = the k largest plus ties of the k-th (reference
        # `scaled >= kth`): the bisection lands at lo = key(kth) - 1
        def count_gt(mid):
            return jnp.sum((keys > mid).astype(jnp.float32), axis=-1,
                           keepdims=True)

        lo_k = _bisect_keys(rowmin_k - 1, rowmax_k, count_gt,
                            keff_ref[:], interpret)
        mask1 = keys > lo_k
    else:
        mask1 = jnp.ones((R, V), dtype=jnp.bool_)

    masked = jnp.where(mask1, x, jnp.float32(NEG_INF))

    if do_topp:
        # softmax over the kept set (excluded rows exp to exactly 0), then
        # keep x while mass(strictly greater than x) < top_p
        rowmax = jnp.max(masked, axis=-1, keepdims=True)
        ex = jnp.exp(masked - rowmax)
        lse = rowmax + jnp.log(jnp.sum(ex, axis=-1, keepdims=True))
        probs = jnp.exp(masked - lse)

        def mass_gt(mid):
            return jnp.sum(jnp.where(keys > mid, probs, 0.0), axis=-1,
                           keepdims=True)

        kept_min_k = jnp.min(
            jnp.where(mask1, keys, jnp.int32(0x7FFFFFFF)),
            axis=-1, keepdims=True,
        )
        lo_p = _bisect_keys(kept_min_k - 1, rowmax_k, mass_gt,
                            p_ref[:], interpret)
        final = mask1 & (keys > lo_p)
        masked = jnp.where(final, x, jnp.float32(NEG_INF))

    # Gumbel-argmax draw over the masked row, PRNG on-core
    if use_prng:
        # Mosaic's prng_set_seed_32 accepts at most 2 values: mix the
        # grid position into the second word (odd-constant multiply keeps
        # distinct program ids on distinct streams).
        mixed = seed_ref[1] ^ (pl.program_id(0) * jnp.int32(-1640531527))
        pltpu.prng_seed(seed_ref[0], mixed)
        rb = pltpu.bitcast(pltpu.prng_random_bits((R, V)), jnp.uint32)
        # 23 high bits -> u in [2^-24, 1): the double log stays finite.
        # Mosaic has no uint32->f32 cast: the shifted value fits int32,
        # so bitcast to signed first.
        ri = pltpu.bitcast(rb >> jnp.uint32(9), jnp.int32)
        u = ri.astype(jnp.float32) * (1.0 / (1 << 23))
        u = u + jnp.float32(1.0 / (1 << 24))
        g = -jnp.log(-jnp.log(u))
    else:
        g = gum_ref[:]
    y = masked + g
    best = jnp.max(y, axis=-1, keepdims=True)
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, V), 1)
    winner = jnp.min(jnp.where(y == best, idx, jnp.int32(V)), axis=-1,
                     keepdims=True)
    out_ref[:] = winner


@functools.partial(jax.jit, static_argnames=("do_topk", "do_topp"))
def _sample_call(scaled, keff, p_target, seeds, gumbel, do_topk, do_topp):
    B, V = scaled.shape
    grid = (B // _ROWS,)
    use_prng = gumbel is None
    kernel = functools.partial(_sample_kernel, do_topk=do_topk,
                               do_topp=do_topp, use_prng=use_prng)
    row_spec = pl.BlockSpec((_ROWS, V), lambda m: (m, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        row_spec,
        pl.BlockSpec((_ROWS, 1), lambda m: (m, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_ROWS, 1), lambda m: (m, 0), memory_space=pltpu.VMEM),
    ]
    operands = [seeds, scaled, keff, p_target]
    if not use_prng:
        in_specs.append(row_spec)
        operands.append(gumbel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_ROWS, 1), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        interpret=interpret_mode(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # PRNG seeding is stateful
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*operands)
    return out[:, 0]


@register_pallas("sample_filtered")
def _sample_filtered_dispatch(scaled, top_p, top_k, key):
    """tokens [B] i32 sampled from the exact top-k/top-p kept sets, or None
    if the shape doesn't fit the kernel (caller falls back to XLA)."""
    B, V = scaled.shape
    if B % _ROWS != 0 or V % 128 != 0 or V < 256:
        return None

    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    else:
        kd = key
    seeds = jax.lax.bitcast_convert_type(
        kd.reshape(-1)[:2].astype(jnp.uint32), jnp.int32
    )

    k_eff = jnp.where(top_k <= 0, V, jnp.clip(top_k, 1, V))
    keff_f = k_eff.astype(jnp.float32)[:, None]
    p_target = jnp.maximum(top_p, 1e-9)[:, None]
    scaled = scaled.astype(jnp.float32)

    # pltpu.prng_* has no CPU interpret lowering: interpret-mode tests get
    # real Gumbel noise from the host PRNG instead (same downstream math)
    gumbel = jax.random.gumbel(key, (B, V), jnp.float32) \
        if interpret_mode() else None

    def call(do_topk, do_topp):
        return lambda _: _sample_call(
            scaled, keff_f, p_target, seeds, gumbel, do_topk, do_topp
        )

    # mirror threshold_mask's cond gating: skip a bisection entirely when
    # no row in the batch uses that filter
    return jax.lax.cond(
        jnp.any(k_eff < V),
        lambda _: jax.lax.cond(
            jnp.any(top_p < 1.0), call(True, True), call(True, False),
            operand=None,
        ),
        call(False, True),  # filters active but no top-k -> top-p only
        operand=None,
    )
