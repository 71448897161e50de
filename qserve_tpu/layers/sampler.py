"""Batched token sampling, fully inside jit.

Improves on the reference Sampler (modeling/layers/sampler.py:47-93), which is
constructed once per model with *fixed* SamplingParams: here temperature /
top-k / top-p are per-request vectors so heterogeneous requests batch together.

TPU cost model: a full [B, V] sort at V=128K is hundreds of bitonic passes —
milliseconds per decode step, paid even by greedy batches (jnp.where computes
both branches). sample() therefore works on the top-C=256 candidates from ONE
lax.top_k pass, which is mathematically EXACT whenever the kept set closes
inside C (top_k <= C, or the top-C nucleus mass already reaches top_p — true
for every real serving distribution). The rare heavy-tail remainder falls
back to the full-sort reference path under a lax.cond, so worst case equals
the old cost and semantics are preserved bit-for-bit in distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30
TOPC = 256  # candidate window; kept sets close inside it in practice


def _sample_full_sort(scaled, top_p, top_k, key):
    """Reference path: exact for any (top_k, top_p) via two full sorts."""
    B, V = scaled.shape
    sorted_l = jnp.sort(scaled, axis=-1)[:, ::-1]
    k = jnp.where(top_k <= 0, V, top_k)
    k = jnp.clip(k, 1, V)
    kth = jnp.take_along_axis(sorted_l, (k - 1)[:, None], axis=-1)  # [B,1]
    masked = jnp.where(scaled >= kth, scaled, NEG_INF)

    sorted_m = jnp.sort(masked, axis=-1)[:, ::-1]
    probs_sorted = jax.nn.softmax(sorted_m, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    cutoff_mask = (cum - probs_sorted) < top_p[:, None]
    thresh = jnp.min(
        jnp.where(cutoff_mask, sorted_m, jnp.inf), axis=-1, keepdims=True
    )
    masked = jnp.where(masked >= thresh, masked, NEG_INF)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)


def sample(
    logits: jax.Array,  # [B, V] f32/bf16
    temperature: jax.Array,  # [B] f32; 0 => greedy
    top_p: jax.Array,  # [B] f32 in (0, 1]
    top_k: jax.Array,  # [B] int32; 0 or >=V => disabled
    key: jax.Array,
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if V <= 1:
        return greedy_ids

    def all_greedy(_):
        return greedy_ids

    def mixed(_):
        return _sample_stochastic(
            logits, greedy_ids, temperature, top_p, top_k, key
        )

    # all-greedy batches (offline serving / benchmarking) skip the whole
    # sampling computation — jnp.where alone would still evaluate it
    return jax.lax.cond(
        jnp.all(temperature <= 0.0), all_greedy, mixed, operand=None
    )


def _sample_stochastic(logits, greedy_ids, temperature, top_p, top_k, key):
    B, V = logits.shape
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    C = min(TOPC, V)
    vals, idxs = jax.lax.top_k(scaled, C)  # [B, C] descending
    lse_full = jax.nn.logsumexp(scaled, axis=-1, keepdims=True)

    k_eff = jnp.where(top_k <= 0, V, jnp.clip(top_k, 1, V))  # [B]
    k_in_c = k_eff <= C
    ranks = jnp.arange(C, dtype=jnp.int32)[None, :]
    vals_k = jnp.where(ranks < jnp.minimum(k_eff, C)[:, None], vals, NEG_INF)
    # log-normalizer of the k-masked distribution: exact when the kept set
    # lies inside C; otherwise the mask keeps everything -> full-vocab lse
    lse_k = jnp.where(
        k_in_c[:, None],
        jax.nn.logsumexp(vals_k, axis=-1, keepdims=True),
        lse_full,
    )
    probs_k = jnp.exp(vals_k - lse_k)  # [B, C], desc order
    cum = jnp.cumsum(probs_k, axis=-1)
    cutoff = (cum - probs_k) < top_p[:, None]
    thresh = jnp.min(
        jnp.where(cutoff, vals_k, jnp.inf), axis=-1, keepdims=True
    )
    final_c = jnp.where(vals_k >= thresh, vals_k, NEG_INF)
    choice = jax.random.categorical(key, final_c, axis=-1)
    fast_ids = jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]

    # raw temperature sampling (both filters disabled): no candidate window
    # needed — one categorical over the full row, still sort-free
    p_off = top_p >= 1.0
    raw_ids = jax.random.categorical(
        jax.random.fold_in(key, 1), scaled, axis=-1
    ).astype(jnp.int32)

    # per-row exactness of the fast path: kept set closed inside C, either
    # because top-k did (k_in_c) or because top-k is DISABLED and the top-C
    # nucleus mass reached top_p before the window ended. (With C < k < V
    # the nucleus renormalizes over the unknowable top-k mass -> slow path.)
    nucleus_closed = cum[:, -1] >= top_p
    row_fast = k_in_c | ((k_eff >= V) & nucleus_closed)
    row_raw = (k_eff >= V) & p_off
    # greedy rows discard the sampled value — never let them force the
    # slow branch
    covered = row_fast | row_raw | (temperature <= 0.0)

    def fast(_):
        return jnp.where(row_raw, raw_ids, fast_ids.astype(jnp.int32))

    def slow(_):
        exact = _sample_full_sort(scaled, top_p, top_k, key)
        out = jnp.where(row_raw, raw_ids, fast_ids.astype(jnp.int32))
        return jnp.where(covered, out, exact)

    sampled = jax.lax.cond(jnp.all(covered), fast, slow, operand=None)
    return jnp.where(temperature <= 0.0, greedy_ids, sampled)
