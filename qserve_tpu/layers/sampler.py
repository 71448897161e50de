"""Batched token sampling, fully inside jit.

Improves on the reference Sampler (modeling/layers/sampler.py:47-93), which is
constructed once per model with *fixed* SamplingParams: here temperature /
top-k / top-p are per-request vectors so heterogeneous requests batch together.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


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

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp

    # top-k: rank mask via per-row sort (descending).
    sorted_l = jnp.sort(scaled, axis=-1)[:, ::-1]
    k = jnp.where(top_k <= 0, V, top_k)
    k = jnp.clip(k, 1, V)
    kth = jnp.take_along_axis(sorted_l, (k - 1)[:, None], axis=-1)  # [B,1]
    masked = jnp.where(scaled >= kth, scaled, NEG_INF)

    # top-p (nucleus) on the k-masked distribution.
    sorted_m = jnp.sort(masked, axis=-1)[:, ::-1]
    probs_sorted = jax.nn.softmax(sorted_m, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    # keep tokens while cumulative prob (exclusive) < top_p
    cutoff_mask = (cum - probs_sorted) < top_p[:, None]
    # threshold = smallest logit still kept
    thresh = jnp.min(
        jnp.where(cutoff_mask, sorted_m, jnp.inf), axis=-1, keepdims=True
    )
    masked = jnp.where(masked >= thresh, masked, NEG_INF)

    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy_ids, sampled)
