"""Rotary position embeddings (GPT-NeoX style, as used by Llama).

Reference applies RoPE inside the fused CUDA kernels
(applyBiasRopeUpdateKVCache.h:242-269 for prefill, MMHA for decode); here it
is a plain XLA elementwise op — cheap, and XLA fuses it into neighbors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("head_dim", "theta"))
def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float = 10000.0):
    """positions [T] int32 -> (cos, sin) each [T, head_dim//2] f32."""
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [T, H, D]; cos/sin [T, D//2]. NeoX rotate-half convention."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, None, :].astype(jnp.float32)
    s = sin[:, None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([x1f * c - x2f * s, x2f * c + x1f * s], axis=-1)
    return out.astype(x.dtype)
