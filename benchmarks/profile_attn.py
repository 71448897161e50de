"""Time paged attention, KV append, and elementwise ops at decode shapes.

NOTE: single-op timings through the axon tunnel are noisy; trust bench.py's
chained-step numbers for decisions and use this only for rough attribution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.microbench import timed_loop

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
L = 32
E, I_, V = 4096, 14336, 128256
Hq, Hkv, D = 32, 8, 128
PS = 256
maxP = -(-CTX // PS)


def report(name, t, mult=L, bytes_=None):
    extra = f"  {bytes_/t/1e9:7.0f} GB/s" if bytes_ else ""
    print(f"{name:<30} {t*1e3:8.3f} ms/call x{mult:<3} = "
          f"{t*1e3*mult:8.2f} ms/step{extra}", flush=True)


def main():
    from qserve_tpu.kernels import attention, kv_cache as kvc, ops

    key = jax.random.PRNGKey(0)

    cache = kvc.create_kv_cache(L, B * maxP, Hkv, PS, D, 4)
    cache = kvc.KVCache(
        data=jax.random.randint(key, cache.data.shape, -128, 127, jnp.int8),
        scales=jnp.abs(jax.random.normal(key, cache.scales.shape)) * 0.05,
    )
    bt = jnp.asarray(np.arange(B * maxP, dtype=np.int32).reshape(B, maxP))
    ctx_lens = jnp.full((B,), CTX, jnp.int32)
    q = jax.random.normal(key, (B, Hq, D), jnp.bfloat16)
    k_cur = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, D),
                              jnp.bfloat16)
    v_cur = jax.random.normal(jax.random.fold_in(key, 2), (B, Hkv, D),
                              jnp.bfloat16)
    kv_bytes = B * maxP * (2 * PS * Hkv * D // 2 + 2 * 2 * Hkv * PS * 4)
    t = timed_loop(
        lambda q_: attention.paged_decode_attention(
            q_, cache, bt, ctx_lens, jnp.int32(0), k_cur, v_cur, 4
        ), q, reps=16)
    report(f"paged_attn ctx={CTX}", t, bytes_=kv_bytes)

    kn = jax.random.normal(key, (L, B, Hkv, D), jnp.bfloat16)
    pages = jnp.asarray(np.arange(B, dtype=np.int32))
    slots = jnp.full((B,), 7, jnp.int32)
    t = timed_loop(
        lambda k_: kvc.append_all_layers(
            cache, k_, kn, pages, slots, 4, True, unique_pages=True
        ).data,
        kn, reps=8)
    report("kv_append (all layers)", t, mult=1)

    h = jax.random.normal(key, (B, E), jnp.bfloat16)
    wln = jnp.ones((E,), jnp.float32)
    t = timed_loop(lambda h_: ops.rmsnorm_quant(h_, wln, 1e-6, True)[0], h)
    report("rmsnorm_quant", t, mult=2 * L)
    gu = jax.random.normal(key, (B, 2 * I_), jnp.bfloat16)
    t = timed_loop(lambda g_: ops.silu_mul_quant(g_, True)[0], gu)
    report("silu_mul_quant", t)

    x = jax.random.normal(key, (B, E), jnp.bfloat16)
    wl = jax.random.normal(key, (E, V), jnp.bfloat16) * 0.05
    t = timed_loop(lambda a_: jnp.argmax(ops.matmul(a_, wl, jnp.float32), -1),
                   x, reps=8)
    report("lm_head+argmax", t, mult=1, bytes_=E * V * 2)


if __name__ == "__main__":
    main()
