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

    # content-free fills: random bits over 4GB int8 would materialize a
    # 4x-larger uint32 intermediate (OOM); a fused iota pattern does not
    @jax.jit
    def _fill():
        d = jax.lax.broadcasted_iota(jnp.int32, cache.data.shape, 4)
        s = jax.lax.broadcasted_iota(jnp.int32, cache.scales.shape, 4)
        return ((d * 37 + 11) % 251 - 125).astype(jnp.int8), (
            (s % 17).astype(jnp.float32) * 0.01 + 0.005
        ).astype(cache.scales.dtype)

    data, scales = _fill()
    cache = kvc.KVCache(data=data, scales=scales)
    bt = jnp.asarray(np.arange(B * maxP, dtype=np.int32).reshape(B, maxP))
    ctx_lens = jnp.full((B,), CTX, jnp.int32)
    q = jax.random.normal(key, (B, Hq, D), jnp.bfloat16)
    k_cur = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, D),
                              jnp.bfloat16)
    v_cur = jax.random.normal(jax.random.fold_in(key, 2), (B, Hkv, D),
                              jnp.bfloat16)
    sbytes = cache.scales.dtype.itemsize
    kv_bytes = B * maxP * (2 * PS * Hkv * D // 2 + 2 * 2 * Hkv * PS * sbytes)
    t = timed_loop(
        lambda q_, c_d, c_s: attention.paged_decode_attention(
            q_, kvc.KVCache(c_d, c_s), bt, ctx_lens, jnp.int32(0),
            k_cur, v_cur, 4
        ), q, reps=16, consts=(cache.data, cache.scales))
    report(f"paged_attn ctx={CTX}", t, bytes_=kv_bytes)

    kn = jax.random.normal(key, (L, B, Hkv, D), jnp.bfloat16)
    pages = jnp.asarray(np.arange(B, dtype=np.int32))
    slots = jnp.full((B,), 7, jnp.int32)
    t = timed_loop(
        lambda k_, c_d, c_s: kvc.append_all_layers(
            kvc.KVCache(c_d, c_s), k_, kn, pages, slots, 4, True,
            unique_pages=True
        ).data,
        kn, reps=8, consts=(cache.data, cache.scales))
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
