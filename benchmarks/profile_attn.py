"""Time paged attention, KV append, and elementwise ops at decode shapes."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.microbench import timed_loop

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
L = 32
E, I_, V = 4096, 14336, 128256
Hq, Hkv, D = 32, 8, 128
PS = 128
maxP = -(-CTX // PS)


def report(name, t, mult=L, bytes_=None):
    extra = f"  {bytes_/t/1e9:7.0f} GB/s" if bytes_ else ""
    print(f"{name:<30} {t*1e3:8.3f} ms/call x{mult:<3} = "
          f"{t*1e3*mult:8.2f} ms/step{extra}", flush=True)


def main():
    from qserve_tpu.kernels import attention, kv_cache as kvc, ops

    key = jax.random.PRNGKey(0)

    layer = kvc.create_kv_cache(1, B * maxP, Hkv, PS, D, 4).layer(0)
    layer = kvc.KVCache(
        data=jax.random.randint(key, layer.data.shape, -128, 127, jnp.int8),
        scales=jnp.abs(jax.random.normal(key, layer.scales.shape)) * 0.05,
    )
    bt = jnp.asarray(np.arange(B * maxP, dtype=np.int32).reshape(B, maxP))
    ctx_lens = jnp.full((B,), CTX, jnp.int32)
    q = jax.random.normal(key, (B, Hq, D), jnp.bfloat16)
    kv_bytes = B * maxP * (2 * (PS // 2) * Hkv * D + 2 * 2 * Hkv * PS * 4)
    t = timed_loop(
        lambda q_: attention.paged_decode_attention(q_, layer, bt, ctx_lens, 4), q,
        reps=16)
    report(f"paged_attn ctx={CTX}", t, bytes_=kv_bytes)

    kn = jax.random.normal(key, (B, Hkv, D), jnp.bfloat16)
    pages = jnp.asarray(np.arange(B, dtype=np.int32))
    slots = jnp.full((B,), 7, jnp.int32)
    t = timed_loop(
        lambda k_: kvc.append_layer(layer, k_, kn, pages, slots, 4, True).data,
        kn, reps=16)
    report("kv_append", t)

    h = jax.random.normal(key, (B, E), jnp.bfloat16)
    wln = jnp.ones((E,), jnp.float32)
    t = timed_loop(lambda h_: ops.rmsnorm_quant(h_, wln, 1e-6, True)[0], h)
    report("rmsnorm_quant", t, mult=2 * L)
    gu = jax.random.normal(key, (B, 2 * I_), jnp.bfloat16)
    t = timed_loop(lambda g_: ops.silu_mul_quant(g_, True)[0], gu)
    report("silu_mul_quant", t)
    at = jax.random.normal(key, (B, Hq * D), jnp.bfloat16)
    t = timed_loop(lambda a_: ops.quant_per_token(a_, True)[0], at)
    report("quant_per_token", t)

    x = jax.random.normal(key, (B, E), jnp.bfloat16)
    wl = jax.random.normal(key, (E, V), jnp.bfloat16) * 0.05
    t = timed_loop(lambda a_: jnp.argmax(ops.matmul(a_, wl, jnp.float32), -1), x,
                   reps=8)
    report("lm_head+argmax", t, mult=1, bytes_=E * V * 2)


if __name__ == "__main__":
    main()
