"""Per-component timing at the Llama-3-8B decode shapes (batch B).

Breaks a decode step into its hot ops and times each on-device with the
microbench rolling-loop trick, to attribute the step latency measured by
bench.py. Usage: python benchmarks/profile_decode.py [B] [ctx]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.microbench import timed_loop, HBM_GBPS

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
L = 32

E, I_, V = 4096, 14336, 128256
Hq, Hkv, D = 32, 8, 128
PS = 128
maxP = -(-CTX // PS)


def report(name, t, per_layer=True, bytes_=None):
    layers = L if per_layer else 1
    extra = ""
    if bytes_:
        extra = f"  {bytes_/t/1e9:7.0f} GB/s"
    print(f"{name:<28} {t*1e3:8.3f} ms/call  x{layers:<3} = "
          f"{t*1e3*layers:8.2f} ms/step{extra}")
    return t * layers


def main():
    from qserve_tpu.kernels import attention, kv_cache as kvc, ops
    from qserve_tpu.quant import packing, qoq

    key = jax.random.PRNGKey(0)
    total = 0.0

    # --- GEMMs (per-channel W4A8) ---
    for name, K, N in [("qkv (4096->6144)", E, (Hq + 2 * Hkv) * D),
                       ("o (4096->4096)", E, E),
                       ("gate_up (4096->28672)", E, 2 * I_),
                       ("down (14336->4096)", I_, E)]:
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 2**31))
        x = jax.random.normal(kx, (B, K), jnp.float32)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
        p = qoq.quantize_weight_per_channel(w)
        packed = jax.device_put(packing.pack_w4(p.qweight))
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
        t = timed_loop(
            lambda a_: ops.w4a8_gemm_per_chn(a_, ascale, asum, packed,
                                             p.s1_scale, p.s1_szero), a)
        total += report(f"gemm {name}", t, bytes_=K * N // 2)

    # --- lm_head (bf16, once) ---
    x = jax.random.normal(key, (B, E), jnp.bfloat16)
    wl = jax.random.normal(key, (E, V), jnp.bfloat16) * 0.05
    t = timed_loop(lambda a_: ops.matmul(a_, wl, jnp.float32), x)
    total += report("lm_head (4096->128256)", t, per_layer=False, bytes_=E * V * 2)

    # --- paged decode attention ---
    layer = kvc.create_kv_cache(1, B * maxP, Hkv, PS, D, 4).layer(0)
    # fill with random bytes so dequant work is realistic
    layer = kvc.KVCache(
        data=jax.random.randint(key, layer.data.shape, -128, 127, jnp.int8),
        scales=jnp.abs(jax.random.normal(key, layer.scales.shape)) * 0.05,
    )
    bt = jnp.asarray(np.arange(B * maxP, dtype=np.int32).reshape(B, maxP))
    ctx_lens = jnp.full((B,), CTX, jnp.int32)
    q = jax.random.normal(key, (B, Hq, D), jnp.bfloat16)
    kv_bytes = B * maxP * (2 * (PS // 2) * Hkv * D + 2 * 2 * Hkv * PS * 4)
    t = timed_loop(
        lambda q_: attention.paged_decode_attention(q_, layer, bt, ctx_lens, 4), q)
    total += report(f"paged_attn (ctx={CTX})", t, bytes_=kv_bytes)

    # --- KV append (quantize + scatter 1 token/seq) ---
    kn = jax.random.normal(key, (B, Hkv, D), jnp.bfloat16)
    pages = jnp.asarray(np.arange(B, dtype=np.int32))
    slots = jnp.full((B,), 7, jnp.int32)
    t = timed_loop(
        lambda k_: kvc.append_layer(layer, k_, kn, pages, slots, 4, True).data, kn)
    total += report("kv_append", t)

    # --- rmsnorm_quant + silu_quant + quant ---
    h = jax.random.normal(key, (B, E), jnp.bfloat16)
    wln = jnp.ones((E,), jnp.float32)
    t = timed_loop(lambda h_: ops.rmsnorm_quant(h_, wln, 1e-6, True)[0], h)
    total += report("rmsnorm_quant (x2)", t) * 1  # called twice per layer
    total += t * L  # second call
    gu = jax.random.normal(key, (B, 2 * I_), jnp.bfloat16)
    t = timed_loop(lambda g_: ops.silu_mul_quant(g_, True)[0], gu)
    total += report("silu_mul_quant", t)
    at = jax.random.normal(key, (B, Hq * D), jnp.bfloat16)
    t = timed_loop(lambda a_: ops.quant_per_token(a_, True)[0], at)
    total += report("quant_per_token (attn out)", t)

    print(f"\nattributed total: {total*1e3:.2f} ms/step "
          f"(weights {L*(E*6144/2 + E*E/2 + E*2*I_/2 + I_*E/2)/1e9:.2f} GB, "
          f"ideal {L*(E*6144/2 + E*E/2 + E*2*I_/2 + I_*E/2)/HBM_GBPS/1e6:.2f} ms)")


if __name__ == "__main__":
    main()
