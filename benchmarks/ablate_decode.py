"""Ablate decode-step components to attribute step latency.

Uses bench.py's trustworthy chained-run differencing; monkeypatches one
component at a time to a no-op and reports the step-time delta.
Usage: python benchmarks/ablate_decode.py [B] [ctx] [variant...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
WHICH = sys.argv[3:] or ["full", "noattn", "noappend", "nogemm", "nohead", "skeleton"]
PAGE = 128
STEPS = 16


def main():
    from qserve_tpu.config import QuantSpec
    from qserve_tpu.kernels import attention, kv_cache as kvc
    from qserve_tpu.layers import linear as lin
    from qserve_tpu.models import llama

    args = llama.LlamaArgs(
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, quant=QuantSpec.from_precision("w4a8kv4", -1),
    )
    params = llama.random_quantized_params(jax.random.PRNGKey(0), args)
    maxP = -(-(CTX + STEPS * 3 + 8) // PAGE)
    num_pages = B * maxP + 8
    kv0 = kvc.create_kv_cache(args.num_layers, num_pages, args.num_kv_heads,
                              PAGE, args.head_dim, 4)
    bt = jnp.asarray(np.arange(B * maxP, dtype=np.int32).reshape(B, maxP))

    orig_attn = attention.paged_decode_attention
    orig_append = kvc.append_layer
    orig_apply = lin.apply_linear
    orig_lm = llama._lm_head

    def measure(name):
        import functools

        @functools.partial(jax.jit, donate_argnames=("kv",))
        def step(params, kv, tok, bt, ctx_lens):
            logits, kv = llama.decode(params, kv, tok, bt, ctx_lens, args)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv

        kv = jax.tree.map(lambda a: a.copy(), kv0)
        tok = jnp.zeros(B, jnp.int32)

        def chain(n, c0, tok, kv):
            t0 = time.time()
            for i in range(n):
                ctx_lens = jnp.full((B,), c0 + i, jnp.int32)
                tok, kv = step(params, kv, tok, bt, ctx_lens)
            np.asarray(tok)
            return time.time() - t0, tok, kv

        _, tok, kv = chain(3, CTX, tok, kv)  # compile+warm
        t1, tok, kv = chain(4, CTX + 3, tok, kv)
        t2, tok, kv = chain(4 + STEPS, CTX + 7, tok, kv)
        dt = max(t2 - t1, 1e-9) / STEPS
        print(f"{name:<12} {dt*1e3:8.2f} ms/step", flush=True)
        return dt

    results = {}
    for name in WHICH:
        attention.paged_decode_attention = orig_attn
        kvc.append_layer = orig_append
        lin.apply_linear = orig_apply
        llama._lm_head = orig_lm
        if name in ("noattn", "skeleton"):
            attention.paged_decode_attention = (
                lambda q, layer, bt_, cl, kb, sm=None: jnp.zeros_like(q)
            )
        if name in ("noappend", "skeleton"):
            kvc.append_layer = lambda layer, k, v, p, s, kb, zp: layer
        if name in ("nogemm", "skeleton"):
            def fake_apply(p, x, group_size=128, out_dtype=jnp.bfloat16):
                if isinstance(p, lin.W16Linear):
                    N = p.weight.shape[-1]
                    t = x
                else:
                    N = (p.qweight.shape[-1])
                    t = x.q
                return jnp.zeros((t.shape[0], N), out_dtype)
            lin.apply_linear = fake_apply
        if name in ("nohead", "skeleton"):
            llama._lm_head = lambda h, params, a: jnp.zeros(
                (h.shape[0], 128), jnp.float32)
        results[name] = measure(name)

    if "full" in results:
        for k, v in results.items():
            if k != "full":
                print(f"  {k}: saves {1e3*(results['full']-v):.2f} ms")


if __name__ == "__main__":
    main()
