"""Same-process A/B of two quant flavors (per-chn W4A8 vs g128 vs W8A8).

Cross-process bench.py comparisons confound flavor deltas with tunnel clock
phases (measured ~10% drift between runs); here BOTH flavors' params live on
the chip at once, share one KV cache, and their chained decode steps
interleave round-robin, so the ratio is phase-free.

Usage: python benchmarks/flavor_ab.py [B] [CTX] [flavorA] [flavorB]
Flavors: perchn | g128 | w8a8  (default perchn g128)
Memory: two 8B param sets + the B-seq KV4 cache; B defaults to 96 so the
pair fits a 16GB v5e.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 96
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
FLAVORS = sys.argv[3:] or ["perchn", "g128"]
PAGE = 256

_SPEC = {
    "perchn": ("w4a8kv4", -1),
    "g128": ("w4a8kv4", 128),
    "w8a8": ("w8a8kv8", -1),
}


def main():
    from qserve_tpu.config import QuantSpec
    from qserve_tpu.kernels import kv_cache as kvc
    from qserve_tpu.models import llama

    e = os.environ.get

    def make_args(flavor):
        prec, gs = _SPEC[flavor]
        return llama.LlamaArgs(
            vocab_size=int(e("QSERVE_ABL_VOCAB", 128256)),
            hidden_size=int(e("QSERVE_ABL_HIDDEN", 4096)),
            intermediate_size=int(e("QSERVE_ABL_INTER", 14336)),
            num_layers=int(e("QSERVE_ABL_LAYERS", 32)),
            num_heads=int(e("QSERVE_ABL_HEADS", 32)),
            num_kv_heads=int(e("QSERVE_ABL_KVHEADS", 8)),
            head_dim=128,
            rope_theta=500000.0,
            quant=QuantSpec.from_precision(prec, gs),
        )

    argset = {f: make_args(f) for f in FLAVORS}
    kv_bits = {argset[f].quant.kv_bits for f in FLAVORS}
    assert len(kv_bits) == 1, "flavors must share kv precision (one cache)"

    params = {
        f: llama.random_quantized_params(jax.random.PRNGKey(0), a)
        for f, a in argset.items()
    }
    jax.block_until_ready([params[f].layers for f in FLAVORS])

    maxP = -(-(CTX + 64) // PAGE)
    a0 = argset[FLAVORS[0]]
    kv = kvc.create_kv_cache(a0.num_layers, B * maxP + 8, a0.num_kv_heads,
                             PAGE, a0.head_dim, a0.quant.kv_bits)
    bt = jnp.asarray(np.arange(B * maxP, dtype=np.int32).reshape(B, maxP))
    tok0 = jnp.arange(B, dtype=jnp.int32) % a0.vocab_size

    def mk(flavor):
        args = argset[flavor]

        def step(p, kv, tok, bt, ctx):
            logits, kv = llama.decode(p, kv, tok, bt, ctx, args)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv

        return jax.jit(step, donate_argnames=("kv",))

    steps = {f: mk(f) for f in FLAVORS}

    def chain(flavor, n, tok):
        nonlocal kv
        t0 = time.time()
        for i in range(n):
            tok, kv = steps[flavor](params[flavor], kv, tok, bt,
                                    jnp.full((B,), CTX + i, jnp.int32))
        np.asarray(tok)
        return time.time() - t0

    rounds = int(e("QSERVE_ABL_ROUNDS", 3))
    for f in FLAVORS:
        chain(f, 3, tok0)  # compile + warm
    times = {f: [] for f in FLAVORS}
    for _ in range(rounds):
        for f in FLAVORS:
            t_s = chain(f, 4, tok0)
            t_l = chain(f, 16, tok0)
            times[f].append((t_l - t_s) / 12)
    med = {}
    for f in FLAVORS:
        dts = sorted(times[f])
        med[f] = dts[len(dts) // 2]
        print(f"{f:<8} step = {med[f]*1e3:7.2f} ms "
              f"[{min(dts)*1e3:.2f}..{max(dts)*1e3:.2f}]  "
              f"{B/med[f]:,.0f} tok/s", flush=True)
    if len(FLAVORS) == 2:
        a, b = FLAVORS
        print(f"ratio {b}/{a} = {med[a]/med[b]:.3f}x throughput "
              f"(+{(med[b]-med[a])*1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
