"""Sampler-component microbench at the decode shape [B, V=128256].

Chained differencing (data-dependent chains, fetch once) — the only
reliable clock through the tunnel. Isolates: argmax, top_k(C), full sort,
logsumexp, categorical, the production sampler on peaked logits (fast
path) and near-uniform logits (slow path).

Usage: python benchmarks/microbench_sampler.py [B] [V]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
V = int(sys.argv[2]) if len(sys.argv) > 2 else 128256


def main():
    from qserve_tpu.layers import sampler as S

    key = jax.random.PRNGKey(0)
    # peaked: a real-model-like distribution (few dominant logits)
    peaked = jax.random.normal(key, (B, V), jnp.float32) * 8.0
    # near-uniform: random-weight-model-like (nucleus never closes in C)
    flat = jax.random.normal(jax.random.fold_in(key, 1), (B, V)) * 0.01

    temp = jnp.full((B,), 0.7, jnp.float32)
    topp = jnp.full((B,), 0.9, jnp.float32)
    topk0 = jnp.zeros((B,), jnp.int32)

    def make(fn):
        return jax.jit(fn)

    variants = {
        "argmax": make(lambda x, k: jnp.argmax(x, -1).astype(jnp.float32)),
        "top_k256": make(
            lambda x, k: jax.lax.top_k(x, 256)[0].sum(-1)
        ),
        "top_k64": make(lambda x, k: jax.lax.top_k(x, 64)[0].sum(-1)),
        "sort": make(lambda x, k: jnp.sort(x, -1)[:, -8:].sum(-1)),
        "logsumexp": make(lambda x, k: jax.nn.logsumexp(x, -1)),
        "categorical": make(
            lambda x, k: jax.random.categorical(k, x, -1).astype(jnp.float32)
        ),
        "sampler": make(
            lambda x, k: S.sample(x, temp, topp, topk0, k).astype(jnp.float32)
        ),
    }

    for base_name, base in (("peaked", peaked), ("flat", flat)):
        for name, fn in variants.items():
            if name != "sampler" and base_name == "flat" and name not in (
                "sort", "categorical"
            ):
                continue

            def chain(n, x):
                t0 = time.time()
                k = jax.random.PRNGKey(7)
                for i in range(n):
                    out = fn(x + 0.0, k)
                    # dependency: perturb one column by the output
                    x = x.at[:, 0].add(out.astype(jnp.float32) * 1e-9)
                    k = jax.random.fold_in(k, i)
                np.asarray(x[0, 0])
                return time.time() - t0

            chain(2, base)
            t_s = chain(3, base)
            t_l = chain(9, base)
            dt = (t_l - t_s) / 6
            print(f"{base_name:<7} {name:<12} {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
