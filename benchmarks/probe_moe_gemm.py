"""Probe: does an N-expert dense GEMM loop really cost N x one expert?

Background (round 5): moe_prefill measured routed ~= dense (~29 ms/step at
8 layers) although dense runs num_experts/top_k = 4x the FFN MACs — both
legs land ~2-4x ABOVE the chip's int8 MXU peak if the MAC accounting is
right. This isolates the question to a single chained jit: K experts'
stacked-index W4A8 GEMMs (the exact op the dense MoE loop issues) vs one.

Usage: python benchmarks/probe_moe_gemm.py [M] [NE]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

M = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NE = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K, N = 4096, 28672  # Mixtral gate_up per-expert shape


def main():
    from qserve_tpu.layers import linear as lin
    from qserve_tpu.quant import qoq

    key = jax.random.PRNGKey(0)
    packs = []
    for e in range(NE):
        w = jax.random.normal(jax.random.fold_in(key, e), (K, N),
                              jnp.float32) * 0.02
        packs.append(lin.quantize_linear_from_float(w, 4, -1))
        jax.block_until_ready(packs[-1].qweight)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *packs)  # [NE, ...]

    x = jax.random.normal(jax.random.fold_in(key, 99), (M, K), jnp.float32)
    q, s, asum = qoq.quantize_activation_per_token(x, with_sum=True)
    qa = lin.QuantAct(q, s, asum)

    def mk(n_exp):
        def step(stacked, qa, bias):
            acc = jnp.zeros((M, N), jnp.float32)
            for e in range(n_exp):
                out = lin.apply_linear(
                    stacked, qa, 128, idx=jnp.asarray([e], jnp.int32)
                )
                acc = acc + out.astype(jnp.float32) * (1.0 + e)
            return acc.sum() + bias

        return jax.jit(step)

    for n_exp in (1, 2, 4, 8):
        step = mk(n_exp)
        bias = jnp.float32(0.0)

        def chain(n, bias):
            t0 = time.time()
            for _ in range(n):
                bias = step(stacked, qa, bias) * 1e-30
            np.asarray(bias)
            return time.time() - t0, bias

        _, bias = chain(2, bias)
        t_s, bias = chain(3, bias)
        t_l, bias = chain(9, bias)
        dt = (t_l - t_s) / 6
        macs = n_exp * M * K * N
        print(f"experts={n_exp}: {dt*1e3:8.2f} ms  "
              f"{macs/dt/1e12:6.1f} T-MACs/s  "
              f"[raw 3-chain {t_s*1e3:.1f}, 9-chain {t_l*1e3:.1f}]",
              flush=True)


if __name__ == "__main__":
    main()
