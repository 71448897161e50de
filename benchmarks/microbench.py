"""On-device microbenchmark harness for the tunneled TPU.

The axon relay makes host-side timing useless (block_until_ready is a no-op,
per-call dispatch costs ~10ms of tunnel latency, and queued executions
overlap). The only trustworthy clock: run the op R times inside ONE jitted
fori_loop with a rolling data dependency (so XLA can't hoist it), fetch a
scalar, and difference two run lengths.

Usage: python benchmarks/microbench.py [gemm|attn|all]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # v5e
INT8_TOPS = 394.0
BF16_TFLOPS = 197.0


def timed_loop(op, first_arg, reps: int = 32, consts=()):
    """Average seconds per op() call, measured on device.

    op: fn(first_arg_like, *consts) -> array; first_arg is rolled 1 row per
    iteration to defeat loop-invariant hoisting; cost of the roll is measured
    and subtracted via the two-length difference. Pass big loop-invariant
    operands (weights, caches) via `consts` so they enter as jit ARGUMENTS —
    a closure capture materializes them to the host as lowering constants.
    """

    def make(R):
        @jax.jit
        def run(a, *cs):
            def body(i, carry):
                a, acc = carry
                out = op(a, *cs)
                acc = acc + out.reshape(-1)[0].astype(jnp.float32)
                return (jnp.roll(a, 1, axis=0), acc)

            _, acc = jax.lax.fori_loop(0, R, body, (a, jnp.float32(0)))
            return acc

        return run

    short, long_ = make(2), make(2 + reps)
    s = short(first_arg, *consts); np.asarray(s)  # compile both, sync
    l = long_(first_arg, *consts); np.asarray(l)
    t0 = time.time(); np.asarray(short(first_arg, *consts)); t1 = time.time() - t0
    t0 = time.time(); np.asarray(long_(first_arg, *consts)); t2 = time.time() - t0
    return max((t2 - t1) / reps, 1e-9)


def bench_gemms():
    from qserve_tpu.kernels import pallas_gemm as pg
    from qserve_tpu.quant import packing, qoq

    print(f"{'kernel':<10} {'M':>5} {'K':>5} {'N':>6} {'ms':>8} {'TOP/s':>7} "
          f"{'wBW GB/s':>9} {'roofline%':>9}")
    shapes = [
        (int(x) for x in s.split(","))
        for s in os.environ.get(
            "QSERVE_MB_SHAPES",
            # 8B decode gate_up; mid batch; prefill
            "32,4096,28672 256,4096,28672 2048,4096,4096",
        ).split()
    ]
    for M, K, N in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(kx, (M, K), jnp.float32)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
        p = qoq.quantize_weight_per_channel(w)
        packed = jax.device_put(packing.pack_w4(p.qweight))
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
        s1, sz = p.s1_scale, p.s1_szero

        t = timed_loop(
            lambda a_: pg.w4a8_gemm_per_chn_pallas(a_, ascale, asum, packed, s1, sz),
            a,
        )
        flops = 2 * M * K * N
        wbytes = K * N // 2
        # roofline: max(compute at int8 peak, weight bytes at HBM peak)
        t_ideal = max(flops / (INT8_TOPS * 1e12), wbytes / (HBM_GBPS * 1e9))
        print(f"{'w4a8chn':<10} {M:>5} {K:>5} {N:>6} {t*1e3:>8.3f} "
              f"{flops/t/1e12:>7.1f} {wbytes/t/1e9:>9.0f} {t_ideal/t*100:>8.0f}%")

        # XLA bf16 comparison
        wb = jnp.asarray(w, jnp.bfloat16)
        f = jax.jit(lambda a_: (a_.astype(jnp.bfloat16) @ wb))
        tb = timed_loop(f, x)
        print(f"{'bf16-xla':<10} {M:>5} {K:>5} {N:>6} {tb*1e3:>8.3f} "
              f"{flops/tb/1e12:>7.1f} {2*wbytes*2/tb/1e9:>9.0f} "
              f"{max(flops/(BF16_TFLOPS*1e12), 4*wbytes/(HBM_GBPS*1e9))/tb*100:>8.0f}%")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gemm"
    if which in ("gemm", "all"):
        bench_gemms()
