"""Headline benchmark: Llama-3-8B W4A8KV4 decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the reference's best published Llama-3-8B number
(3656 tok/s on L40S, /root/repo/BASELINE.md).

Env knobs: QSERVE_BENCH_MODEL (8b|1b|tiny), QSERVE_BENCH_BATCH,
QSERVE_BENCH_CTX, QSERVE_BENCH_STEPS, QSERVE_BENCH_PRECISION.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TOK_S = 3656.0  # reference Llama-3-8B on L40S (README.md:340-348)

_METRIC_NAMES = {
    "8b": "llama3-8b", "7b": "llama2-7b", "13b": "llama2-13b",
    "1b": "tinyllama-1.1b", "mixtral": "mixtral-8x7b-geometry",
}


def model_args(name: str, precision: str):
    from qserve_tpu.config import QuantSpec
    from qserve_tpu.models import llama

    gs = int(os.environ.get("QSERVE_BENCH_GROUP", "-1"))
    scan = os.environ.get("QSERVE_BENCH_SCAN", "1") == "1"
    lmh = int(os.environ.get("QSERVE_BENCH_LMHEAD", "16"))
    quant = QuantSpec.from_precision(precision, gs, lm_head_bits=lmh)
    if name == "8b":  # Llama-3-8B geometry
        return llama.LlamaArgs(
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
            rope_theta=500000.0, quant=quant, scan_layers=scan,
        )
    if name == "7b":  # Llama-2-7B geometry
        return llama.LlamaArgs(
            vocab_size=32000, hidden_size=4096, intermediate_size=11008,
            num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
            quant=quant,
        )
    if name == "13b":  # Llama-2-13B geometry
        return llama.LlamaArgs(
            vocab_size=32000, hidden_size=5120, intermediate_size=13824,
            num_layers=40, num_heads=40, num_kv_heads=40, head_dim=128,
            quant=quant,
        )
    if name == "mixtral":  # Mixtral-8x7B per-layer geometry
        # full 32-layer packed W4 weights are ~22GB; QSERVE_BENCH_LAYERS
        # truncates depth to fit one chip (decode is expert-weight-streaming
        # bound, so tok/s scales ~1/layers — report raw + note)
        L = int(os.environ.get("QSERVE_BENCH_LAYERS", "12"))
        return llama.LlamaArgs(
            vocab_size=32000, hidden_size=4096, intermediate_size=14336,
            num_layers=L, num_heads=32, num_kv_heads=8, head_dim=128,
            rope_theta=1e6, quant=quant, scan_layers=scan,
            num_experts=8, moe_top_k=2,
        )
    if name == "1b":  # TinyLlama-1.1B geometry
        return llama.LlamaArgs(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
            quant=quant,
        )
    return llama.LlamaArgs(
        vocab_size=1024, hidden_size=512, intermediate_size=1024,
        num_layers=4, num_heads=8, num_kv_heads=4, head_dim=64, quant=quant,
    )


def main():
    # fall back through batch sizes if the KV pool + weights overflow HBM on
    # a smaller-memory chip (the driver runs this unattended)
    batches = [int(os.environ.get("QSERVE_BENCH_BATCH", "128"))]
    if "QSERVE_BENCH_BATCH" not in os.environ:
        batches += [96, 64, 48]
    last_err = None
    for b in batches:
        try:
            return _run(b)
        except Exception as e:  # RESOURCE_EXHAUSTED etc.
            if "RESOURCE_EXHAUSTED" not in str(e) and "memory" not in str(e).lower():
                raise
            import sys

            print(f"[bench] batch {b} OOM; retrying smaller", file=sys.stderr)
            last_err = e
    raise last_err


def _run(B):
    from qserve_tpu.kernels import kv_cache as kvc
    from qserve_tpu.models import llama

    name = os.environ.get("QSERVE_BENCH_MODEL", "8b")
    precision = os.environ.get("QSERVE_BENCH_PRECISION", "w4a8kv4")
    ctx = int(os.environ.get("QSERVE_BENCH_CTX", "1280"))  # ~1024 in + mid-gen
    steps = int(os.environ.get("QSERVE_BENCH_STEPS", "16"))
    warmup = int(os.environ.get("QSERVE_BENCH_WARMUP", "3"))
    # 128-token pages: the Pallas paged-attention kernel wants lane-aligned
    # pages (page_size % 128 == 0)
    PAGE = int(os.environ.get("QSERVE_BENCH_PAGE", "256"))

    args = model_args(name, precision)
    max_pages_per_seq = -(-(ctx + steps + warmup + PAGE) // PAGE)
    num_pages = B * max_pages_per_seq + 8

    t0 = time.time()
    if args.num_experts > 0:
        from qserve_tpu.models import mixtral

        params = mixtral.random_quantized_params(jax.random.PRNGKey(0), args)
    else:
        params = llama.random_quantized_params(jax.random.PRNGKey(0), args)
    kv = kvc.create_kv_cache(
        args.num_layers, num_pages, args.num_kv_heads, PAGE, args.head_dim,
        args.quant.kv_bits,
    )
    jax.block_until_ready(params.layers)
    build_s = time.time() - t0

    rng = np.random.default_rng(0)
    bt = np.arange(B * max_pages_per_seq, dtype=np.int32).reshape(B, max_pages_per_seq)
    bt = jnp.asarray(bt)
    tok = jnp.asarray(rng.integers(0, args.vocab_size, B), jnp.int32)

    import functools

    @functools.partial(jax.jit, static_argnames=("margs",), donate_argnames=("kv",))
    def decode_step(params, kv, tok, bt, ctx_lens, *, margs):
        logits, kv = llama.decode(params, kv, tok, bt, ctx_lens, margs)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv

    # NOTE: on the tunneled axon backend block_until_ready() is a no-op; the
    # only reliable sync is fetching data. Measure two chained runs of
    # different lengths and difference them to cancel the constant
    # dispatch/fetch overhead.
    def run_chain(n, ctx_start, tok):
        nonlocal kv
        t0 = time.time()
        for i in range(n):
            ctx_lens = jnp.full((B,), ctx_start + i, jnp.int32)
            tok, kv = decode_step(params, kv, tok, bt, ctx_lens, margs=args)
        np.asarray(tok)  # force execution of the whole chain
        return time.time() - t0, tok

    t0 = time.time()
    compile_dt, tok = run_chain(warmup, ctx, tok)
    compile_s = time.time() - t0

    n1 = max(2, steps // 4)
    t_short, tok = run_chain(n1, ctx + warmup, tok)
    t_long, tok = run_chain(steps, ctx + warmup + n1, tok)
    dt = max(t_long - t_short, 1e-9)
    eff_steps = steps - n1

    tok_s = B * eff_steps / dt
    gs = int(os.environ.get("QSERVE_BENCH_GROUP", "-1"))
    flavor = precision if gs <= 0 else f"{precision}-g{gs}"
    if int(os.environ.get("QSERVE_BENCH_LMHEAD", "16")) == 8:
        flavor += "+lmh8"
    result = {
        "metric": f"{_METRIC_NAMES.get(name, name)} {flavor} decode "
                  f"throughput (1 chip, batch {B}, ctx {ctx})",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 4),
    }
    print(json.dumps(result))
    # diagnostics on stderr so stdout stays one JSON line
    import sys

    print(
        f"[bench] build={build_s:.1f}s compile+warmup={compile_s:.1f}s "
        f"short({n1})={t_short:.2f}s long({steps})={t_long:.2f}s "
        f"batch={B} step_latency={dt/eff_steps*1000:.2f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
