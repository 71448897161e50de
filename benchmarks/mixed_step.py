"""Mixed chunk+decode step cost: do decode rows really ride along ~free?

Times three chained step functions at the e2e admission shape (8B geometry,
2048-token prefill chunk; B decode rows):

  chunk       llama.prefill_chunk             (prompt admission alone)
  mixed       llama.prefill_chunk_with_decode (admission + decode batch)
  decode      llama.decode                    (the decode batch alone)

The claim (models/llama.py::prefill_chunk_with_decode) is that the chunk
already streams the full weights, so mixed - chunk << decode. The reference
instead schedules prompt steps exclusively (scheduler.py:279-285), paying
`chunk + decode` serially and stalling every running sequence during long
admissions.

Usage: python benchmarks/mixed_step.py [T] [B] [CTX]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CTX = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
PAGE = 256


def main():
    from qserve_tpu.config import QuantSpec
    from qserve_tpu.kernels import kv_cache as kvc
    from qserve_tpu.models import llama

    e = os.environ.get
    args = llama.LlamaArgs(
        vocab_size=int(e("QSERVE_ABL_VOCAB", 128256)),
        hidden_size=int(e("QSERVE_ABL_HIDDEN", 4096)),
        intermediate_size=int(e("QSERVE_ABL_INTER", 14336)),
        num_layers=int(e("QSERVE_ABL_LAYERS", 32)),
        num_heads=int(e("QSERVE_ABL_HEADS", 32)),
        num_kv_heads=int(e("QSERVE_ABL_KVHEADS", 8)),
        head_dim=128,
        rope_theta=500000.0,
        quant=QuantSpec.from_precision(e("QSERVE_ABL_PRECISION", "w4a8kv4")),
    )
    params = llama.random_quantized_params(jax.random.PRNGKey(0), args)
    jax.block_until_ready(params.layers)

    d_maxP = -(-(CTX + 64) // PAGE)
    c_maxP = -(-(8 * T) // PAGE)  # long-prompt chunk sequence
    n_pages = B * d_maxP + c_maxP + 2
    kv = kvc.create_kv_cache(args.num_layers, n_pages, args.num_kv_heads,
                             PAGE, args.head_dim, args.quant.kv_bits)

    # chunk seq: pages [0, c_maxP); decode seqs follow
    chunk_tables = jnp.asarray([list(range(c_maxP))], jnp.int32)
    d_bt = jnp.asarray(
        c_maxP + np.arange(B * d_maxP, dtype=np.int32).reshape(B, d_maxP)
    )
    tok0 = jnp.arange(T, dtype=jnp.int32) % args.vocab_size
    seg = jnp.ones((T,), jnp.int32)
    lti = jnp.asarray([T - 1], jnp.int32)
    d_tok0 = jnp.arange(B, dtype=jnp.int32) % args.vocab_size

    def chunk_inputs(step_i):
        # admission chunk [start, start+T) of a long prompt; page-aligned
        start = (step_i % 4) * T
        pos = start + jnp.arange(T, dtype=jnp.int32)
        return pos, pos // PAGE, pos % PAGE, jnp.int32(start)

    def mk(kind):
        def chunk_fn(p, kv, tok, d_tok, i, d_ctx):
            pos, pg, sl, start = chunk_inputs(i)
            logits, kv = llama.prefill_chunk(
                p, kv, tok, pos, seg, pg, sl, lti, chunk_tables,
                start, args)
            return logits, kv

        def mixed_fn(p, kv, tok, d_tok, i, d_ctx):
            pos, pg, sl, start = chunk_inputs(i)
            logits, kv = llama.prefill_chunk_with_decode(
                p, kv, tok, pos, seg, pg, sl, lti, chunk_tables,
                start, d_tok, d_bt, d_ctx, args)
            return logits, kv

        def decode_fn(p, kv, tok, d_tok, i, d_ctx):
            logits, kv = llama.decode(p, kv, d_tok, d_bt, d_ctx, args)
            return logits, kv

        fn = {"chunk": chunk_fn, "mixed": mixed_fn, "decode": decode_fn}[kind]

        def step(p, kv, tok, d_tok, i, d_ctx):
            # params as an ARG, not a closure capture — captured params lower
            # as multi-GB executable constants
            logits, kv = fn(p, kv, tok, d_tok, i, d_ctx)
            top = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return top, kv

        return jax.jit(step, donate_argnames=("kv",))

    steps = {k: mk(k) for k in ("chunk", "mixed", "decode")}

    def chain(kind, n, i0=0):
        nonlocal kv
        tok, d_tok = tok0, d_tok0
        t0 = time.time()
        for i in range(n):
            d_ctx = jnp.full((B,), CTX + i, jnp.int32)
            top, kv = steps[kind](params, kv, tok, d_tok, i0 + i, d_ctx)
            tok = (tok + top.sum()) % args.vocab_size
            d_tok = (d_tok + top[:B].astype(jnp.int32)) % args.vocab_size
        np.asarray(tok)
        return time.time() - t0

    rounds = int(e("QSERVE_ABL_ROUNDS", 3))
    for kind in steps:
        chain(kind, 2)  # compile + warm
    results = {k: [] for k in steps}
    for _ in range(rounds):
        for kind in steps:
            t_s = chain(kind, 2)
            t_l = chain(kind, 6)
            results[kind].append((t_l - t_s) / 4)
    out = {}
    for kind, dts in results.items():
        dts = sorted(dts)
        out[kind] = dts[len(dts) // 2]
        print(f"{kind:<8} step = {out[kind]*1e3:8.2f} ms "
              f"[{min(dts)*1e3:.2f}..{max(dts)*1e3:.2f}]", flush=True)
    ride = out["mixed"] - out["chunk"]
    print(f"decode ride-along cost = {ride*1e3:.2f} ms vs standalone decode "
          f"{out['decode']*1e3:.2f} ms "
          f"({ride/max(out['decode'],1e-9)*100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
