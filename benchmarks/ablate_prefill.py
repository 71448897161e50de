"""Prefill-step ablation: decompose the ~170 ms 2048-token prefill step.

Chained-step differencing at the e2e benchmark's prefill shape (64 steps of
2048 packed tokens prefill the 128x1024 workload). Each variant replaces one
part with a cheap dependent stand-in so XLA cannot fold away the rest:

  full      the production packed-varlen prefill (llama.prefill)
  noattn    flash attention replaced by a dependent elementwise stand-in
  noappend  KV quant+append skipped (k/v still computed)
  nolmhead  final-norm+lm_head replaced by a row sum
  noelem    rmsnorm_quant / quant_per_token / silu_mul_quant replaced by
            dependent casts (GEMMs + attention keep running) — the delta vs
            full is the elementwise/quant budget, i.e. the ceiling for any
            Pallas fusion of N5-N7 (SURVEY.md §2.4)

Usage: python benchmarks/ablate_prefill.py [T] [NSEQ] [variant ...]
Env: QSERVE_ABL_LAYERS/HIDDEN/INTER/HEADS/KVHEADS for CPU smoke tests.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NSEQ = int(sys.argv[2]) if len(sys.argv) > 2 else 2
VARIANTS = sys.argv[3:] or ["full", "noattn", "noappend", "nolmhead", "noelem"]
PAGE = 256


@contextlib.contextmanager
def _elementwise_stubs(ops):
    """Replace N5/N6/N7 with dependent casts for trace time (noelem)."""
    saved = (ops.rmsnorm_quant, ops.quant_per_token, ops.silu_mul_quant,
             ops.add_rmsnorm_quant)

    def stub_rmsnorm_quant(x, weight, eps=1e-6, with_sum=False):
        q = (x.astype(jnp.float32) + weight[0]).astype(jnp.int8)
        ones = jnp.ones((x.shape[0], 1), jnp.float32)
        return q, ones, (ones if with_sum else None)

    def stub_quant(x, with_sum=False):
        q = x.astype(jnp.int8)
        ones = jnp.ones((x.shape[0], 1), jnp.float32)
        return q, ones, (ones if with_sum else None)

    def stub_silu_mul_quant(gate_up, with_sum=False):
        g = gate_up[:, : gate_up.shape[1] // 2]
        ones = jnp.ones((gate_up.shape[0], 1), jnp.float32)
        return g.astype(jnp.int8), ones, (ones if with_sum else None)

    def stub_add_rmsnorm_quant(h, delta, weight, eps=1e-6, with_sum=False):
        h_new = h + delta.astype(h.dtype)
        q, s, asum = stub_rmsnorm_quant(h_new, weight, eps, with_sum)
        return h_new, q, s, asum

    ops.rmsnorm_quant = stub_rmsnorm_quant
    ops.quant_per_token = stub_quant
    ops.silu_mul_quant = stub_silu_mul_quant
    ops.add_rmsnorm_quant = stub_add_rmsnorm_quant
    try:
        yield
    finally:
        (ops.rmsnorm_quant, ops.quant_per_token, ops.silu_mul_quant,
         ops.add_rmsnorm_quant) = saved


def main():
    from qserve_tpu.config import QuantSpec
    from qserve_tpu.kernels import attention, kv_cache as kvc, ops
    from qserve_tpu.models import llama

    e = os.environ.get
    args = llama.LlamaArgs(
        vocab_size=128256,
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

    seq_len = T // NSEQ
    pages_per_seq = -(-seq_len // PAGE)
    n_pages = NSEQ * pages_per_seq + 2

    tok0 = jnp.arange(T, dtype=jnp.int32) % args.vocab_size
    positions = jnp.tile(jnp.arange(seq_len, dtype=jnp.int32), NSEQ)
    segment_ids = jnp.repeat(jnp.arange(1, NSEQ + 1, dtype=jnp.int32), seq_len)
    page_ids = (
        jnp.repeat(jnp.arange(NSEQ, dtype=jnp.int32), seq_len) * pages_per_seq
        + positions // PAGE
    )
    slots = positions % PAGE
    last_token_idx = jnp.asarray(
        [(i + 1) * seq_len - 1 for i in range(NSEQ)], jnp.int32
    )

    def fresh_cache():
        return kvc.create_kv_cache(
            args.num_layers, n_pages, args.num_kv_heads, PAGE,
            args.head_dim, args.quant.kv_bits,
        )

    def make_step(variant):
        real_prefill_attention = attention.prefill_attention

        def step(params, kv, token_ids):
            h = params.embed[token_ids].astype(jnp.bfloat16)
            from qserve_tpu.layers import rope

            cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)

            def attend(q, k, v, _li):
                if variant == "noattn":
                    return q + k.mean() + v.mean()
                return real_prefill_attention(
                    q, k, v, segment_ids, sliding_window=args.sliding_window
                )

            h, (k_all, v_all) = llama._run_layers(params, h, cos, sin, args, attend)
            if variant == "noappend":
                kv2 = kv
            else:
                kv2 = kvc.append_all_layers(
                    kv, k_all, v_all, page_ids, slots,
                    args.quant.kv_bits, args.quant.kv_zero_point,
                    max_stages=T // PAGE + NSEQ + 1,
                )
            h_last = h[last_token_idx]
            if variant == "nolmhead":
                return h_last.sum(axis=-1).astype(jnp.float32), kv2
            h_last = ops.rmsnorm(h_last, params.final_ln, args.rms_eps)
            logits = llama.lm_head_matmul(h_last, params.lm_head, jnp.float32)
            return jnp.argmax(logits, axis=-1).astype(jnp.float32), kv2

        return jax.jit(step, donate_argnames=("kv",))

    for variant in VARIANTS:
        step = make_step(variant)
        kv = fresh_cache()

        def chain(n, tok):
            nonlocal kv
            t0 = time.time()
            for _ in range(n):
                out, kv = step(params, kv, tok)
                tok = (tok + out.astype(jnp.int32).sum()) % args.vocab_size
            np.asarray(tok)
            return time.time() - t0

        ctx = _elementwise_stubs(ops) if variant == "noelem" else contextlib.nullcontext()
        with ctx:
            chain(2, tok0)  # compile (trace happens here, under stubs if any)
        t_short = chain(3, tok0)
        t_long = chain(9, tok0)
        dt = (t_long - t_short) / 6
        toks = T / dt
        print(f"{variant:<10} step = {dt*1e3:8.2f} ms   ({toks:,.0f} prefill tok/s)",
              flush=True)
        del kv


if __name__ == "__main__":
    main()
