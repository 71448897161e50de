"""MoE prefill step time: routed (grouped-GEMM, FLOPs ~ top_k) vs dense
(masked every-expert loop, FLOPs ~ num_experts).

The reference never shipped MoE kernels (mixtral_w4a8_unpad.py:288), so this
is a framework-internal A/B: the same Mixtral-geometry model and packed
2048-token prefill step, with the routed dispatch toggled via
LlamaArgs.moe_route_min_tokens. Chained-step differencing (the only timing
that is reliable through the tunnel).

Usage: python benchmarks/moe_prefill.py [T] [NSEQ]
Env: QSERVE_BENCH_LAYERS (default 8), QSERVE_BENCH_GROUP (-1 | 128).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NSEQ = int(sys.argv[2]) if len(sys.argv) > 2 else 2
PAGE = 256


def main():
    from qserve_tpu.config import QuantSpec
    from qserve_tpu.kernels import attention, kv_cache as kvc, ops
    from qserve_tpu.models import llama, mixtral

    e = os.environ.get
    L = int(e("QSERVE_BENCH_LAYERS", "8"))
    gs = int(e("QSERVE_BENCH_GROUP", "-1"))
    base = llama.LlamaArgs(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=L, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=1e6, quant=QuantSpec.from_precision("w4a8kv4", gs),
        num_experts=8, moe_top_k=2,
    )
    # llama.random_quantized_params builds DENSE layers even when
    # num_experts > 0 — through round 5 this benchmark measured a dense
    # model twice (routed == dense to the microsecond, and 4x over the int8
    # roofline under MoE FLOP accounting, which is how it was caught)
    params = mixtral.random_quantized_params(jax.random.PRNGKey(0), base)
    jax.block_until_ready(params.layers)

    seq_len = T // NSEQ
    pages_per_seq = -(-seq_len // PAGE)
    n_pages = NSEQ * pages_per_seq + 2
    tok0 = jnp.arange(T, dtype=jnp.int32) % base.vocab_size
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
            base.num_layers, n_pages, base.num_kv_heads, PAGE,
            base.head_dim, base.quant.kv_bits,
        )

    def make_step(args):
        from qserve_tpu.layers import rope

        def step(params, kv, token_ids):
            h = params.embed[token_ids].astype(jnp.bfloat16)
            cos, sin = rope.rope_cos_sin(
                positions, args.head_dim, args.rope_theta
            )

            def attend(q, k, v, _li):
                return attention.prefill_attention(q, k, v, segment_ids)

            h, (k_all, v_all) = llama._run_layers(params, h, cos, sin, args,
                                                  attend)
            kv2 = kvc.append_all_layers(
                kv, k_all, v_all, page_ids, slots,
                args.quant.kv_bits, args.quant.kv_zero_point,
                max_stages=T // PAGE + NSEQ + 1,
            )
            h_last = ops.rmsnorm(h[last_token_idx], params.final_ln,
                                 args.rms_eps)
            logits = llama.lm_head_matmul(h_last, params.lm_head, jnp.float32)
            return jnp.argmax(logits, axis=-1).astype(jnp.float32), kv2

        return jax.jit(step, donate_argnames=("kv",))

    for label, min_tok in (("routed", 1), ("dense", 1 << 30)):
        args = dataclasses.replace(base, moe_route_min_tokens=min_tok)
        step = make_step(args)
        kv = fresh_cache()

        def chain(n, tok):
            nonlocal kv
            t0 = time.time()
            for _ in range(n):
                out, kv = step(params, kv, tok)
                tok = (tok + out.astype(jnp.int32).sum()) % args.vocab_size
            np.asarray(tok)
            return time.time() - t0

        chain(2, tok0)
        t_short = chain(3, tok0)
        t_long = chain(9, tok0)
        dt = (t_long - t_short) / 6
        print(f"{label:<8} ({L} layers) step = {dt*1e3:8.2f} ms "
              f"({T/dt:,.0f} prefill tok/s)  "
              f"[raw: 3-chain {t_short*1e3:.1f} ms, 9-chain {t_long*1e3:.1f} ms]",
              flush=True)
        del kv


if __name__ == "__main__":
    main()
