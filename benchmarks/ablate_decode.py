"""Decode-step ablation: time full step vs step-with-one-part-disabled.

Chained-step differencing at the full decode shape (the only reliable clock
through the tunnel). Each variant keeps data dependencies so XLA cannot
constant-fold the remaining work (memory: zeroed components fold away
downstream work — here disabled parts are REPLACED by cheap dependent ops).

Usage: python benchmarks/ablate_decode.py [B] [CTX] [variant ...]
Variants: realstep full noattn noappend nolmhead noelem attnonly
Combined variants join parts with '+', e.g. noattn+noelem+noappend+nolmhead
(= GEMMs + embed + residuals + dispatch floor).

`realstep` is the production step function (sampler included) — its delta
vs `full` (argmax instead of sampling) isolates the sampler cost, and the
remaining deltas decompose the rest: attention (full - noattn), append
(full - noappend), lm_head (full - nolmhead), elementwise/quant
(full - noelem: N5-N7 replaced by dependent casts — the ceiling for any
Pallas fusion of them); GEMM is what's left.
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
VARIANTS = sys.argv[3:] or [
    "realstep", "full", "noattn", "noappend", "nolmhead", "noelem", "attnonly"
]
PAGE = int(os.environ.get("QSERVE_ABL_PAGE", "256"))


def main():
    from qserve_tpu.config import QuantSpec
    from qserve_tpu.kernels import attention, kv_cache as kvc, ops
    from qserve_tpu.layers import linear as lin, rope
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
        quant=QuantSpec.from_precision(
            e("QSERVE_ABL_PRECISION", "w4a8kv4"),
            int(e("QSERVE_ABL_GROUP", "-1")),
        ),
    )
    maxP = -(-(CTX + 64) // PAGE)
    params = llama.random_quantized_params(jax.random.PRNGKey(0), args)

    def fresh_cache():
        return kvc.create_kv_cache(
            args.num_layers, B * maxP + 8, args.num_kv_heads, PAGE,
            args.head_dim, args.quant.kv_bits,
        )

    jax.block_until_ready(params.layers)
    bt = jnp.asarray(
        np.arange(B * maxP, dtype=np.int32).reshape(B, maxP)
    )
    tok0 = jnp.arange(B, dtype=jnp.int32) % args.vocab_size

    def make_decode(variant):
        parts = set(variant.split("+"))

        def decode(params, kv, token_ids, block_tables, context_lens):
            ps = kv.page_size
            positions = context_lens - 1
            page_ids = jnp.take_along_axis(
                block_tables, (positions // ps)[:, None], axis=1
            )[:, 0]
            slots = positions % ps
            h = params.embed[token_ids].astype(jnp.bfloat16)
            cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)

            def attend(q, k, v, li):
                if "noattn" in parts:
                    # cheap dependent stand-in: keeps q/k/v alive
                    return q + k.mean() + v.mean()
                return attention.paged_decode_attention(
                    q, kv, block_tables, context_lens, li, k, v,
                    args.quant.kv_bits,
                )

            h, (k_all, v_all) = llama._run_layers(params, h, cos, sin, args, attend)
            if "noappend" in parts:
                kv2 = kv  # appends skipped (k_all/v_all still computed)
            else:
                kv2 = kvc.append_all_layers(
                    kv, k_all, v_all, page_ids, slots,
                    args.quant.kv_bits, True, unique_pages=True,
                )
            h = ops.rmsnorm(h, params.final_ln, args.rms_eps)
            if "nolmhead" in parts:
                return h.sum(axis=-1).astype(jnp.float32), kv2
            logits = llama.lm_head_matmul(h, params.lm_head, jnp.float32)
            return jnp.argmax(logits, axis=-1).astype(jnp.float32), kv2

        def realstep(params, kv, token_ids, block_tables, context_lens):
            """The production decode step: llama.decode + the real sampler
            (temperature/top-p/top-k vectors), exactly what the engine jits
            (worker/model_runner._decode_step). Sampling params come from
            QSERVE_ABL_{TEMP,TOPP,TOPK} so deltas between configs isolate
            the sampler's fast path vs its bisection slow path."""
            from qserve_tpu.layers import sampler as sampler_mod

            logits, kv2 = llama.decode(
                params, kv, token_ids, block_tables, context_lens, args
            )
            toks = sampler_mod.sample(
                logits,
                jnp.full((B,), float(e("QSERVE_ABL_TEMP", 0.7)), jnp.float32),
                jnp.full((B,), float(e("QSERVE_ABL_TOPP", 0.9)), jnp.float32),
                jnp.full((B,), int(e("QSERVE_ABL_TOPK", 0)), jnp.int32),
                jax.random.PRNGKey(0),
            )
            return toks.astype(jnp.float32), kv2

        def attn_only(params, kv, token_ids, block_tables, context_lens):
            h = params.embed[token_ids].astype(jnp.bfloat16)
            q = jnp.tile(h[:, :128][:, None, :], (1, args.num_heads, 1))
            k = q[:, : args.num_kv_heads] * 0.5
            v = q[:, : args.num_kv_heads] * 0.25

            def body(carry, li):
                o = attention.paged_decode_attention(
                    carry, kv, block_tables, context_lens, li, k, v, 4
                )
                return o.astype(jnp.bfloat16), None

            o, _ = jax.lax.scan(
                body, q.astype(jnp.bfloat16),
                jnp.arange(args.num_layers, dtype=jnp.int32),
            )
            return o.sum(axis=(1, 2)), kv

        fn = {"attnonly": attn_only, "realstep": realstep}.get(
            variant.split(":")[0], decode
        )
        return jax.jit(fn, donate_argnames=("kv",))

    @contextlib.contextmanager
    def variant_env(variant):
        """`name:SPEC` variants set attention-kernel envs for the trace (the
        dispatch threads them through as STATIC jit args, so interleaved
        specs in one process get distinct executables). SPEC is either a
        bare ablate mode (`attnonly:dma`) or k=v pairs
        (`attnonly:pchunk=5,sb=16`, keys: ablate/pchunk/nbuf/sb)."""
        spec = variant.split(":", 1)[1] if ":" in variant else ""
        env_keys = {
            "ablate": "QSERVE_ATTN_ABLATE", "pchunk": "QSERVE_ATTN_PCHUNK",
            "nbuf": "QSERVE_ATTN_NBUF", "sb": "QSERVE_ATTN_SB",
        }
        want = {"QSERVE_ATTN_ABLATE": ""}
        for kv_pair in filter(None, spec.split(",")):
            if "=" in kv_pair:
                k, v = kv_pair.split("=", 1)
                want[env_keys[k]] = v
            else:
                want["QSERVE_ATTN_ABLATE"] = kv_pair
        saved = {k: os.environ.get(k) for k in env_keys.values()}
        for k in env_keys.values():
            os.environ.pop(k, None)
        os.environ.update(want)
        stubs = None
        if "noelem" in variant.split("+"):
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from ablate_prefill import _elementwise_stubs

            stubs = _elementwise_stubs(ops)
        try:
            with (stubs or contextlib.nullcontext()):
                yield
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # interleaved timing rounds: tunnel clock drift between runs has measured
    # ~10%; timing every variant once per round and reporting the per-variant
    # MEDIAN across rounds cancels the drift that one-variant-per-process
    # sweeps cannot (QSERVE_ABL_ROUNDS=1 restores the old behavior)
    rounds = int(e("QSERVE_ABL_ROUNDS", 2))
    steps = {}
    for variant in VARIANTS:
        with variant_env(variant):
            steps[variant] = make_decode(variant)
    kv = fresh_cache()  # ONE cache shared by every variant (donated through)

    def chain(variant, n, tok):
        nonlocal kv
        step = steps[variant]
        t0 = time.time()
        for i in range(n):
            out, kv = step(params, kv, tok, bt, jnp.full((B,), CTX + i, jnp.int32))
            tok = (out.astype(jnp.int32) % args.vocab_size + tok) % args.vocab_size
        np.asarray(tok)
        return time.time() - t0

    live = []
    for variant in VARIANTS:
        try:
            with variant_env(variant):
                chain(variant, 3, tok0)  # compile + warm
            live.append(variant)
        except Exception as exc:  # one broken variant must not kill the sweep
            print(f"{variant:<16} FAILED: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    times = {v: [] for v in live}
    for _ in range(rounds):
        for variant in live:
            with variant_env(variant):
                t_short = chain(variant, 4, tok0)
                t_long = chain(variant, 16, tok0)
            times[variant].append((t_long - t_short) / 12)
    for variant in live:
        dts = sorted(times[variant])
        med = dts[len(dts) // 2] if len(dts) % 2 else (
            dts[len(dts) // 2 - 1] + dts[len(dts) // 2]
        ) / 2
        spread = (
            f"  [{min(dts)*1e3:.2f}..{max(dts)*1e3:.2f}]" if len(dts) > 1 else ""
        )
        print(f"{variant:<16} step = {med*1e3:7.2f} ms{spread}", flush=True)


if __name__ == "__main__":
    main()
