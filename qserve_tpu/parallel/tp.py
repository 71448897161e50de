"""Tensor + data parallelism over a jax.sharding.Mesh.

The reference carries vestigial TP scaffolding (models hardcode tp_size=1,
distributed init commented out — SURVEY.md §2.5); here TP is real and
TPU-native: the serving step functions run under shard_map over mesh axes
('dp', 'tp') with

  * column-parallel qkv / gate_up (heads & MLP channels sharded on 'tp'),
  * row-parallel o / down followed by psum over 'tp',
  * vocab-column-parallel lm_head + all_gather of logits over 'tp',
  * KV pages sharded on the kv-head axis over 'tp' and on the page axis
    over 'dp' (each dp replica serves its own requests out of its own pool),
  * replicated embeddings/norms.

Quantization is performed PER SHARD on the row-parallel weights (each shard
quantizes its own K rows — scales are finer than the reference's whole-row
scales, never coarser), then shard blocks are concatenated into global arrays
whose NamedSharding split reproduces exactly the per-shard packed layout.
This keeps the nibble pack tiling consistent: packing always happens on the
shard-local [K_local, N_local] matrix.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.layers import linear as lin
from qserve_tpu.layers import sampler as sampler_mod
from qserve_tpu.models import llama

TP = "tp"
DP = "dp"


def make_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, f"need {dp*tp} devices, have {len(devices)}"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DP, TP))


# ---------------------------------------------------------------------------
# Per-shard quantization + global assembly
# ---------------------------------------------------------------------------


def _quant(w, args: llama.LlamaArgs):
    return lin.quantize_linear_from_float(
        jnp.asarray(w), args.quant.weight_bits, args.quant.group_size
    )


def _concat_linear(shards: List[lin.LinearParams], col_parallel: bool):
    """Concatenate per-shard LinearParams into one global-array LinearParams,
    plus the PartitionSpec pytree that splits it back."""
    kind = type(shards[0])
    if kind is lin.W16Linear:
        ax = 1 if col_parallel else 0
        return (
            lin.W16Linear(jnp.concatenate([s.weight for s in shards], axis=ax)),
            lin.W16Linear(P(None, TP) if col_parallel else P(TP, None)),
        )
    if kind is lin.W8Linear:
        ax = 1 if col_parallel else 0
        return (
            lin.W8Linear(
                qweight=jnp.concatenate([s.qweight for s in shards], axis=ax),
                scale=jnp.concatenate([s.scale for s in shards], axis=0),
            ),
            lin.W8Linear(
                qweight=P(None, TP) if col_parallel else P(TP, None),
                scale=P(TP),
            ),
        )
    if kind is lin.W4ChnLinear:
        ax = 1 if col_parallel else 0
        return (
            lin.W4ChnLinear(
                qweight=jnp.concatenate([s.qweight for s in shards], axis=ax),
                s1_scale=jnp.concatenate([s.s1_scale for s in shards], axis=0),
                s1_szero=jnp.concatenate([s.s1_szero for s in shards], axis=0),
            ),
            lin.W4ChnLinear(
                qweight=P(None, TP) if col_parallel else P(TP, None),
                s1_scale=P(TP),
                s1_szero=P(TP),
            ),
        )
    if kind is lin.W4GrpLinear:
        ax = 1 if col_parallel else 0
        return (
            lin.W4GrpLinear(
                qweight=jnp.concatenate([s.qweight for s in shards], axis=ax),
                s2_scale=jnp.concatenate([s.s2_scale for s in shards], axis=ax),
                s2_zero=jnp.concatenate([s.s2_zero for s in shards], axis=ax),
                s1_scale=jnp.concatenate([s.s1_scale for s in shards], axis=0),
            ),
            lin.W4GrpLinear(
                qweight=P(None, TP) if col_parallel else P(TP, None),
                s2_scale=P(None, TP) if col_parallel else P(TP, None),
                s2_zero=P(None, TP) if col_parallel else P(TP, None),
                s1_scale=P(TP),
            ),
        )
    raise TypeError(kind)


def quantize_params_tp(
    float_params: dict, args: llama.LlamaArgs
) -> Tuple[llama.LlamaParams, llama.LlamaParams]:
    """Quantize float weights shard-by-shard for TP.

    Returns (params with global arrays, matching PartitionSpec pytree).
    Requires args.tp_size to divide heads / kv_heads / intermediate / vocab.
    """
    tp = args.tp_size
    D = args.head_dim
    qs, ks = args.q_size, args.kv_size
    qloc, kloc = args.q_size_local, args.kv_size_local
    iloc = args.intermediate_local
    I = args.intermediate_size
    V = args.vocab_size
    assert V % tp == 0, f"vocab {V} not divisible by tp {tp}"
    vloc = V // tp

    def shard_gate_up(gu):
        """[E, 2I] -> per-shard [g_loc ++ u_loc] blocks, quantized, concat."""
        g_blk, u_blk = gu[:, :I], gu[:, I:]
        shards = [
            _quant(
                np.concatenate(
                    [g_blk[:, s * iloc : (s + 1) * iloc],
                     u_blk[:, s * iloc : (s + 1) * iloc]],
                    axis=1,
                ),
                args,
            )
            for s in range(tp)
        ]
        return _concat_linear(shards, col_parallel=True)

    def shard_down(down):
        shards = [
            _quant(down[s * iloc : (s + 1) * iloc, :], args) for s in range(tp)
        ]
        return _concat_linear(shards, col_parallel=False)

    def shard_attn(fl):
        """qkv (column-parallel, head-blocked) + o (row-parallel)."""
        qkv = np.asarray(fl["qkv"])
        q_blk, k_blk, v_blk = qkv[:, :qs], qkv[:, qs : qs + ks], qkv[:, qs + ks :]
        o = np.asarray(fl["o"])
        qkv_shards, o_shards = [], []
        for s in range(tp):
            qkv_s = np.concatenate(
                [
                    q_blk[:, s * qloc : (s + 1) * qloc],
                    k_blk[:, s * kloc : (s + 1) * kloc],
                    v_blk[:, s * kloc : (s + 1) * kloc],
                ],
                axis=1,
            )
            qkv_shards.append(_quant(qkv_s, args))
            o_shards.append(_quant(o[s * qloc : (s + 1) * qloc, :], args))
        qkv_g, qkv_spec = _concat_linear(qkv_shards, col_parallel=True)
        o_g, o_spec = _concat_linear(o_shards, col_parallel=False)
        return qkv_g, qkv_spec, o_g, o_spec

    def _stack_experts(pairs):
        """[(LinearParams, spec)] per expert -> stacked params + spec with a
        leading replicated expert axis."""
        params = jax.tree.map(lambda *xs: jnp.stack(xs), *(p for p, _ in pairs))
        spec = jax.tree.map(
            lambda s: P(None, *s), pairs[0][1],
            is_leaf=lambda x: isinstance(x, P),
        )
        return params, spec

    def build_layer(fl):
        qkv_g, qkv_spec, o_g, o_spec = shard_attn(fl)
        if "router" in fl:  # sparse-MoE layer (Mixtral)
            gu_g, gu_spec = _stack_experts(
                [shard_gate_up(np.asarray(w)) for w in fl["experts_gate_up"]]
            )
            down_g, down_spec = _stack_experts(
                [shard_down(np.asarray(w)) for w in fl["experts_down"]]
            )
            layer = llama.MoELayerParams(
                input_ln=jnp.asarray(fl["input_ln"], jnp.float32),
                qkv=qkv_g, o=o_g,
                post_ln=jnp.asarray(fl["post_ln"], jnp.float32),
                router=jnp.asarray(fl["router"], jnp.float32),
                gate_up=gu_g, down=down_g,
            )
            spec = llama.MoELayerParams(
                input_ln=P(None), qkv=qkv_spec, o=o_spec,
                post_ln=P(None), router=P(None, None),
                gate_up=gu_spec, down=down_spec,
            )
            return layer, spec
        gu_g, gu_spec = shard_gate_up(np.asarray(fl["gate_up"]))
        down_g, down_spec = shard_down(np.asarray(fl["down"]))
        layer = llama.LlamaLayerParams(
            input_ln=jnp.asarray(fl["input_ln"], jnp.float32),
            qkv=qkv_g, o=o_g,
            post_ln=jnp.asarray(fl["post_ln"], jnp.float32),
            gate_up=gu_g, down=down_g,
        )
        spec = llama.LlamaLayerParams(
            input_ln=P(None), qkv=qkv_spec, o=o_spec,
            post_ln=P(None), gate_up=gu_spec, down=down_spec,
        )
        return layer, spec

    layers, layer_spec = [], None
    for fl in float_params["layers"]:
        layer, layer_spec = build_layer(fl)
        layers.append(layer)
    if args.scan_layers:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        # prepend the layer axis (replicated) to each spec
        layer_specs = jax.tree.map(
            lambda s: P(None, *s), layer_spec,
            is_leaf=lambda x: isinstance(x, P),
        )
    else:
        stacked = tuple(layers)
        layer_specs = tuple(layer_spec for _ in layers)

    # W8 lm_head quantizes per output channel, so per-shard == global quant
    # and the vocab-column sharding carries over to (qweight, scale)
    lm_head = llama.make_lm_head(float_params["lm_head"], args.quant)
    if isinstance(lm_head, lin.W8Linear):
        lm_head_spec = lin.W8Linear(qweight=P(None, TP), scale=P(TP))
    else:
        lm_head_spec = P(None, TP)
    params = llama.LlamaParams(
        embed=jnp.asarray(float_params["embed"], jnp.bfloat16),
        layers=stacked,
        final_ln=jnp.asarray(float_params["final_ln"], jnp.float32),
        lm_head=lm_head,
    )
    specs = llama.LlamaParams(
        embed=P(None, None),
        layers=layer_specs,
        final_ln=P(None),
        lm_head=lm_head_spec,
    )
    return params, specs


def kv_cache_specs() -> kvc.KVCache:
    """PartitionSpecs for the stacked cache: pages on 'dp', kv heads on 'tp'.

    data [L, P, 2, ps, H*Dc] (heads are contiguous Dc-blocks of the lane dim);
    scales [L, P, 2, 2H, ps] (shard-local row interpretation — each shard
    holds its own heads' [scales ++ zeros] rows; contents are written and read
    only under shard_map, so the global row order never materializes).
    """
    return kvc.KVCache(
        data=P(None, DP, None, None, TP),
        scales=P(None, DP, None, TP, None),
    )


def _put(x, spec: P, mesh: Mesh):
    """Shard a host-local array onto the mesh.

    Single process: plain device_put. Multi-host: every host holds the full
    (replicated-by-determinism) value, so each host materializes only its
    addressable shards via make_array_from_callback — device_put cannot
    address remote hosts' devices."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    xn = np.asarray(x)
    return jax.make_array_from_callback(xn.shape, sh, lambda idx: xn[idx])


def shard_params(params, specs, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: _put(x, s, mesh), params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_kv_cache(cache: kvc.KVCache, mesh: Mesh) -> kvc.KVCache:
    specs = kv_cache_specs()
    return kvc.KVCache(
        *(_put(a, s, mesh) for a, s in zip(cache, specs))
    )


# ---------------------------------------------------------------------------
# shard_map-wrapped serving steps
# ---------------------------------------------------------------------------


def _shard_map(fn, mesh, in_specs, out_specs):
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def build_step_fns(args: llama.LlamaArgs, mesh: Mesh, param_specs):
    """Returns (prefill_step, decode_step) jitted shard_map functions.

    All host-marshalled inputs are dp-sharded on their leading axis (each dp
    replica serves its own requests from its own page pool); scalars/keys are
    replicated. Sampled tokens come back dp-sharded.
    """
    kv_specs = kv_cache_specs()
    dp = mesh.shape[DP]

    def _key_for_shard(key):
        if dp > 1:
            key = jax.random.fold_in(key, jax.lax.axis_index(DP))
        return key

    def prefill_body(params, kv, tok, pos, seg, pages, slots, last_idx,
                     temp, topp, topk, key):
        logits, kv = llama.prefill(
            params, kv, tok, pos, seg, pages, slots, last_idx, args
        )
        toks = sampler_mod.sample(logits, temp, topp, topk, _key_for_shard(key))
        return toks, kv

    def prefill_logits_body(params, kv, tok, pos, seg, pages, slots, last_idx,
                            temp, topp, topk, key):
        """Prefill also returning last-token logits (n>1 / best_of>1: the
        host draws extra candidates from them, like the dense runner)."""
        logits, kv = llama.prefill(
            params, kv, tok, pos, seg, pages, slots, last_idx, args
        )
        toks = sampler_mod.sample(logits, temp, topp, topk, _key_for_shard(key))
        return toks, kv, logits.astype(jnp.float32)

    def chunk_body(params, kv, tok, pos, seg, pages, slots, last_idx, bt,
                   prefix_len, temp, topp, topk, key):
        """Prefix-continuation chunk (chunked prefill) under shard_map; the
        cached prefix attends through the kv-head-sharded cache."""
        logits, kv = llama.prefill_chunk(
            params, kv, tok, pos, seg, pages, slots, last_idx, bt,
            prefix_len.reshape(()), args,
        )
        toks = sampler_mod.sample(logits, temp, topp, topk, _key_for_shard(key))
        return toks, kv

    def chunk_logits_body(params, kv, tok, pos, seg, pages, slots, last_idx,
                          bt, prefix_len, temp, topp, topk, key):
        """Final chunk of a best_of>1 prompt: also return last-token logits
        (host-sampled extra candidates, like prefill_logits)."""
        logits, kv = llama.prefill_chunk(
            params, kv, tok, pos, seg, pages, slots, last_idx, bt,
            prefix_len.reshape(()), args,
        )
        toks = sampler_mod.sample(logits, temp, topp, topk, _key_for_shard(key))
        return toks, kv, logits.astype(jnp.float32)

    def chunk_decode_body(params, kv, tok, pos, seg, pages, slots, last_idx,
                          bt, prefix_len, d_tok, d_bt, d_ctx,
                          temp, topp, topk, key):
        """Mixed step: one prefill chunk + the running decode batch fused
        into a single [T+B] stream (decodes keep generating during a long
        admission)."""
        logits, kv = llama.prefill_chunk_with_decode(
            params, kv, tok, pos, seg, pages, slots, last_idx, bt,
            prefix_len.reshape(()), d_tok, d_bt, d_ctx, args,
        )
        toks = sampler_mod.sample(logits, temp, topp, topk, _key_for_shard(key))
        return toks, kv

    def decode_body(params, kv, tok, bt, ctx, temp, topp, topk, key):
        logits, kv = llama.decode(params, kv, tok, bt, ctx, args)
        toks = sampler_mod.sample(logits, temp, topp, topk, _key_for_shard(key))
        return toks, kv

    dpv = P(DP)
    prefill = _shard_map(
        prefill_body, mesh,
        in_specs=(param_specs, kv_specs, dpv, dpv, dpv, dpv, dpv, dpv,
                  dpv, dpv, dpv, P()),
        out_specs=(dpv, kv_specs),
    )
    prefill_logits = _shard_map(
        prefill_logits_body, mesh,
        in_specs=(param_specs, kv_specs, dpv, dpv, dpv, dpv, dpv, dpv,
                  dpv, dpv, dpv, P()),
        out_specs=(dpv, kv_specs, dpv),
    )
    chunk = _shard_map(
        chunk_body, mesh,
        in_specs=(param_specs, kv_specs, dpv, dpv, dpv, dpv, dpv, dpv,
                  P(DP, None), dpv, dpv, dpv, dpv, P()),
        out_specs=(dpv, kv_specs),
    )
    chunk_logits = _shard_map(
        chunk_logits_body, mesh,
        in_specs=(param_specs, kv_specs, dpv, dpv, dpv, dpv, dpv, dpv,
                  P(DP, None), dpv, dpv, dpv, dpv, P()),
        out_specs=(dpv, kv_specs, dpv),
    )
    chunk_decode = _shard_map(
        chunk_decode_body, mesh,
        in_specs=(param_specs, kv_specs, dpv, dpv, dpv, dpv, dpv, dpv,
                  P(DP, None), dpv, dpv, P(DP, None), dpv,
                  dpv, dpv, dpv, P()),
        out_specs=(dpv, kv_specs),
    )
    decode = _shard_map(
        decode_body, mesh,
        in_specs=(param_specs, kv_specs, dpv, P(DP, None), dpv,
                  dpv, dpv, dpv, P()),
        out_specs=(dpv, kv_specs),
    )
    prefill = jax.jit(prefill, donate_argnums=(1,))
    prefill_logits = jax.jit(prefill_logits, donate_argnums=(1,))
    chunk = jax.jit(chunk, donate_argnums=(1,))
    chunk_logits = jax.jit(chunk_logits, donate_argnums=(1,))
    chunk_decode = jax.jit(chunk_decode, donate_argnums=(1,))
    decode = jax.jit(decode, donate_argnums=(1,))
    return prefill, decode, chunk, prefill_logits, chunk_decode, chunk_logits
