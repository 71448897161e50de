"""Mixtral (sparse-MoE Llama) parameter construction and HF loading.

Reference counterpart: modeling/models/mixtral_w4a8_unpad.py — which raises
NotImplementedError at the MoE block (:288) because the reference's expert
GEMM / routing CUDA kernels were never released (w4a8_moe_linear.py:83-84).
This module ships the working TPU path: the forward lives in models/llama.py
(_moe_mlp, selected by LlamaArgs.num_experts > 0 / MoELayerParams), and here
we build/quantize/load the stacked per-expert weights.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.config import QuantSpec
from qserve_tpu.layers import linear as lin
from qserve_tpu.models import llama


def args_from_config_dict(
    cfg: dict, quant: QuantSpec, scan_layers: bool = True
) -> llama.LlamaArgs:
    head_dim = cfg.get("head_dim") or cfg["hidden_size"] // cfg["num_attention_heads"]
    return llama.LlamaArgs(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        num_kv_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
        head_dim=head_dim,
        rope_theta=cfg.get("rope_theta", 1e6),
        rms_eps=cfg.get("rms_norm_eps", 1e-5),
        sliding_window=cfg.get("sliding_window"),
        quant=quant,
        scan_layers=scan_layers,
        num_experts=cfg.get("num_local_experts", 8),
        moe_top_k=cfg.get("num_experts_per_tok", 2),
    )


def _stack_linear(parts):
    """[per-expert LinearParams] -> one LinearParams with leading n_exp axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *parts)


def random_float_params(key: jax.Array, args: llama.LlamaArgs, scale=0.02):
    """Random float Mixtral weights (dict form, for tests / self-quant)."""
    E, I, V = args.hidden_size, args.intermediate_size, args.vocab_size
    NE = args.num_experts

    def init(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * scale

    keys = jax.random.split(key, args.num_layers + 2)
    layers = []
    for li in range(args.num_layers):
        ks = jax.random.split(keys[li], 4 + 2 * NE)
        layers.append(dict(
            input_ln=jnp.ones((E,), jnp.float32),
            qkv=init(ks[0], (E, args.qkv_out)),
            o=init(ks[1], (args.q_size, E)),
            post_ln=jnp.ones((E,), jnp.float32),
            router=init(ks[2], (E, NE)),
            experts_gate_up=[init(ks[4 + 2 * e], (E, 2 * I)) for e in range(NE)],
            experts_down=[init(ks[5 + 2 * e], (I, E)) for e in range(NE)],
        ))
    return dict(
        embed=init(keys[-2], (V, E)),
        layers=layers,
        final_ln=jnp.ones((E,), jnp.float32),
        lm_head=init(keys[-1], (E, V)),
    )


def random_quantized_params(
    key: jax.Array, args: llama.LlamaArgs, scale: float = 0.02
) -> llama.LlamaParams:
    """Random MoE weights quantized expert-by-expert (streaming — never
    holds the float model; Mixtral-class geometries only fit a 16GB chip in
    packed W4 form)."""
    E, I, V = args.hidden_size, args.intermediate_size, args.vocab_size
    NE = args.num_experts
    wb, gs = args.quant.weight_bits, args.quant.group_size

    def ql(k, shape):
        w = jax.random.normal(k, shape, dtype=jnp.float32) * scale
        out = lin.quantize_linear_from_float(w, wb, gs)
        return jax.tree.map(lambda x: jax.block_until_ready(x), out)

    keys = jax.random.split(key, args.num_layers + 2)
    layers = []
    for li in range(args.num_layers):
        ks = jax.random.split(keys[li], 4 + 2 * NE)
        layers.append(llama.MoELayerParams(
            input_ln=jnp.ones((E,), jnp.float32),
            qkv=ql(ks[0], (E, args.qkv_out)),
            o=ql(ks[1], (args.q_size, E)),
            post_ln=jnp.ones((E,), jnp.float32),
            router=jax.random.normal(ks[2], (E, NE), jnp.float32) * scale,
            gate_up=_stack_linear(
                [ql(ks[4 + 2 * e], (E, 2 * I)) for e in range(NE)]
            ),
            down=_stack_linear(
                [ql(ks[5 + 2 * e], (I, E)) for e in range(NE)]
            ),
        ))
    if args.scan_layers:
        layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    else:
        layers = tuple(layers)
    return llama.LlamaParams(
        embed=jax.random.normal(keys[-2], (V, E), jnp.bfloat16) * scale,
        layers=layers,
        final_ln=jnp.ones((E,), jnp.float32),
        lm_head=llama.make_lm_head(
            jax.random.normal(keys[-1], (E, V), jnp.bfloat16) * scale,
            args.quant,
        ),
    )


def quantize_params(float_params: dict, args: llama.LlamaArgs) -> llama.LlamaParams:
    wb, gs = args.quant.weight_bits, args.quant.group_size

    def ql(w):
        return lin.quantize_linear_from_float(jnp.asarray(w), wb, gs)

    layers = []
    for fl in float_params["layers"]:
        layers.append(llama.MoELayerParams(
            input_ln=jnp.asarray(fl["input_ln"], jnp.float32),
            qkv=ql(fl["qkv"]),
            o=ql(fl["o"]),
            post_ln=jnp.asarray(fl["post_ln"], jnp.float32),
            router=jnp.asarray(fl["router"], jnp.float32),
            gate_up=_stack_linear([ql(w) for w in fl["experts_gate_up"]]),
            down=_stack_linear([ql(w) for w in fl["experts_down"]]),
        ))
    if args.scan_layers:
        layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    else:
        layers = tuple(layers)
    return llama.LlamaParams(
        embed=jnp.asarray(float_params["embed"], jnp.bfloat16),
        layers=layers,
        final_ln=jnp.asarray(float_params["final_ln"], jnp.float32),
        lm_head=llama.make_lm_head(float_params["lm_head"], args.quant),
    )


def load_float_params_from_hf(model_dir: str, args: llama.LlamaArgs) -> dict:
    """HF Mixtral weights -> float param dict ([in, out] layout).

    Mapping (reference load_weights, mixtral_w4a8_unpad.py:650+):
      self_attn.{q,k,v,o}_proj, block_sparse_moe.gate (router),
      block_sparse_moe.experts.{e}.{w1 gate, w3 up, w2 down}.
    """
    from qserve_tpu.utils.weight_utils import hf_model_weights_iterator

    L, NE = args.num_layers, args.num_experts
    layers = [dict() for _ in range(L)]
    qkv_parts = [dict() for _ in range(L)]
    w13 = [[dict() for _ in range(NE)] for _ in range(L)]
    top: Dict[str, np.ndarray] = {}

    for name, w in hf_model_weights_iterator(model_dir):
        if name == "model.embed_tokens.weight":
            top["embed"] = w
        elif name == "model.norm.weight":
            top["final_ln"] = w
        elif name == "lm_head.weight":
            top["lm_head"] = w.T
        elif name.startswith("model.layers."):
            parts = name.split(".")
            li = int(parts[2])
            sub = ".".join(parts[3:])
            d = layers[li]
            if sub == "input_layernorm.weight":
                d["input_ln"] = w
            elif sub == "post_attention_layernorm.weight":
                d["post_ln"] = w
            elif sub == "self_attn.q_proj.weight":
                qkv_parts[li]["q"] = w.T
            elif sub == "self_attn.k_proj.weight":
                qkv_parts[li]["k"] = w.T
            elif sub == "self_attn.v_proj.weight":
                qkv_parts[li]["v"] = w.T
            elif sub == "self_attn.o_proj.weight":
                d["o"] = w.T
            elif sub == "block_sparse_moe.gate.weight":
                d["router"] = w.T
            elif sub.startswith("block_sparse_moe.experts."):
                e = int(parts[5])
                which = parts[6]
                w13[li][e][which] = w.T

    for li in range(L):
        qp = qkv_parts[li]
        layers[li]["qkv"] = np.concatenate([qp["q"], qp["k"], qp["v"]], axis=1)
        layers[li]["experts_gate_up"] = [
            np.concatenate([w13[li][e]["w1"], w13[li][e]["w3"]], axis=1)
            for e in range(NE)
        ]
        layers[li]["experts_down"] = [w13[li][e]["w2"] for e in range(NE)]
    if "lm_head" not in top:
        top["lm_head"] = top["embed"].T
    return dict(embed=top["embed"], layers=layers,
                final_ln=top["final_ln"], lm_head=top["lm_head"])
