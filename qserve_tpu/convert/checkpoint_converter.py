"""Offline checkpoint conversion to the packed QoQ serving format.

Reference counterpart: scripts/ckpt_converter/checkpoint_converter.py, which
converts DeepCompressor fake-quant artifacts (model.pt + scale.pt) into
packed buffers via the CUDA-layout from_linear packers. Here the packed
format targets the TPU layouts (quant/packing.py, [K, N] with global
half-split nibble packing: low nibbles hold rows [0, K/2), high nibbles
rows [K/2, K)) and there are two sources:

  * a plain fp16/bf16 HF checkpoint, self-quantized with RTN QoQ math
    (no external dependency — scripts/convert_checkpoint.py CLI);
  * DeepCompressor fake-quant output, whose optimized scales are honored
    (zeros carry the reference's +8 signed->unsigned offset,
    checkpoint_converter.py:98-100).

The packed checkpoint is a directory of .safetensors shards plus a
qserve_tpu_config.json describing model geometry and the QuantSpec.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.config import QuantSpec
from qserve_tpu.layers import linear as lin
from qserve_tpu.logger import init_logger
from qserve_tpu.models import llama

logger = init_logger(__name__)

# W4 nibble-packing layout version. v1 was the half-tile (PACK_TILE=512)
# layout; v2 is the global half-split layout (commit ed436c2). Checkpoints
# written before versioning carry no marker and are treated as v1 (rejected):
# loading a v1 checkpoint with the v2 kernels would silently produce garbage.
PACK_LAYOUT_VERSION = 2

_LIN_FIELDS = {
    "w4chn": lin.W4ChnLinear._fields,
    "w4grp": lin.W4GrpLinear._fields,
    "w8": lin.W8Linear._fields,
    "w16": lin.W16Linear._fields,
}
_KIND_BY_TYPE = {
    lin.W4ChnLinear: "w4chn",
    lin.W4GrpLinear: "w4grp",
    lin.W8Linear: "w8",
    lin.W16Linear: "w16",
}
_TYPE_BY_KIND = {
    "w4chn": lin.W4ChnLinear,
    "w4grp": lin.W4GrpLinear,
    "w8": lin.W8Linear,
    "w16": lin.W16Linear,
}


def _flatten_params(params: llama.LlamaParams, scan_layers: bool) -> Dict[str, np.ndarray]:
    """LlamaParams -> flat {name: array}. Layer params stay stacked [L, ...]."""
    out = {
        "embed": params.embed,
        "final_ln": params.final_ln,
        "lm_head": params.lm_head,
    }
    layers = params.layers
    if not scan_layers:  # stack for a uniform on-disk format
        layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    for proj in ("qkv", "o", "gate_up", "down"):
        p = getattr(layers, proj)
        kind = _KIND_BY_TYPE[type(p)]
        for f in _LIN_FIELDS[kind]:
            out[f"layers.{proj}.{kind}.{f}"] = getattr(p, f)
    out["layers.input_ln"] = layers.input_ln
    out["layers.post_ln"] = layers.post_ln
    return {k: np.asarray(v) for k, v in out.items()}


def save_packed_checkpoint(
    params: llama.LlamaParams, args: llama.LlamaArgs, out_dir: str
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    flat = _flatten_params(params, args.scan_layers)
    save_file(flat, os.path.join(out_dir, "model.safetensors"))
    meta = dataclasses.asdict(args)
    meta["quant"] = dataclasses.asdict(args.quant)
    meta["pack_layout"] = PACK_LAYOUT_VERSION
    meta.pop("logit_dtype", None)
    with open(os.path.join(out_dir, "qserve_tpu_config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    logger.info("Saved packed checkpoint to %s", out_dir)


def load_packed_checkpoint(path: str, args: llama.LlamaArgs) -> llama.LlamaParams:
    from safetensors.numpy import load_file

    cfg_path = os.path.join(path, "qserve_tpu_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            layout = json.load(f).get("pack_layout", 1)
        if layout != PACK_LAYOUT_VERSION:
            raise ValueError(
                f"Packed checkpoint at {path} uses W4 pack layout v{layout}, "
                f"but this build expects v{PACK_LAYOUT_VERSION}. Re-run the "
                "checkpoint converter against the original weights."
            )

    flat = load_file(os.path.join(path, "model.safetensors"))

    def get(name):
        return jnp.asarray(flat[name])

    layer_arrays = {}
    for proj in ("qkv", "o", "gate_up", "down"):
        kind = next(
            k.split(".")[2] for k in flat if k.startswith(f"layers.{proj}.")
        )
        cls = _TYPE_BY_KIND[kind]
        layer_arrays[proj] = cls(
            **{f: get(f"layers.{proj}.{kind}.{f}") for f in _LIN_FIELDS[kind]}
        )
    layers = llama.LlamaLayerParams(
        input_ln=get("layers.input_ln"),
        qkv=layer_arrays["qkv"],
        o=layer_arrays["o"],
        post_ln=get("layers.post_ln"),
        gate_up=layer_arrays["gate_up"],
        down=layer_arrays["down"],
    )
    if not args.scan_layers:
        L = args.num_layers
        layers = tuple(jax.tree.map(lambda a: a[i], layers) for i in range(L))
    return llama.LlamaParams(
        embed=get("embed"),
        layers=layers,
        final_ln=get("final_ln"),
        lm_head=get("lm_head"),
    )


def load_packed_config(path: str) -> llama.LlamaArgs:
    with open(os.path.join(path, "qserve_tpu_config.json")) as f:
        meta = json.load(f)
    quant = QuantSpec(**meta.pop("quant"))
    meta.pop("tp_axis", None)
    meta.pop("logit_dtype", None)
    meta.pop("pack_layout", None)
    return llama.LlamaArgs(quant=quant, **meta)


# ---------------------------------------------------------------------------
# Conversion front-ends
# ---------------------------------------------------------------------------


def convert_hf_checkpoint(
    model_dir: str, out_dir: str, precision: str, group_size: int = -1,
    kv_zp: bool = True, calib_corpus: str | None = None,
    calib_windows: int = 32, calib_seqlen: int = 512, alpha: float = 0.5,
) -> None:
    """Self-quantize a local HF fp checkpoint into the packed format.

    With calib_corpus set, activation-aware scale optimization
    (quant/optimize.py: SmoothQuant/SmoothAttention folds + AWQ-style clip
    search — the in-framework stand-in for the reference's external
    DeepCompressor/lmquant pipeline, ref scripts/ckpt_converter/
    quant_utils.py:96-138) runs on the float weights before RTN."""
    from qserve_tpu.models import loader

    quant = QuantSpec.from_precision(precision, group_size, kv_zp)
    cfg = loader.load_hf_config_dict(model_dir)
    args = loader.args_from_config_dict(cfg, quant)
    fp = loader.load_float_params_from_hf(model_dir, args)
    if calib_corpus is not None:
        from qserve_tpu.quant import optimize

        calib = optimize.load_calib_windows(
            calib_corpus, n_windows=calib_windows, seqlen=calib_seqlen
        )
        fp = optimize.optimize_float_params(
            fp, args, calib, alpha=alpha, alpha_attn=alpha
        )
    params = llama.quantize_params(fp, args)
    save_packed_checkpoint(params, args, out_dir)


def convert_deepcompressor_checkpoint(
    model_dir: str,
    quant_ckpt_dir: str,
    out_dir: str,
    precision: str = "w4a8kv4",
    group_size: int = -1,
    kv_zp: bool = True,
) -> None:
    """Convert DeepCompressor fake-quant output (model.pt + scale.pt).

    model.pt holds the fake-quantized (already rounded) fp weights; scale.pt
    holds s1 (and per-group s2) scales plus zeros. Reference semantics
    (checkpoint_converter.py:81-134): integer lattice values are recovered by
    dividing the fake-quant weights by the scales and adding the zero point
    (+8 offset folds signed int4 into unsigned).
    """
    import torch

    from qserve_tpu.models import loader
    from qserve_tpu.quant import packing

    quant = QuantSpec.from_precision(precision, group_size, kv_zp)
    cfg = loader.load_hf_config_dict(model_dir)
    args = loader.args_from_config_dict(cfg, quant)

    state = torch.load(
        os.path.join(quant_ckpt_dir, "model.pt"), map_location="cpu",
        weights_only=True,
    )
    scales = torch.load(
        os.path.join(quant_ckpt_dir, "scale.pt"), map_location="cpu",
        weights_only=True,
    )

    def to_np(t):
        return t.float().numpy()

    def build_linear(prefix: str) -> lin.LinearParams:
        # fake-quant weight [OC, IC] -> our [K, N] = transpose
        w = to_np(state[f"{prefix}.weight"]).T  # [K, N]
        K, N = w.shape
        s1_key = f"{prefix}.weight.scale"
        zero_key = f"{prefix}.weight.zero"
        if quant.weight_bits == 8:
            s1 = to_np(scales[s1_key]).reshape(N)
            q = np.clip(np.rint(w / s1[None, :]), -128, 127).astype(np.int8)
            return lin.W8Linear(jnp.asarray(q), jnp.asarray(s1, np.float32))
        if group_size == -1:
            s1 = to_np(scales[s1_key]).reshape(N)
            zero = to_np(scales[zero_key]).reshape(N) if zero_key in scales else (
                np.zeros(N, np.float32)
            )
            # reference folds +8: stored zero is for the signed lattice
            zero_u = zero + 8.0
            q = np.clip(np.rint(w / s1[None, :] + zero_u[None, :]), 0, 15)
            return lin.W4ChnLinear(
                qweight=jnp.asarray(packing.pack_w4(jnp.asarray(q, jnp.int8))),
                s1_scale=jnp.asarray(s1, np.float32),
                s1_szero=jnp.asarray(s1 * zero_u, np.float32),
            )
        # per-group: level-1 fp scale + level-2 integer scale/zero
        s1 = to_np(scales[s1_key]).reshape(N)  # [N]
        s2 = to_np(scales[f"{prefix}.weight.scale2"]).reshape(K // group_size, N)
        z2 = to_np(scales[zero_key]).reshape(K // group_size, N)
        w8 = w / s1[None, :]
        G = K // group_size
        wg = w8.reshape(G, group_size, N)
        q = np.rint((wg - z2[:, None, :]) / np.maximum(s2[:, None, :], 1e-8))
        q = np.clip(q + 8.0 if q.min() < 0 else q, 0, 15).astype(np.int8)
        return lin.W4GrpLinear(
            qweight=jnp.asarray(
                packing.pack_w4(jnp.asarray(q.reshape(K, N), jnp.int8))
            ),
            s2_scale=jnp.asarray(np.clip(s2, 1, 255).astype(np.int16).astype(np.int8)),
            s2_zero=jnp.asarray(np.clip(z2, -128, 127).astype(np.int8)),
            s1_scale=jnp.asarray(s1, np.float32),
        )

    layers = []
    for li in range(args.num_layers):
        pre = f"model.layers.{li}"
        qkv = _concat_cols(
            build_linear(f"{pre}.self_attn.q_proj"),
            build_linear(f"{pre}.self_attn.k_proj"),
            build_linear(f"{pre}.self_attn.v_proj"),
        )
        gate_up = _concat_cols(
            build_linear(f"{pre}.mlp.gate_proj"),
            build_linear(f"{pre}.mlp.up_proj"),
        )
        layers.append(
            llama.LlamaLayerParams(
                input_ln=jnp.asarray(to_np(state[f"{pre}.input_layernorm.weight"])),
                qkv=qkv,
                o=build_linear(f"{pre}.self_attn.o_proj"),
                post_ln=jnp.asarray(
                    to_np(state[f"{pre}.post_attention_layernorm.weight"])
                ),
                gate_up=gate_up,
                down=build_linear(f"{pre}.mlp.down_proj"),
            )
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    embed = jnp.asarray(to_np(state["model.embed_tokens.weight"]), jnp.bfloat16)
    lm_head = (
        jnp.asarray(to_np(state["lm_head.weight"]).T, jnp.bfloat16)
        if "lm_head.weight" in state
        else embed.T
    )
    params = llama.LlamaParams(
        embed=embed,
        layers=stacked,
        final_ln=jnp.asarray(to_np(state["model.norm.weight"])),
        lm_head=lm_head,
    )
    save_packed_checkpoint(params, args, out_dir)


def _concat_cols(*parts: lin.LinearParams) -> lin.LinearParams:
    """Column-concat linears of the same kind (qkv / gate_up fusion)."""
    kind = type(parts[0])
    if kind is lin.W16Linear:
        return lin.W16Linear(jnp.concatenate([p.weight for p in parts], axis=1))
    if kind is lin.W8Linear:
        return lin.W8Linear(
            qweight=jnp.concatenate([p.qweight for p in parts], axis=1),
            scale=jnp.concatenate([p.scale for p in parts], axis=0),
        )
    if kind is lin.W4ChnLinear:
        return lin.W4ChnLinear(
            qweight=jnp.concatenate([p.qweight for p in parts], axis=1),
            s1_scale=jnp.concatenate([p.s1_scale for p in parts], axis=0),
            s1_szero=jnp.concatenate([p.s1_szero for p in parts], axis=0),
        )
    if kind is lin.W4GrpLinear:
        return lin.W4GrpLinear(
            qweight=jnp.concatenate([p.qweight for p in parts], axis=1),
            s2_scale=jnp.concatenate([p.s2_scale for p in parts], axis=1),
            s2_zero=jnp.concatenate([p.s2_zero for p in parts], axis=1),
            s1_scale=jnp.concatenate([p.s1_scale for p in parts], axis=0),
        )
    raise TypeError(kind)
