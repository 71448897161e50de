"""Model construction + weight loading dispatch.

Reference counterpart: the (architecture x precision) dispatch in
qserve/worker/model_runner.py:133-262 plus each model's load_weights
(llama_w4a8_unpad.py:487-630, with fused qkv/gate-up placement).

Two load paths:
  * self-quantization from a local fp16/bf16 HF checkpoint (RTN QoQ quant at
    load time — no external DeepCompressor artifact needed);
  * pre-packed qserve_tpu checkpoints produced by convert/checkpoint_converter
    (and DeepCompressor fake-quant conversion).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.config import QuantSpec
from qserve_tpu.logger import init_logger
from qserve_tpu.models import llama
from qserve_tpu.utils.weight_utils import hf_model_weights_iterator

logger = init_logger(__name__)

LLAMA_ARCHS = {
    "LlamaForCausalLM",
    "MistralForCausalLM",
    "Qwen2ForCausalLM",
    "YiForCausalLM",
}
MIXTRAL_ARCHS = {"MixtralForCausalLM"}


def load_hf_config_dict(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


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
        rope_theta=cfg.get("rope_theta", 10000.0),
        rms_eps=cfg.get("rms_norm_eps", 1e-6),
        sliding_window=cfg.get("sliding_window"),
        quant=quant,
        scan_layers=scan_layers,
    )


def load_float_params_from_hf(model_dir: str, args: llama.LlamaArgs) -> dict:
    """Collect HF llama weights into the float param dict ([in, out] layout)."""
    L = args.num_layers
    layers: list = [dict() for _ in range(L)]
    top: Dict[str, np.ndarray] = {}

    # staging for fused projections
    qkv_parts: list = [dict() for _ in range(L)]
    gu_parts: list = [dict() for _ in range(L)]

    for name, w in hf_model_weights_iterator(model_dir):
        if "rotary_emb" in name:
            continue
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
            if sub == "input_layernorm.weight":
                layers[li]["input_ln"] = w
            elif sub == "post_attention_layernorm.weight":
                layers[li]["post_ln"] = w
            elif sub == "self_attn.q_proj.weight":
                qkv_parts[li]["q"] = w.T
            elif sub == "self_attn.k_proj.weight":
                qkv_parts[li]["k"] = w.T
            elif sub == "self_attn.v_proj.weight":
                qkv_parts[li]["v"] = w.T
            elif sub == "self_attn.o_proj.weight":
                layers[li]["o"] = w.T
            elif sub == "mlp.gate_proj.weight":
                gu_parts[li]["gate"] = w.T
            elif sub == "mlp.up_proj.weight":
                gu_parts[li]["up"] = w.T
            elif sub == "mlp.down_proj.weight":
                layers[li]["down"] = w.T
            # biases unsupported (llama family has none)

    for li in range(L):
        qp = qkv_parts[li]
        layers[li]["qkv"] = np.concatenate([qp["q"], qp["k"], qp["v"]], axis=1)
        gp = gu_parts[li]
        layers[li]["gate_up"] = np.concatenate([gp["gate"], gp["up"]], axis=1)

    if "lm_head" not in top:  # tied embeddings
        top["lm_head"] = top["embed"].T
    return dict(
        embed=top["embed"],
        layers=layers,
        final_ln=top["final_ln"],
        lm_head=top["lm_head"],
    )


def load_vlm_model(
    model_dir: str,
    quant: QuantSpec,
    scan_layers: bool = True,
    quant_path: Optional[str] = None,
):
    """Load a VILA/LLaVA checkpoint: vision tower + projector + quantized LLM.

    Two on-disk layouts (reference: vila wrappers' init_vlm,
    vila_llama_w8a8_unpad.py:45-77):
      * VILA:   <dir>/{llm, vision_tower, mm_projector}/ each HF-style;
      * LLaVA:  single HF dir whose state dict holds model.mm_projector.* and
        whose config names the vision tower (must resolve to a local path).
    Returns (VilaArgs, VilaParams).
    """
    from qserve_tpu.models import clip, mm_projector, vila

    cfg = load_hf_config_dict(model_dir)
    llm_dir = model_dir
    if os.path.isdir(os.path.join(model_dir, "llm")):
        llm_dir = os.path.join(model_dir, "llm")
    largs, lparams = load_model(llm_dir, quant, scan_layers, quant_path)

    # vision tower
    vt_dir = os.path.join(model_dir, "vision_tower")
    if not os.path.isdir(vt_dir):
        vt_name = cfg.get("mm_vision_tower") or cfg.get("vision_tower")
        assert vt_name and os.path.isdir(vt_name), (
            f"vision tower not found: {vt_name!r} (needs a local path)"
        )
        vt_dir = vt_name
    vt_cfg = load_hf_config_dict(vt_dir)
    vt_cfg = vt_cfg.get("vision_config", vt_cfg)
    vargs = clip.VisionArgs.from_hf_config(vt_cfg)
    vt_state = dict(hf_model_weights_iterator(vt_dir))
    vparams = clip.params_from_hf_state(vt_state, vargs)

    # projector
    proj_type = cfg.get("mm_projector_type", cfg.get("mm_projector", "linear"))
    if not isinstance(proj_type, str) or os.path.isdir(str(proj_type)):
        proj_type = "mlp_downsample"
    pargs = mm_projector.ProjectorArgs(
        kind=proj_type,
        vision_hidden=vargs.hidden_size,
        llm_hidden=largs.hidden_size,
        grid=vargs.grid,
    )
    proj_dir = os.path.join(model_dir, "mm_projector")
    proj_state = dict(
        hf_model_weights_iterator(proj_dir if os.path.isdir(proj_dir) else model_dir)
    )
    pparams = mm_projector.params_from_hf_state(proj_state, pargs)

    args = vila.VilaArgs(llm=largs, vision=vargs, projector=pargs)
    params = vila.VilaParams(vision=vparams, projector=pparams, llm=lparams)
    logger.info(
        "Loaded VLM: tower %dpx/%d grid %d, projector %s (%d tok/img), LLM %s",
        vargs.image_size, vargs.patch_size, vargs.grid, proj_type,
        args.tokens_per_image, quant.precision,
    )
    return args, params


def load_model(
    model_dir: str,
    quant: QuantSpec,
    scan_layers: bool = True,
    quant_path: Optional[str] = None,
):
    """Returns (args, params). Self-quantizes fp checkpoints at load time."""
    cfg = load_hf_config_dict(model_dir)
    archs = set(cfg.get("architectures", []))
    if archs & MIXTRAL_ARCHS:
        from qserve_tpu.models import mixtral

        args = mixtral.args_from_config_dict(cfg, quant, scan_layers)
        fp = mixtral.load_float_params_from_hf(model_dir, args)
        params = mixtral.quantize_params(fp, args)
        logger.info("Self-quantized Mixtral (%d experts) to %s",
                    args.num_experts, quant.precision)
        return args, params
    if archs and not (archs & LLAMA_ARCHS):
        raise NotImplementedError(f"unsupported architectures {archs}")
    args = args_from_config_dict(cfg, quant, scan_layers)
    if quant_path:
        from qserve_tpu.convert.checkpoint_converter import load_packed_checkpoint

        params = load_packed_checkpoint(quant_path, args)
        logger.info("Loaded packed QoQ checkpoint from %s", quant_path)
    else:
        fp = load_float_params_from_hf(model_dir, args)
        params = llama.quantize_params(fp, args)
        logger.info(
            "Self-quantized %s to %s (group_size=%d)",
            model_dir, quant.precision, quant.group_size,
        )
    return args, params
