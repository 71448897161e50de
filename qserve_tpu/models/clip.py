"""ViT vision towers (CLIP / SigLIP style) in pure JAX for the VLM pipeline.

Reference counterpart: the reference wraps torch transformers'
CLIPVisionModel inside llava_base/multimodal_encoder/clip_encoder.py:9-96
(CLIPVisionTower, feature_select on hidden_states[-2], patch features only).
Here the ViT forward is implemented natively (bf16 matmuls on the MXU):
patch embedding as an unfold+matmul (no conv primitive needed for
stride == kernel), standard pre-LN transformer blocks, fp32 softmax/LN.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionArgs:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    image_size: int
    patch_size: int
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    use_class_token: bool = True  # CLIP yes, SigLIP no
    use_pre_layernorm: bool = True  # CLIP yes, SigLIP no
    hidden_act: str = "quick_gelu"  # CLIP; SigLIP = "gelu_pytanh"
    # llava-style feature selection: hidden_states[feature_layer], patches only
    feature_layer: int = -2
    compute_dtype: Any = jnp.bfloat16

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def from_hf_config(cfg: dict) -> "VisionArgs":
        model_type = cfg.get("model_type", "clip_vision_model")
        siglip = "siglip" in model_type
        return VisionArgs(
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            image_size=cfg["image_size"],
            patch_size=cfg["patch_size"],
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-6 if siglip else 1e-5),
            use_class_token=not siglip,
            use_pre_layernorm=not siglip,
            hidden_act="gelu_pytanh" if siglip else "quick_gelu",
        )


class VisionLayerParams(NamedTuple):
    ln1_scale: jax.Array  # [E]
    ln1_bias: jax.Array
    qkv_w: jax.Array  # [E, 3E]
    qkv_b: jax.Array  # [3E]
    out_w: jax.Array  # [E, E]
    out_b: jax.Array
    ln2_scale: jax.Array
    ln2_bias: jax.Array
    fc1_w: jax.Array  # [E, I]
    fc1_b: jax.Array
    fc2_w: jax.Array  # [I, E]
    fc2_b: jax.Array


class VisionParams(NamedTuple):
    patch_w: jax.Array  # [C*P*P, E] (torch conv flattened (c, ph, pw))
    patch_b: Optional[jax.Array]  # [E] (SigLIP has a bias; CLIP none)
    class_embed: Optional[jax.Array]  # [E] or None
    pos_embed: jax.Array  # [n_pos, E]
    pre_ln_scale: Optional[jax.Array]
    pre_ln_bias: Optional[jax.Array]
    layers: Any  # VisionLayerParams stacked [L, ...]


def _ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _act(x, kind: str):
    xf = x.astype(jnp.float32)
    if kind == "quick_gelu":
        y = xf * jax.nn.sigmoid(1.702 * xf)
    elif kind == "gelu_pytanh":
        y = jax.nn.gelu(xf, approximate=True)
    else:
        y = jax.nn.gelu(xf, approximate=False)
    return y.astype(x.dtype)


def _mm(x, w, b=None):
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def _layer(h, lp: VisionLayerParams, args: VisionArgs):
    B, T, E = h.shape
    Hh, D = args.num_heads, args.head_dim
    x = _ln(h, lp.ln1_scale, lp.ln1_bias, args.layer_norm_eps)
    qkv = _mm(x, lp.qkv_w, lp.qkv_b)  # [B, T, 3E]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, Hh, D)
    k = k.reshape(B, T, Hh, D)
    v = v.reshape(B, T, Hh, D)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / (D ** 0.5)
    p = jax.nn.softmax(scores, axis=-1)
    attn = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    attn = attn.astype(h.dtype).reshape(B, T, E)
    h = h + _mm(attn, lp.out_w, lp.out_b)
    x = _ln(h, lp.ln2_scale, lp.ln2_bias, args.layer_norm_eps)
    x = _act(_mm(x, lp.fc1_w, lp.fc1_b), args.hidden_act)
    h = h + _mm(x, lp.fc2_w, lp.fc2_b)
    return h


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, C, H, W] -> [B, nH*nW, C*P*P] with torch-conv (c, ph, pw) order."""
    B, C, H, W = images.shape
    nh, nw = H // patch, W // patch
    x = images.reshape(B, C, nh, patch, nw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, nh, nw, C, P, P]
    return x.reshape(B, nh * nw, C * patch * patch)


def forward_features(
    params: VisionParams, images: jax.Array, args: VisionArgs
) -> jax.Array:
    """[B, C, H, W] float -> patch features [B, num_patches, E].

    Matches llava's CLIPVisionTower: hidden_states[feature_layer] with the
    class token dropped (clip_encoder.py:34-41 'patch' select).
    """
    B = images.shape[0]
    dt = args.compute_dtype
    x = patchify(images.astype(jnp.float32), args.patch_size).astype(dt)
    h = _mm(x, params.patch_w.astype(dt),
            None if params.patch_b is None else params.patch_b)
    if args.use_class_token:
        cls = jnp.broadcast_to(
            params.class_embed.astype(dt)[None, None, :],
            (B, 1, args.hidden_size),
        )
        h = jnp.concatenate([cls, h], axis=1)
    h = h + params.pos_embed.astype(dt)[None]
    if args.use_pre_layernorm:
        h = _ln(h, params.pre_ln_scale, params.pre_ln_bias, args.layer_norm_eps)

    # hidden_states[k] = embeddings after k layers; feature_layer=-2 means
    # run all but the last layer (HF returns L+1 hidden states)
    n_run = args.num_layers + 1 + args.feature_layer
    assert 0 <= n_run <= args.num_layers

    def body(h, lp):
        return _layer(h, lp, args), None

    sliced = jax.tree.map(lambda a: a[:n_run], params.layers)
    h, _ = jax.lax.scan(body, h, sliced)
    if args.use_class_token:
        h = h[:, 1:]
    return h


# ---------------------------------------------------------------------------
# Weight loading (HF CLIPVisionModel / SiglipVisionModel state dicts)
# ---------------------------------------------------------------------------


def params_from_hf_state(state: dict, args: VisionArgs) -> VisionParams:
    """Build VisionParams from a HF vision-tower state dict (numpy arrays).

    Accepts keys with or without the 'vision_model.' / 'vision_tower.' prefix.
    """

    def get(key, default=None):
        for pre in ("", "vision_model.", "vision_tower.vision_model."):
            if pre + key in state:
                return np.asarray(state[pre + key])
        if default is not None:
            return default
        raise KeyError(key)

    E = args.hidden_size
    pw = get("embeddings.patch_embedding.weight")  # [E, C, P, P]
    patch_w = pw.reshape(E, -1).T  # [C*P*P, E]
    patch_b = None
    try:
        patch_b = jnp.asarray(get("embeddings.patch_embedding.bias"))
    except KeyError:
        pass
    class_embed = None
    if args.use_class_token:
        class_embed = jnp.asarray(get("embeddings.class_embedding").reshape(E))
    pos = get("embeddings.position_embedding.weight")
    pre_s = pre_b = None
    if args.use_pre_layernorm:
        # HF spells it 'pre_layrnorm' in CLIP (sic)
        try:
            pre_s = jnp.asarray(get("pre_layrnorm.weight"))
            pre_b = jnp.asarray(get("pre_layrnorm.bias"))
        except KeyError:
            pre_s = jnp.asarray(get("pre_layernorm.weight"))
            pre_b = jnp.asarray(get("pre_layernorm.bias"))

    layers = []
    for li in range(args.num_layers):
        p = f"encoder.layers.{li}."
        qw = get(p + "self_attn.q_proj.weight").T
        kw = get(p + "self_attn.k_proj.weight").T
        vw = get(p + "self_attn.v_proj.weight").T
        qb = get(p + "self_attn.q_proj.bias")
        kb = get(p + "self_attn.k_proj.bias")
        vb = get(p + "self_attn.v_proj.bias")
        layers.append(VisionLayerParams(
            ln1_scale=jnp.asarray(get(p + "layer_norm1.weight")),
            ln1_bias=jnp.asarray(get(p + "layer_norm1.bias")),
            qkv_w=jnp.asarray(np.concatenate([qw, kw, vw], axis=1)),
            qkv_b=jnp.asarray(np.concatenate([qb, kb, vb])),
            out_w=jnp.asarray(get(p + "self_attn.out_proj.weight").T),
            out_b=jnp.asarray(get(p + "self_attn.out_proj.bias")),
            ln2_scale=jnp.asarray(get(p + "layer_norm2.weight")),
            ln2_bias=jnp.asarray(get(p + "layer_norm2.bias")),
            fc1_w=jnp.asarray(get(p + "mlp.fc1.weight").T),
            fc1_b=jnp.asarray(get(p + "mlp.fc1.bias")),
            fc2_w=jnp.asarray(get(p + "mlp.fc2.weight").T),
            fc2_b=jnp.asarray(get(p + "mlp.fc2.bias")),
        ))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return VisionParams(
        patch_w=jnp.asarray(patch_w),
        patch_b=patch_b,
        class_embed=class_embed,
        pos_embed=jnp.asarray(pos),
        pre_ln_scale=pre_s,
        pre_ln_bias=pre_b,
        layers=stacked,
    )


def random_params(key: jax.Array, args: VisionArgs, scale=0.02) -> VisionParams:
    E, I = args.hidden_size, args.intermediate_size
    P, C = args.patch_size, args.num_channels
    n_pos = args.num_patches + (1 if args.use_class_token else 0)
    ks = jax.random.split(key, 4 + args.num_layers)

    def init(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * scale

    layers = []
    for li in range(args.num_layers):
        lk = jax.random.split(ks[4 + li], 4)
        layers.append(VisionLayerParams(
            ln1_scale=jnp.ones(E), ln1_bias=jnp.zeros(E),
            qkv_w=init(lk[0], (E, 3 * E)), qkv_b=jnp.zeros(3 * E),
            out_w=init(lk[1], (E, E)), out_b=jnp.zeros(E),
            ln2_scale=jnp.ones(E), ln2_bias=jnp.zeros(E),
            fc1_w=init(lk[2], (E, I)), fc1_b=jnp.zeros(I),
            fc2_w=init(lk[3], (I, E)), fc2_b=jnp.zeros(E),
        ))
    return VisionParams(
        patch_w=init(ks[0], (C * P * P, E)),
        patch_b=None if args.use_class_token else jnp.zeros(E),
        class_embed=init(ks[1], (E,)) if args.use_class_token else None,
        pos_embed=init(ks[2], (n_pos, E)),
        pre_ln_scale=jnp.ones(E) if args.use_pre_layernorm else None,
        pre_ln_bias=jnp.zeros(E) if args.use_pre_layernorm else None,
        layers=jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    )
