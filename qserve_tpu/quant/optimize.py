"""Activation-aware quantization scale optimization (the "Q" in QServe).

The reference's published accuracy (ref README.md:378-387) assumes
DeepCompressor-optimized scales produced by the external lmquant pipeline
(ref scripts/ckpt_converter/quant_utils.py:96-138 consumes them). This module
is the in-framework equivalent: given a float checkpoint and a calibration
token stream it produces a *mathematically equivalent* float model whose
quantized form has lower error than plain RTN, via three transforms:

  1. **SmoothQuant folding** (per linear input): per-input-channel scales
     s_k = amax(x_k)^alpha / amax(w_k)^(1-alpha) move activation outliers
     into the weights, where 4-bit RTN absorbs them better than 8-bit
     per-token activation quantization does. Each fold is exact in float:
       - qkv input    -> folded into input_layernorm weight
       - gate_up input-> folded into post_attention_layernorm weight
       - down input   -> folded into the up-projection's output columns
                         (silu(g) * (u/s) @ (s*W_down) == silu(g)*u @ W_down)
       - o input      -> folded into the v-projection's output columns,
                         shared across the query heads of each KV group
                         (attn_out[:, hq, d] is a convex combination of
                         V[:, hq//rep, d], so scaling V scales o's input
                         exactly). This also shrinks the V-cache channel
                         spread, helping KV4 per-token-per-head quantization.
  2. **SmoothAttention** (the transform the QoQ paper names): K after RoPE
     has large per-channel outliers; lambda_k = amax(K_k)^alpha is folded
     as W_k /= lambda, W_q *= lambda. Scores Q.K^T are invariant; the K
     cache (quantized per-token-per-head asymmetric) sees a flattened
     channel range. RoPE mixes channel d with d + D/2 inside each head, so
     lambda is shared across each rotation pair — then the pre-RoPE fold
     commutes with the rotation. Q stays bf16 in this engine's attention
     (kernels/attention.py), so scaling Q up is quantization-free.
  3. **Weight clip search** (AWQ-style): per-output-channel (per-group for
     g128) grid search over a shrunken quantization range, minimizing the
     activation-weighted reconstruction error
     sum_k E[x_k^2] * (w_kj - Q(w_kj))^2.

All transforms operate on the float parameter dict (the input of
models.llama.quantize_params); the output feeds the unmodified RTN
quantizer, so the packed checkpoint format and serving kernels are
untouched. See scripts/eval_tiny_ppl.py --optimize for the measured
RTN -> optimized dPPL shrink.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.kernels import attention
from qserve_tpu.layers import rope
from qserve_tpu.logger import init_logger

logger = init_logger(__name__)


class LayerStats(NamedTuple):
    """Per-layer calibration statistics (absmax and mean-square are over all
    calibration tokens; shapes are per input channel of each linear)."""

    qkv_in_amax: jax.Array  # [E]
    qkv_in_ms: jax.Array  # [E]
    o_in_amax: jax.Array  # [Hq*D]
    o_in_ms: jax.Array  # [Hq*D]
    gate_up_in_amax: jax.Array  # [E]
    gate_up_in_ms: jax.Array  # [E]
    down_in_amax: jax.Array  # [I]
    down_in_ms: jax.Array  # [I]
    k_rope_amax: jax.Array  # [Hkv, D] post-RoPE K channel absmax


def _stats_forward(float_params: dict, args, token_ids: jax.Array):
    """Float forward over one [B, T] batch collecting per-layer stats.

    Mirrors models.llama.reference_forward_float's math (dense layers only)
    with bf16 matmuls for speed; stats are reduced in f32.
    """
    B, T = token_ids.shape
    h = jnp.asarray(float_params["embed"], jnp.bfloat16)[token_ids]
    positions = jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)
    seg = jnp.ones((T,), jnp.int32)

    def rms(x, w):
        xf = x.astype(jnp.float32)
        v = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(v + args.rms_eps) * w).astype(jnp.bfloat16)

    def amax_ms(x):  # [B, T, C] -> ([C], [C])
        xf = x.astype(jnp.float32)
        return jnp.max(jnp.abs(xf), axis=(0, 1)), jnp.mean(xf * xf, axis=(0, 1))

    stats: List[LayerStats] = []
    for fl in float_params["layers"]:
        x = rms(h, fl["input_ln"])
        qkv_amax, qkv_ms = amax_ms(x)
        qkv = x @ fl["qkv"].astype(jnp.bfloat16)
        q, k, v = jnp.split(qkv, [args.q_size, args.q_size + args.kv_size], axis=-1)
        q = jax.vmap(rope.apply_rope, in_axes=(0, None, None))(
            q.reshape(B, T, args.num_heads, args.head_dim), cos, sin
        )
        k = jax.vmap(rope.apply_rope, in_axes=(0, None, None))(
            k.reshape(B, T, args.num_kv_heads, args.head_dim), cos, sin
        )
        v = v.reshape(B, T, args.num_kv_heads, args.head_dim)
        k_amax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(0, 1))  # [Hkv, D]
        attn = jax.vmap(
            lambda q_, k_, v_: attention.prefill_attention(q_, k_, v_, seg)
        )(q, k, v).reshape(B, T, args.q_size)
        o_amax, o_ms = amax_ms(attn)
        h = h + (attn.astype(jnp.bfloat16) @ fl["o"].astype(jnp.bfloat16)).astype(
            h.dtype
        )
        x = rms(h, fl["post_ln"])
        gu_amax, gu_ms = amax_ms(x)
        gu = x @ fl["gate_up"].astype(jnp.bfloat16)
        g, u = jnp.split(gu, 2, axis=-1)
        y = jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16) * u
        dn_amax, dn_ms = amax_ms(y)
        h = h + (y @ fl["down"].astype(jnp.bfloat16)).astype(h.dtype)
        stats.append(
            LayerStats(
                qkv_in_amax=qkv_amax, qkv_in_ms=qkv_ms,
                o_in_amax=o_amax, o_in_ms=o_ms,
                gate_up_in_amax=gu_amax, gate_up_in_ms=gu_ms,
                down_in_amax=dn_amax, down_in_ms=dn_ms,
                k_rope_amax=k_amax,
            )
        )
    return stats


def calibrate(
    float_params: dict, args, windows: np.ndarray, batch: int = 8
) -> List[LayerStats]:
    """Run calibration over token windows [n, T]; merge stats (max / mean)."""
    fwd = jax.jit(functools.partial(_stats_forward, args=args))
    merged: Optional[List[LayerStats]] = None
    n_batches = 0
    for i in range(0, len(windows), batch):
        chunk = jnp.asarray(windows[i : i + batch], jnp.int32)
        st = fwd(float_params, token_ids=chunk)
        if merged is None:
            merged = [jax.tree.map(jnp.asarray, s) for s in st]
        else:
            merged = [
                LayerStats(
                    qkv_in_amax=jnp.maximum(m.qkv_in_amax, s.qkv_in_amax),
                    qkv_in_ms=m.qkv_in_ms + s.qkv_in_ms,
                    o_in_amax=jnp.maximum(m.o_in_amax, s.o_in_amax),
                    o_in_ms=m.o_in_ms + s.o_in_ms,
                    gate_up_in_amax=jnp.maximum(m.gate_up_in_amax, s.gate_up_in_amax),
                    gate_up_in_ms=m.gate_up_in_ms + s.gate_up_in_ms,
                    down_in_amax=jnp.maximum(m.down_in_amax, s.down_in_amax),
                    down_in_ms=m.down_in_ms + s.down_in_ms,
                    k_rope_amax=jnp.maximum(m.k_rope_amax, s.k_rope_amax),
                )
                for m, s in zip(merged, st)
            ]
        n_batches += 1
    assert merged is not None, "no calibration windows"
    inv = 1.0 / n_batches
    return [
        s._replace(
            qkv_in_ms=s.qkv_in_ms * inv,
            o_in_ms=s.o_in_ms * inv,
            gate_up_in_ms=s.gate_up_in_ms * inv,
            down_in_ms=s.down_in_ms * inv,
        )
        for s in merged
    ]


# ---------------------------------------------------------------------------
# Smoothing folds
# ---------------------------------------------------------------------------


def _balance_scale(
    act_amax: jax.Array, w_in_amax: jax.Array, alpha: float
) -> jax.Array:
    """SmoothQuant balance: s = amax(x)^a / amax(w)^(1-a), sanitized."""
    a = jnp.maximum(act_amax.astype(jnp.float32), 1e-5)
    w = jnp.maximum(w_in_amax.astype(jnp.float32), 1e-5)
    s = a**alpha / w ** (1.0 - alpha)
    return jnp.clip(s, 1e-4, 1e4)


def _w_in_amax(w: jax.Array) -> jax.Array:
    """Per-input-channel absmax of a [K, N] weight."""
    return jnp.max(jnp.abs(jnp.asarray(w, jnp.float32)), axis=1)


def smooth_layer(
    fl: Dict[str, jax.Array],
    st: LayerStats,
    args,
    alpha: float = 0.5,
    alpha_attn: float = 0.5,
    smooth_attn: bool = True,
    smooth_v: bool = True,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Fold smoothing scales into one layer's float params.

    Returns (new_layer_params, scales) where scales holds the applied
    per-input-channel s for each linear (activation stats divide by these:
    the post-fold activation is x / s).
    """
    Hq, Hkv, D = args.num_heads, args.num_kv_heads, args.head_dim
    rep = Hq // Hkv
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    qkv, o = f32(fl["qkv"]), f32(fl["o"])
    gate_up, down = f32(fl["gate_up"]), f32(fl["down"])
    input_ln, post_ln = f32(fl["input_ln"]), f32(fl["post_ln"])
    I = down.shape[0]

    # --- qkv input (fold into input_layernorm) ---
    s_qkv = _balance_scale(st.qkv_in_amax, _w_in_amax(qkv), alpha)
    input_ln = input_ln / s_qkv
    qkv = qkv * s_qkv[:, None]

    # --- gate_up input (fold into post_attention_layernorm) ---
    s_gu = _balance_scale(st.gate_up_in_amax, _w_in_amax(gate_up), alpha)
    post_ln = post_ln / s_gu
    gate_up = gate_up * s_gu[:, None]

    # --- down input (fold into the up projection's output columns) ---
    s_dn = _balance_scale(st.down_in_amax, _w_in_amax(down), alpha)
    gate_up = gate_up.at[:, I:].divide(s_dn[None, :])
    down = down * s_dn[:, None]

    # --- o input (fold into v columns, shared across each KV group) ---
    if smooth_v:
        o_amax_h = st.o_in_amax.reshape(Hq, D)
        # share across the rep query heads attending one KV head
        ov_amax = jnp.max(o_amax_h.reshape(Hkv, rep, D), axis=1)  # [Hkv, D]
        w_o_in = _w_in_amax(o).reshape(Hq, D)
        ov_w = jnp.max(w_o_in.reshape(Hkv, rep, D), axis=1)
        s_v_h = _balance_scale(ov_amax.reshape(-1), ov_w.reshape(-1), alpha)
        s_v = s_v_h.reshape(Hkv, D)
        s_o = jnp.repeat(s_v, rep, axis=0).reshape(Hq * D)  # expand to q heads
        v_off = (Hq + Hkv) * D
        qkv = qkv.at[:, v_off:].divide(s_v.reshape(-1)[None, :])
        o = o * s_o[:, None]
    else:
        s_o = jnp.ones((Hq * D,), jnp.float32)

    # --- SmoothAttention: flatten K's post-RoPE channel range ---
    if smooth_attn:
        lam = jnp.maximum(st.k_rope_amax.astype(jnp.float32), 1e-5) ** alpha_attn
        # share across RoPE rotation pairs (d, d + D/2) so the pre-RoPE fold
        # commutes with the rotation
        half = D // 2
        lam_pair = jnp.maximum(lam[:, :half], lam[:, half:])
        lam = jnp.concatenate([lam_pair, lam_pair], axis=1)  # [Hkv, D]
        # normalize to geometric mean 1 (scores are invariant either way;
        # this keeps q/k weight magnitudes near their originals)
        lam = lam / jnp.exp(jnp.mean(jnp.log(lam)))
        lam = jnp.clip(lam, 1e-2, 1e2)
        k_off = Hq * D
        qkv = qkv.at[:, k_off : k_off + Hkv * D].divide(
            lam.reshape(-1)[None, :]
        )
        lam_q = jnp.repeat(lam, rep, axis=0).reshape(-1)  # [Hq*D]
        qkv = qkv.at[:, : Hq * D].multiply(lam_q[None, :])

    out = dict(fl)
    out.update(
        input_ln=input_ln, qkv=qkv, o=o, post_ln=post_ln,
        gate_up=gate_up, down=down,
    )
    scales = dict(qkv=s_qkv, o=s_o, gate_up=s_gu, down=s_dn)
    return out, scales


# ---------------------------------------------------------------------------
# Weight clip search
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "n_grid", "min_ratio"))
def clip_weight(
    w: jax.Array,  # [K, N] float
    act_ms: jax.Array,  # [K] E[x_k^2] of the (post-fold) input
    bits: int = 4,
    group_size: int = -1,
    n_grid: int = 16,
    min_ratio: float = 0.5,
) -> jax.Array:
    """AWQ-style clip: shrink each quantization range by the grid ratio that
    minimizes sum_k E[x_k^2] (w - Q(w))^2; returns the *clipped float* w
    (feeding it to the RTN quantizer reproduces the clipped-range quant,
    since RTN recomputes min/max from the clipped values)."""
    K, N = w.shape
    wf = w.astype(jnp.float32)
    qmax = (1 << bits) - 1
    G = K // group_size if group_size > 0 else 1
    wg = wf.reshape(G, K // G, N)
    amg = act_ms.astype(jnp.float32).reshape(G, K // G, 1)
    gmax = jnp.max(wg, axis=1, keepdims=True)  # [G, 1, N]
    gmin = jnp.min(wg, axis=1, keepdims=True)

    ratios = jnp.linspace(1.0, min_ratio, n_grid)

    def err_for(r):
        cmax, cmin = gmax * r, gmin * r
        scale = jnp.maximum(cmax - cmin, 1e-8) / qmax
        zero = jnp.clip(jnp.round(-cmin / scale), 0, qmax)
        q = jnp.clip(jnp.round(wg / scale) + zero, 0, qmax)
        deq = (q - zero) * scale
        return jnp.sum(amg * (wg - deq) ** 2, axis=1)  # [G, N]

    errs = jax.lax.map(err_for, ratios)  # [n_grid, G, N]
    best = ratios[jnp.argmin(errs, axis=0)]  # [G, N]
    cmax = gmax * best[:, None, :]
    cmin = gmin * best[:, None, :]
    return jnp.clip(wg, cmin, cmax).reshape(K, N).astype(w.dtype)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def optimize_float_params(
    float_params: dict,
    args,
    calib_windows: np.ndarray,  # [n, T] int32 token windows
    alpha: float = 0.5,
    alpha_attn: float = 0.5,
    clip: bool = True,
    clip_grid: int = 16,
    smooth_attn: bool = True,
    smooth_v: bool = True,
    calib_batch: int = 8,
) -> dict:
    """Full pipeline: calibrate -> smooth folds -> clip search.

    Returns a new float parameter dict, mathematically equivalent to the
    input in float, whose RTN quantization (models.llama.quantize_params)
    carries the optimized scales. Dense Llama layers only (MoE layers pass
    through unchanged)."""
    if getattr(args, "num_experts", 0):
        raise NotImplementedError("scale optimization targets dense layers")
    logger.info(
        "calibrating on %d windows x %d tokens", len(calib_windows),
        calib_windows.shape[1],
    )
    stats = calibrate(float_params, args, calib_windows, batch=calib_batch)

    do_clip = clip and args.quant.weight_bits == 4
    gs = args.quant.group_size
    new_layers = []
    for li, (fl, st) in enumerate(zip(float_params["layers"], stats)):
        nl, scales = smooth_layer(
            fl, st, args, alpha=alpha, alpha_attn=alpha_attn,
            smooth_attn=smooth_attn, smooth_v=smooth_v,
        )
        if do_clip:
            # post-fold activation mean-squares: x' = x / s => E[x'^2] = E/s^2
            for name, ms in (
                ("qkv", st.qkv_in_ms), ("o", st.o_in_ms),
                ("gate_up", st.gate_up_in_ms), ("down", st.down_in_ms),
            ):
                ms_f = ms.astype(jnp.float32) / (scales[name] ** 2)
                nl[name] = clip_weight(
                    nl[name], ms_f, bits=4, group_size=gs, n_grid=clip_grid
                )
        new_layers.append({k: jax.device_get(v) for k, v in nl.items()})
        logger.info("optimized layer %d/%d", li + 1, len(stats))
    out = dict(float_params)
    out["layers"] = new_layers
    return out


def load_calib_windows(
    corpus_dir: str, n_windows: int = 32, seqlen: int = 512, bos: int = 256
) -> np.ndarray:
    """Calibration windows from the local byte-corpus (train split — the
    held-out val split stays untouched for PPL eval)."""
    import os

    data = np.fromfile(os.path.join(corpus_dir, "train.bin"), np.uint8)
    rng = np.random.RandomState(0)
    starts = rng.randint(0, len(data) - seqlen - 1, size=n_windows)
    rows = np.stack([data[s : s + seqlen - 1].astype(np.int32) for s in starts])
    return np.concatenate(
        [np.full((n_windows, 1), bos, np.int32), rows], axis=1
    )
