"""Functional Llama-family model over quantized layers and a paged KV cache.

TPU-first re-design of the reference model stack
(modeling/models/llama_w4a8_unpad.py, llama_w8a8_unpad.py,
llama_w16a16_unpad.py — all three precisions collapse into one
implementation here, parameterized by the linear-layer pytree type):

  * packed varlen prefill (segment-id masked flash attention) writes
    quantized KV pages and computes logits only on each prompt's last token
    (reference: llama_w4a8_unpad.py:471-477);
  * single-token decode appends quantized KV then attends over the paged
    history (reference MMHA semantics, decode path :265-281);
  * layers iterate under lax.scan with stacked [L, ...] params (one compile
    of the layer body) or an unrolled Python loop (args.scan_layers=False);
  * RMSNorm→INT8, SwiGLU→INT8 and attention-out→INT8 handoffs keep the
    activation int8 contract of the reference hot loop (SURVEY.md §3.3).

Weights live as [K, N]; qkv and gate_up are fused projections like the
reference's QKVParallelLinear/MergedColumnParallelLinear equivalents.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from qserve_tpu.config import QuantSpec
from qserve_tpu.kernels import attention, kv_cache as kvc, ops
from qserve_tpu.layers import linear as lin
from qserve_tpu.layers import rope


@dataclasses.dataclass(frozen=True)
class LlamaArgs:
    """Static model hyperparameters (hashable; safe as a jit static arg)."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    # Mistral-style sliding-window attention (None = full); pairs with the
    # block manager's cyclic page reuse (reference block_manager.py:192-225)
    sliding_window: Optional[int] = None
    quant: QuantSpec = QuantSpec(4, 8, 4, True, -1)
    scan_layers: bool = True
    logit_dtype: Any = jnp.float32
    # Sparse MoE (Mixtral): 0 = dense MLP
    num_experts: int = 0
    moe_top_k: int = 2
    # Token streams at least this long take the routed (grouped-GEMM) MoE
    # dispatch — prefill FLOPs scale with top_k instead of num_experts.
    # Shorter streams (decode) keep the masked dense path: decode is
    # expert-weight-streaming-bound, where dense loses no wall-clock.
    moe_route_min_tokens: int = 1024
    # Row-block size of the routed dispatch (each block runs one expert)
    moe_route_block: int = 256
    # Tensor parallelism: when tp_size > 1 the step functions run under
    # shard_map over a mesh axis named `tp_axis`; per-device arrays hold
    # 1/tp of the heads / MLP channels / vocab columns.
    tp_size: int = 1
    tp_axis: str = "tp"

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def qkv_out(self) -> int:
        return self.q_size + 2 * self.kv_size

    # ---- per-device (TP-local) sizes ----
    @property
    def heads_local(self) -> int:
        assert self.num_heads % self.tp_size == 0
        return self.num_heads // self.tp_size

    @property
    def kv_heads_local(self) -> int:
        assert self.num_kv_heads % self.tp_size == 0
        return self.num_kv_heads // self.tp_size

    @property
    def q_size_local(self) -> int:
        return self.heads_local * self.head_dim

    @property
    def kv_size_local(self) -> int:
        return self.kv_heads_local * self.head_dim

    @property
    def intermediate_local(self) -> int:
        assert self.intermediate_size % self.tp_size == 0
        return self.intermediate_size // self.tp_size

    @staticmethod
    def from_hf_config(cfg, quant: QuantSpec, scan_layers: bool = True) -> "LlamaArgs":
        head_dim = getattr(cfg, "head_dim", None) or (
            cfg.hidden_size // cfg.num_attention_heads
        )
        return LlamaArgs(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            num_kv_heads=getattr(cfg, "num_key_value_heads", cfg.num_attention_heads),
            head_dim=head_dim,
            rope_theta=getattr(cfg, "rope_theta", 10000.0),
            rms_eps=getattr(cfg, "rms_norm_eps", 1e-6),
            sliding_window=getattr(cfg, "sliding_window", None),
            quant=quant,
            scan_layers=scan_layers,
        )


class LlamaLayerParams(NamedTuple):
    input_ln: jax.Array  # [E]
    qkv: lin.LinearParams  # [E, (Hq+2Hkv)*D]
    o: lin.LinearParams  # [Hq*D, E]
    post_ln: jax.Array  # [E]
    gate_up: lin.LinearParams  # [E, 2*I]
    down: lin.LinearParams  # [I, E]


class MoELayerParams(NamedTuple):
    """Mixtral-style sparse-MoE decoder layer (reference declared this but
    never shipped working kernels: mixtral_w4a8_unpad.py:288 raises, the
    moe_helpers extensions are unreleased — here the MoE path is functional).

    gate_up / down are LinearParams pytrees with a leading [n_experts] axis;
    the MoE block lax.scans over experts with routing weights masking
    unrouted tokens (decode is weight-streaming-bound, so computing every
    resident expert on the small token batch costs no extra wall-clock)."""

    input_ln: jax.Array  # [E]
    qkv: lin.LinearParams
    o: lin.LinearParams
    post_ln: jax.Array  # [E]
    router: jax.Array  # [E, n_experts] f32
    gate_up: lin.LinearParams  # stacked [n_exp, E, 2*I]
    down: lin.LinearParams  # stacked [n_exp, I, E]


class LlamaParams(NamedTuple):
    embed: jax.Array  # [V, E] bf16
    layers: Any  # LlamaLayerParams stacked [L, ...] (scan) or tuple of them
    final_ln: jax.Array  # [E]
    lm_head: Any  # [E, V] bf16 array, or lin.W8Linear (quant.lm_head_bits=8)


# ---------------------------------------------------------------------------
# Parameter construction
# ---------------------------------------------------------------------------


def make_lm_head(w, qspec) -> Any:
    """bf16 lm_head (reference parity: the reference serves lm_head fp16,
    llama_w4a8_unpad.py keeps it half) or W8 per-channel when
    qspec.lm_head_bits == 8 — halves the dominant per-step weight stream of
    the logits GEMM (~1GB bf16 at Llama-3-8B's 128K vocab)."""
    w = jnp.asarray(w)
    if getattr(qspec, "lm_head_bits", 16) == 8:
        return lin.quantize_linear_from_float(w.astype(jnp.float32), 8)
    return w.astype(jnp.bfloat16)


def lm_head_matmul(h: jax.Array, lmh, out_dtype) -> jax.Array:
    """Logits GEMM against either lm_head form (shard-local under TP)."""
    if isinstance(lmh, lin.W8Linear):
        q, s, _ = ops.quant_per_token(h, False)
        return lin.apply_linear(lmh, lin.QuantAct(q, s, None),
                                out_dtype=out_dtype)
    return ops.matmul(h, lmh, out_dtype)


def random_float_params(key: jax.Array, args: LlamaArgs, scale: float = 0.02):
    """Random *float* weights (test fixture / self-quantization source)."""
    E, I, V = args.hidden_size, args.intermediate_size, args.vocab_size

    def init(k, shape, s=scale):
        return jax.random.normal(k, shape, dtype=jnp.float32) * s

    keys = jax.random.split(key, args.num_layers + 2)
    layers = []
    for li in range(args.num_layers):
        ks = jax.random.split(keys[li], 4)
        layers.append(
            dict(
                input_ln=jnp.ones((E,), jnp.float32),
                qkv=init(ks[0], (E, args.qkv_out)),
                o=init(ks[1], (args.q_size, E)),
                post_ln=jnp.ones((E,), jnp.float32),
                gate_up=init(ks[2], (E, 2 * I)),
                down=init(ks[3], (I, E)),
            )
        )
    return dict(
        embed=init(keys[-2], (V, E)),
        layers=layers,
        final_ln=jnp.ones((E,), jnp.float32),
        lm_head=init(keys[-1], (E, V)),
    )


def random_quantized_params(key: jax.Array, args: LlamaArgs, scale: float = 0.02):
    """Random weights quantized layer-by-layer (streaming — never holds the
    full fp32 model; needed to build 8B-class models on a 16GB chip)."""
    assert args.num_experts == 0, (
        "MoE args need mixtral.random_quantized_params (this builder makes "
        "DENSE layers; benchmarks/moe_prefill.py silently measured a dense "
        "model this way through round 5)"
    )
    E, I, V = args.hidden_size, args.intermediate_size, args.vocab_size
    wb, gs = args.quant.weight_bits, args.quant.group_size

    def ql(k, shape):
        w = jax.random.normal(k, shape, dtype=jnp.float32) * scale
        out = lin.quantize_linear_from_float(w, wb, gs)
        return jax.tree.map(lambda x: jax.block_until_ready(x), out)

    keys = jax.random.split(key, args.num_layers + 2)
    layers = []
    for li in range(args.num_layers):
        ks = jax.random.split(keys[li], 4)
        layers.append(
            LlamaLayerParams(
                input_ln=jnp.ones((E,), jnp.float32),
                qkv=ql(ks[0], (E, args.qkv_out)),
                o=ql(ks[1], (args.q_size, E)),
                post_ln=jnp.ones((E,), jnp.float32),
                gate_up=ql(ks[2], (E, 2 * I)),
                down=ql(ks[3], (I, E)),
            )
        )
    if args.scan_layers:
        layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    else:
        layers = tuple(layers)
    embed = (jax.random.normal(keys[-2], (V, E), jnp.bfloat16) * scale)
    lm_head = make_lm_head(
        jax.random.normal(keys[-1], (E, V), jnp.bfloat16) * scale, args.quant
    )
    return LlamaParams(
        embed=embed, layers=layers,
        final_ln=jnp.ones((E,), jnp.float32), lm_head=lm_head,
    )


def quantize_params(float_params: dict, args: LlamaArgs) -> LlamaParams:
    """Quantize float weights into the serving format per args.quant."""
    assert args.num_experts == 0, (
        "MoE args need mixtral.quantize_params (this builder makes DENSE "
        "layers; a benchmark silently measured a dense model this way)"
    )
    wb, gs = args.quant.weight_bits, args.quant.group_size

    def ql(w):
        return lin.quantize_linear_from_float(jnp.asarray(w), wb, gs)

    layers = [
        LlamaLayerParams(
            input_ln=jnp.asarray(fl["input_ln"], jnp.float32),
            qkv=ql(fl["qkv"]),
            o=ql(fl["o"]),
            post_ln=jnp.asarray(fl["post_ln"], jnp.float32),
            gate_up=ql(fl["gate_up"]),
            down=ql(fl["down"]),
        )
        for fl in float_params["layers"]
    ]
    if args.scan_layers:
        layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    else:
        layers = tuple(layers)
    return LlamaParams(
        embed=jnp.asarray(float_params["embed"], jnp.bfloat16),
        layers=layers,
        final_ln=jnp.asarray(float_params["final_ln"], jnp.float32),
        lm_head=make_lm_head(float_params["lm_head"], args.quant),
    )


# ---------------------------------------------------------------------------
# Layer forward
# ---------------------------------------------------------------------------


def _quant_act(x: jax.Array, with_sum: bool) -> lin.QuantAct:
    q, s, asum = ops.quant_per_token(x, with_sum)
    return lin.QuantAct(q, s, asum)


def _layer_forward(
    lp: LlamaLayerParams,
    li: jax.Array,  # int32 layer index
    h: jax.Array,  # [T, E] bf16 residual stream EXCLUDING delta
    delta: jax.Array,  # [T, E] previous sub-block's un-added output
    cos: jax.Array,
    sin: jax.Array,
    args: LlamaArgs,
    attend,  # fn(q [T,Hq,D], k, v, li) -> [T,Hq,D]
    stacked: bool = False,  # lp fields carry a leading [L] layer dim
) -> Tuple[jax.Array, jax.Array, Tuple[jax.Array, jax.Array]]:
    """One decoder layer. Returns (h, delta_out, (k, v)) — KV-cache appends
    are the caller's job (batched across layers after the layer loop).

    The residual add of the incoming delta is FUSED into this layer's input
    rmsnorm+quant (ops.add_rmsnorm_quant): the caller threads each layer's
    down-proj output to the next layer instead of adding it eagerly, so both
    residual sites per layer ride inside the norm kernels' single pass.

    stacked=True: lp is the FULL stacked parameter pytree and li addresses
    it. The quantized GEMMs consume the stacked weights directly (scalar-
    prefetched layer index) — a lax.scan that slices weights per layer would
    copy the entire model through HBM every step."""
    T = h.shape[0]
    qspec = args.quant
    int8_act = qspec.act_bits == 8
    gs = qspec.group_size if qspec.group_size > 0 else 128
    tp = args.tp_size > 1
    idx = jnp.asarray(li, jnp.int32).reshape(1) if stacked else None

    def ln(w):  # layer-norm rows are tiny; slicing them is fine
        if stacked:
            return jax.lax.dynamic_index_in_dim(w, li, 0, keepdims=False)
        return w

    # --- attention block (column-parallel qkv, row-parallel o + psum) ---
    if int8_act:
        need_sum = lin.needs_act_sum(lp.qkv)
        h, q8, s8, a8 = ops.add_rmsnorm_quant(
            h, delta, ln(lp.input_ln), args.rms_eps, need_sum
        )
        qkv = lin.apply_linear(lp.qkv, lin.QuantAct(q8, s8, a8), gs, idx=idx)
    else:
        h = h + delta.astype(h.dtype)
        x = ops.rmsnorm(h, ln(lp.input_ln), args.rms_eps)
        qkv = lin.apply_linear(lp.qkv, x, gs, idx=idx)

    q, k, v = jnp.split(
        qkv,
        [args.q_size_local, args.q_size_local + args.kv_size_local],
        axis=-1,
    )
    q = q.reshape(T, args.heads_local, args.head_dim)
    k = k.reshape(T, args.kv_heads_local, args.head_dim)
    v = v.reshape(T, args.kv_heads_local, args.head_dim)
    q = rope.apply_rope(q, cos, sin)
    k = rope.apply_rope(k, cos, sin)

    attn = attend(q, k, v, li)  # [T, Hq_local, D]
    attn = attn.reshape(T, args.q_size_local)

    if int8_act:
        o = lin.apply_linear(
            lp.o, _quant_act(attn, lin.needs_act_sum(lp.o)), gs, idx=idx
        )
    else:
        o = lin.apply_linear(lp.o, attn, gs, idx=idx)
    if tp:
        o = jax.lax.psum(o, args.tp_axis)

    # --- MLP block (column-parallel gate_up, row-parallel down + psum) ---
    if isinstance(lp, MoELayerParams):
        h = h + o.astype(h.dtype)
        d = _moe_mlp(lp, h, args, int8_act, gs, li=li, stacked=stacked)
    elif int8_act:
        need_sum = lin.needs_act_sum(lp.gate_up)
        h, g8, gsc, gsum = ops.add_rmsnorm_quant(
            h, o, ln(lp.post_ln), args.rms_eps, need_sum
        )
        gu = lin.apply_linear(lp.gate_up, lin.QuantAct(g8, gsc, gsum), gs, idx=idx)
        y8, ysc, ysum = ops.silu_mul_quant(gu, lin.needs_act_sum(lp.down))
        d = lin.apply_linear(lp.down, lin.QuantAct(y8, ysc, ysum), gs, idx=idx)
    else:
        h = h + o.astype(h.dtype)
        x = ops.rmsnorm(h, ln(lp.post_ln), args.rms_eps)
        gu = lin.apply_linear(lp.gate_up, x, gs, idx=idx)
        y = ops.silu_mul(gu)
        d = lin.apply_linear(lp.down, y, gs, idx=idx)
    if tp:
        d = jax.lax.psum(d, args.tp_axis)
    return h, d.astype(h.dtype), (k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))


def _moe_mlp(lp: MoELayerParams, h: jax.Array, args: LlamaArgs,
             int8_act: bool, gs: int, li=None, stacked: bool = False) -> jax.Array:
    """Sparse-MoE MLP: softmax router -> top-k -> expert-indexed FFNs.

    Semantics of the reference's intended MixtralSparseMoeBlock
    (mixtral_w4a8_unpad.py:236-375: softmax over router logits, top-k with
    renormalized weights, SwiGLU experts). Every resident expert runs over
    the token batch with zero routing weight masking unrouted tokens —
    at decode the step is expert-weight-streaming-bound, so this loses no
    wall-clock vs ragged dispatch while keeping shapes static for XLA.
    The expert GEMMs index the stacked expert weights via scalar prefetch
    ([layer, expert]) — neither the layer scan nor the expert loop ever
    slices the stacked weight arrays (the copy tax the reference's
    unreleased moe_helpers would have paid with torch gathers).
    """
    T = h.shape[0]
    post_ln = (
        jax.lax.dynamic_index_in_dim(lp.post_ln, li, 0, keepdims=False)
        if stacked else lp.post_ln
    )
    router = (
        jax.lax.dynamic_index_in_dim(lp.router, li, 0, keepdims=False)
        if stacked else lp.router
    )
    x = ops.rmsnorm(h, post_ln, args.rms_eps)
    router_logits = ops.matmul(x, router.astype(jnp.bfloat16), jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)  # [T, n_exp]
    topv, topi = jax.lax.top_k(probs, args.moe_top_k)
    topv = topv / jnp.sum(topv, axis=-1, keepdims=True)  # [T, k]
    n_exp = args.num_experts
    combine = jnp.zeros((T, n_exp), jnp.float32)
    for k in range(args.moe_top_k):
        combine += jax.nn.one_hot(topi[:, k], n_exp, dtype=jnp.float32) * topv[:, k : k + 1]

    if (
        T >= args.moe_route_min_tokens
        and lin.supports_routed(lp.gate_up)
        and lin.supports_routed(lp.down)
    ):
        return _moe_routed_ffn(
            lp, x, topv, topi, args, int8_act, gs, li=li, stacked=stacked
        )

    if int8_act:
        qx = _quant_act(x, lin.needs_act_sum(lp.gate_up))

    acc = jnp.zeros((T, args.hidden_size), jnp.float32)
    for e in range(n_exp):
        if stacked:
            eidx = jnp.stack([jnp.asarray(li, jnp.int32), jnp.int32(e)])
        else:
            eidx = jnp.asarray([e], jnp.int32)
        if int8_act:
            gu = lin.apply_linear(lp.gate_up, qx, gs, idx=eidx)
            y8, ysc, ysum = ops.silu_mul_quant(gu, lin.needs_act_sum(lp.down))
            d = lin.apply_linear(lp.down, lin.QuantAct(y8, ysc, ysum), gs, idx=eidx)
        else:
            gu = lin.apply_linear(lp.gate_up, x, gs, idx=eidx)
            d = lin.apply_linear(lp.down, ops.silu_mul(gu), gs, idx=eidx)
        acc = acc + combine[:, e : e + 1] * d.astype(jnp.float32)
    return acc


def _moe_routed_ffn(lp: MoELayerParams, x: jax.Array, topv: jax.Array,
                    topi: jax.Array, args: LlamaArgs, int8_act: bool,
                    gs: int = 128, li=None, stacked: bool = False) -> jax.Array:
    """Routed (grouped-GEMM) expert dispatch for long token streams.

    Tokens sort by assigned expert into a padded stream where every
    moe_route_block-row block belongs to exactly one expert; the grouped
    Pallas GEMMs then index each block's expert weights via per-block
    scalar prefetch, so prefill FLOPs and weight DMA scale with top_k
    instead of num_experts (the masked dense loop pays num_experts —
    ~num_experts/top_k wasted compute exactly where prefill is
    compute-bound). Exact: no capacity drops; padding rows are zero and
    contribute nothing. The reference's released code has no working MoE
    at all (ref mixtral_w4a8_unpad.py:288 raises on the missing
    moe_helpers grouped GEMM)."""
    T, E = x.shape
    kk = args.moe_top_k
    n_exp = args.num_experts
    bblk = args.moe_route_block

    flat_e = topi.reshape(-1)  # [T*kk]; row t*kk+j = token t's j-th expert
    flat_t = jnp.arange(T * kk, dtype=jnp.int32) // kk
    flat_w = topv.reshape(-1).astype(jnp.float32)
    order = jnp.argsort(flat_e)
    se, st, sw = flat_e[order], flat_t[order], flat_w[order]

    counts = jnp.bincount(se, length=n_exp)  # [n_exp]
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(T * kk, dtype=jnp.int32) - starts[se]
    padded = ((counts + bblk - 1) // bblk) * bblk
    ends = jnp.cumsum(padded)
    dest = (ends - padded)[se] + rank

    # static padded-stream length: every expert wastes < bblk rows
    P = (-(-T * kk // bblk) + n_exp) * bblk
    nb = P // bblk
    block_expert = jnp.searchsorted(
        ends, jnp.arange(nb, dtype=jnp.int32) * bblk, side="right"
    ).astype(jnp.int32)
    block_expert = jnp.minimum(block_expert, n_exp - 1)  # all-pad tail blocks
    if stacked:
        block_idx = jnp.concatenate(
            [jnp.full((nb, 1), li, jnp.int32), block_expert[:, None]], axis=1
        )
    else:
        block_idx = block_expert[:, None]

    if int8_act:
        # quantize the T rows once, scatter the int8 rows + scales into the
        # padded stream (pad rows: q=0, scale=0 -> exact zero output)
        need_sum = lin.needs_act_sum(lp.gate_up)
        q, qs, qsum = _quant_act(x, need_sum)
        qp = jnp.zeros((P, E), jnp.int8).at[dest].set(q[st])
        qsp = jnp.zeros((P, 1), jnp.float32).at[dest].set(qs[st])
        qsump = (
            jnp.zeros((P, 1), jnp.float32).at[dest].set(qsum[st])
            if qsum is not None else None
        )
        gu = lin.apply_linear_routed(
            lp.gate_up, lin.QuantAct(qp, qsp, qsump), block_idx, gs
        )
        y8, ysc, ysum = ops.silu_mul_quant(gu, lin.needs_act_sum(lp.down))
        d = lin.apply_linear_routed(
            lp.down, lin.QuantAct(y8, ysc, ysum), block_idx, gs
        )
    else:
        xp = jnp.zeros((P, E), x.dtype).at[dest].set(x[st])
        gu = lin.apply_linear_routed(lp.gate_up, xp, block_idx, gs)
        d = lin.apply_linear_routed(lp.down, ops.silu_mul(gu), block_idx, gs)

    return (
        jnp.zeros((T, args.hidden_size), jnp.float32)
        .at[st].add(sw[:, None] * d[dest].astype(jnp.float32))
    )


def _run_layers(params, h, cos, sin, args, attend):
    """Run all layers; returns (h, (k_all, v_all) stacked [L, T, Hkv, D]).

    scan_layers: the scan iterates over the layer INDEX only; the stacked
    parameter pytree is captured whole and the quantized GEMM/attention
    kernels address it by scalar-prefetched index. Putting params.layers in
    the scan xs instead would make XLA dynamic-slice (copy) every layer's
    weights around each pallas_call — an extra full-model HBM round trip
    per step."""
    if args.scan_layers:
        layers = params.layers

        def body(carry, li):
            h, delta = carry
            h, delta, kv_new = _layer_forward(
                layers, li, h, delta, cos, sin, args, attend, stacked=True
            )
            return (h, delta), kv_new

        lis = jnp.arange(args.num_layers, dtype=jnp.int32)
        (h, delta), kv_new = jax.lax.scan(body, (h, jnp.zeros_like(h)), lis)
        return h + delta, kv_new
    else:
        ks, vs = [], []
        delta = jnp.zeros_like(h)
        for li in range(args.num_layers):
            lp = params.layers[li]
            h, delta, (k, v) = _layer_forward(
                lp, jnp.int32(li), h, delta, cos, sin, args, attend
            )
            ks.append(k)
            vs.append(v)
        return h + delta, (jnp.stack(ks), jnp.stack(vs))


def _lm_head(h: jax.Array, params: LlamaParams, args: LlamaArgs) -> jax.Array:
    """Vocab-column-parallel lm_head; gathers full logits across TP."""
    logits = lm_head_matmul(h, params.lm_head, args.logit_dtype)
    if args.tp_size > 1:
        logits = jax.lax.all_gather(logits, args.tp_axis, axis=1, tiled=True)
    return logits


# ---------------------------------------------------------------------------
# Prefill / decode steps
# ---------------------------------------------------------------------------


def prefill(
    params: LlamaParams,
    kv: kvc.KVCache,
    token_ids: jax.Array,  # [T] int32, packed prompts (0-padded tail)
    positions: jax.Array,  # [T] int32 position within each prompt
    segment_ids: jax.Array,  # [T] int32, 0 = padding
    page_ids: jax.Array,  # [T] int32 destination page (-1 = drop)
    slots: jax.Array,  # [T] int32 slot within page
    last_token_idx: jax.Array,  # [B] int32 index of each prompt's last token
    args: LlamaArgs,
) -> Tuple[jax.Array, kvc.KVCache]:
    """Packed varlen prefill. Returns (logits [B, V], updated kv)."""
    h = params.embed[token_ids].astype(jnp.bfloat16)
    return prefill_from_hidden(
        params, kv, h, positions, segment_ids, page_ids, slots,
        last_token_idx, args,
    )


def prefill_from_hidden(
    params: LlamaParams,
    kv: kvc.KVCache,
    h: jax.Array,  # [T, E] input embeddings (VLM path splices image embeds)
    positions: jax.Array,
    segment_ids: jax.Array,
    page_ids: jax.Array,
    slots: jax.Array,
    last_token_idx: jax.Array,
    args: LlamaArgs,
) -> Tuple[jax.Array, kvc.KVCache]:
    """Prefill from pre-built input embeddings (reference: the VLM wrappers
    call llm.forward(inputs_embeds=...), vila_llama_w8a8_unpad.py:323-365)."""
    cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)

    def attend(q, k, v, _li):
        return attention.prefill_attention(
            q, k, v, segment_ids, sliding_window=args.sliding_window
        )

    h, (k_all, v_all) = _run_layers(params, h, cos, sin, args, attend)
    # prefill: packed prompts touch at most T/ps + B distinct pages, each
    # filled from slot 0 in one consecutive run -> staged full-page writes
    T = h.shape[0]
    B = last_token_idx.shape[0]
    kv = kvc.append_all_layers(
        kv, k_all, v_all, page_ids, slots,
        args.quant.kv_bits, args.quant.kv_zero_point,
        max_stages=T // kv.page_size + B + 1,
    )
    h_last = h[last_token_idx]  # [B, E]
    h_last = ops.rmsnorm(h_last, params.final_ln, args.rms_eps)
    logits = _lm_head(h_last, params, args)
    return logits, kv


def prefill_chunk(
    params: LlamaParams,
    kv: kvc.KVCache,
    token_ids: jax.Array,  # [T] int32, ONE prompt's chunk (0-padded tail)
    positions: jax.Array,  # [T] int32 absolute positions (>= start)
    segment_ids: jax.Array,  # [T] int32, 0 = padding
    page_ids: jax.Array,  # [T] int32 destination page (-1 = drop)
    slots: jax.Array,  # [T] int32
    last_token_idx: jax.Array,  # [1] int32
    block_tables: jax.Array,  # [1, maxP] int32 — for the cached prefix
    prefix_len: jax.Array,  # [] int32: positions [0, prefix_len) are cached
    args: LlamaArgs,
) -> Tuple[jax.Array, kvc.KVCache]:
    """Prefill one chunk of a prompt whose prefix KV is already cached
    (chunked prefill / prefix compute-skip). Chunk starts are page-aligned
    (scheduler invariant), so appends still use staged full-page writes."""
    h = params.embed[token_ids].astype(jnp.bfloat16)
    return prefill_chunk_from_hidden(
        params, kv, h, positions, segment_ids, page_ids, slots,
        last_token_idx, block_tables, prefix_len, args,
    )


def prefill_chunk_from_hidden(
    params: LlamaParams,
    kv: kvc.KVCache,
    h: jax.Array,  # [T, E] input embeddings (VLM chunks splice image embeds)
    positions: jax.Array,
    segment_ids: jax.Array,
    page_ids: jax.Array,
    slots: jax.Array,
    last_token_idx: jax.Array,
    block_tables: jax.Array,
    prefix_len: jax.Array,
    args: LlamaArgs,
) -> Tuple[jax.Array, kvc.KVCache]:
    cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)

    def attend(q, k, v, li):
        return attention.prefix_prefill_attention(
            q, k, v, segment_ids, positions, kv, block_tables, prefix_len,
            li, args.quant.kv_bits, sliding_window=args.sliding_window,
        )

    h, (k_all, v_all) = _run_layers(params, h, cos, sin, args, attend)
    T = h.shape[0]
    kv = kvc.append_all_layers(
        kv, k_all, v_all, page_ids, slots,
        args.quant.kv_bits, args.quant.kv_zero_point,
        max_stages=T // kv.page_size + 2,
    )
    h_last = h[last_token_idx]  # [1, E]
    h_last = ops.rmsnorm(h_last, params.final_ln, args.rms_eps)
    logits = _lm_head(h_last, params, args)
    return logits, kv


def prefill_chunk_with_decode(
    params: LlamaParams,
    kv: kvc.KVCache,
    token_ids: jax.Array,  # [T] int32, ONE prompt's chunk (0-padded tail)
    positions: jax.Array,  # [T] int32 absolute positions (>= start)
    segment_ids: jax.Array,  # [T] int32, 0 = padding
    page_ids: jax.Array,  # [T] int32 destination page (-1 = drop)
    slots: jax.Array,  # [T] int32
    last_token_idx: jax.Array,  # [1] int32
    chunk_tables: jax.Array,  # [1, maxP] int32 — the chunk's cached prefix
    prefix_len: jax.Array,  # [] int32
    d_token_ids: jax.Array,  # [B] int32 decode batch current tokens
    d_block_tables: jax.Array,  # [B, maxP] int32
    d_context_lens: jax.Array,  # [B] int32 incl. current token; 0 = pad row
    args: LlamaArgs,
) -> Tuple[jax.Array, kvc.KVCache]:
    """One prefill chunk AND a decode batch in a single fused step.

    The chunk's [T] tokens and the decode batch's [B] tokens run as one
    packed [T+B] stream through every GEMM — the chunk already streams the
    full weights through the MXU, so the decode rows' GEMM share is ~free.
    Measured (benchmarks/mixed_step.py, B=128/T=2048/8B): the decode batch
    adds 19.1 ms to a 190.6 ms chunk step vs 22.7 ms standalone — decode
    ATTENTION is its own DMA wall and cannot ride along; the win is the
    ~3.6 ms/step of GEMM+dispatch share plus the scheduling property that
    running sequences keep generating while a long prompt admits (the
    reference schedules prompt steps exclusively, scheduler.py:279-285,
    stalling decodes for the whole admission). Attention splits by row
    span: rows [:T] take the prefix-chunk kernel, rows [T:] the paged
    decode kernel. Returns (logits [1+B, V], kv): row 0 = chunk last token
    (only meaningful on the final chunk), rows 1: = decode rows.
    """
    T = token_ids.shape[0]
    ps = kv.page_size
    d_positions = d_context_lens - 1  # [B]; -1 on pad rows (inactive)
    active = d_context_lens > 0
    logical_page = jnp.where(active, d_positions // ps, 0)
    d_page_ids = jnp.where(
        active,
        jnp.take_along_axis(d_block_tables, logical_page[:, None], axis=1)[:, 0],
        -1,
    )
    d_slots = jnp.where(active, d_positions % ps, 0)

    h = params.embed[
        jnp.concatenate([token_ids, d_token_ids])
    ].astype(jnp.bfloat16)
    cos, sin = rope.rope_cos_sin(
        jnp.concatenate([positions, d_positions]), args.head_dim,
        args.rope_theta,
    )

    def attend(q, k, v, li):
        oc = attention.prefix_prefill_attention(
            q[:T], k[:T], v[:T], segment_ids, positions, kv, chunk_tables,
            prefix_len, li, args.quant.kv_bits,
            sliding_window=args.sliding_window,
        )
        od = attention.paged_decode_attention(
            q[T:], kv, d_block_tables, d_context_lens, li, k[T:], v[T:],
            args.quant.kv_bits, sliding_window=args.sliding_window,
        )
        return jnp.concatenate([oc, od], axis=0)

    h, (k_all, v_all) = _run_layers(params, h, cos, sin, args, attend)
    # chunk rows: page-aligned staged full-page writes; decode rows: one
    # token per exclusively-owned page (RMW scatter kernel)
    kv = kvc.append_all_layers(
        kv, k_all[:, :T], v_all[:, :T], page_ids, slots,
        args.quant.kv_bits, args.quant.kv_zero_point,
        max_stages=T // ps + 2,
    )
    kv = kvc.append_all_layers(
        kv, k_all[:, T:], v_all[:, T:], d_page_ids, d_slots,
        args.quant.kv_bits, args.quant.kv_zero_point, unique_pages=True,
    )
    h_sel = jnp.concatenate([h[last_token_idx], h[T:]], axis=0)  # [1+B, E]
    h_sel = ops.rmsnorm(h_sel, params.final_ln, args.rms_eps)
    logits = _lm_head(h_sel, params, args)
    return logits, kv


def decode(
    params: LlamaParams,
    kv: kvc.KVCache,
    token_ids: jax.Array,  # [B] int32 current tokens
    block_tables: jax.Array,  # [B, maxP] int32
    context_lens: jax.Array,  # [B] int32 INCLUDING the current token; 0 = pad row
    args: LlamaArgs,
) -> Tuple[jax.Array, kvc.KVCache]:
    """One decode step for a batch. Returns (logits [B, V], updated kv).

    The layer loop reads the cache (positions < ctx-1) and self-attends the
    current token's fresh K/V inside the attention kernel; the appends for
    all layers batch into ONE scatter afterwards — the stacked cache arrays
    are never sliced or copied per layer.
    """
    B = token_ids.shape[0]
    ps = kv.page_size
    positions = context_lens - 1  # [B]
    active = context_lens > 0
    logical_page = jnp.where(active, positions // ps, 0)
    page_ids = jnp.where(
        active,
        jnp.take_along_axis(block_tables, logical_page[:, None], axis=1)[:, 0],
        -1,
    )
    slots = jnp.where(active, positions % ps, 0)

    h = params.embed[token_ids].astype(jnp.bfloat16)
    cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)

    def attend(q, k, v, li):
        return attention.paged_decode_attention(
            q, kv, block_tables, context_lens, li, k, v, args.quant.kv_bits,
            sliding_window=args.sliding_window,
        )

    h, (k_all, v_all) = _run_layers(params, h, cos, sin, args, attend)
    # decode: one token per sequence, each owning its last page exclusively
    kv = kvc.append_all_layers(
        kv, k_all, v_all, page_ids, slots,
        args.quant.kv_bits, args.quant.kv_zero_point, unique_pages=True,
    )
    h = ops.rmsnorm(h, params.final_ln, args.rms_eps)
    logits = _lm_head(h, params, args)
    return logits, kv


# ---------------------------------------------------------------------------
# Teacher-forced scoring (perplexity evaluation)
# ---------------------------------------------------------------------------


def teacher_forced_nll(
    params: LlamaParams,
    token_ids: jax.Array,  # [T] int32, one sequence (0-padded tail)
    length: jax.Array,  # scalar int32: number of valid tokens
    args: LlamaArgs,
    row_chunk: int = 256,
    simulate_kv_quant: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Sum of -log p(token[t+1] | tokens[:t+1]) for t+1 < length.

    Runs the full quantized serving forward (same kernels as prefill) without
    touching a KV cache, then folds the lm_head + cross-entropy over row
    chunks so the [T, V] logits never materialize at once. Returns
    (nll_sum f32, count i32). Mirrors the reference's accuracy protocol
    (README.md:371-389, WikiText-2, eval seqlen 2048 — evaluated externally
    by DeepCompressor there; in-framework here).

    simulate_kv_quant=True additionally round-trips every K/V through the
    serving KV quantizer (per-token-per-head asymmetric, args.quant.kv_bits)
    before attention, so the measured ΔPPL covers the full W4A8KV4 claim,
    not just the weight/activation part.
    """
    T = token_ids.shape[0]
    assert T % row_chunk == 0, f"T={T} not a multiple of row_chunk={row_chunk}"
    positions = jnp.arange(T, dtype=jnp.int32)
    valid = positions < length
    segment_ids = jnp.where(valid, 1, 0)

    h = params.embed[token_ids].astype(jnp.bfloat16)
    cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)

    def kv_roundtrip(x):
        from qserve_tpu.quant import qoq

        q, scale, zero = qoq.quantize_kv(
            x.astype(jnp.float32), bits=args.quant.kv_bits,
            asymmetric=args.quant.kv_zero_point,
        )
        # q carries unsigned lattice values in a two's-complement byte;
        # dequantize_kv applies the & 0xFF view (plain astype would
        # sign-extend UINT8 values > 127)
        return qoq.dequantize_kv(q, scale, zero).astype(x.dtype)

    def attend(q, k, v, _li):
        if simulate_kv_quant:
            k = kv_roundtrip(k)
            v = kv_roundtrip(v)
        return attention.prefill_attention(
            q, k, v, segment_ids, sliding_window=args.sliding_window
        )

    h, _ = _run_layers(params, h, cos, sin, args, attend)
    h = ops.rmsnorm(h, params.final_ln, args.rms_eps)

    targets = jnp.roll(token_ids, -1)  # target[t] = token[t+1]
    pred_mask = (positions + 1 < length).astype(jnp.float32)

    hc = h.reshape(T // row_chunk, row_chunk, args.hidden_size)
    tc = targets.reshape(T // row_chunk, row_chunk)
    mc = pred_mask.reshape(T // row_chunk, row_chunk)

    def body(nll, xs):
        h_c, t_c, m_c = xs
        logits = lm_head_matmul(h_c, params.lm_head, jnp.float32)
        if args.tp_size > 1:
            logits = jax.lax.all_gather(logits, args.tp_axis, axis=1, tiled=True)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tl = jnp.take_along_axis(logits, t_c[:, None], axis=-1)[:, 0]
        return nll + jnp.sum((lse - tl) * m_c), None

    nll, _ = jax.lax.scan(body, jnp.float32(0.0), (hc, tc, mc))
    count = jnp.maximum(length - 1, 0)
    return nll, count


# ---------------------------------------------------------------------------
# Float reference forward (for parity tests; no cache, full logits)
# ---------------------------------------------------------------------------


def reference_forward_float(
    float_params: dict, args: LlamaArgs, token_ids: jax.Array
) -> jax.Array:
    """Plain fp32 forward of the same architecture on one sequence [T]."""
    T = token_ids.shape[0]
    E = args.hidden_size
    h = jnp.asarray(float_params["embed"], jnp.float32)[token_ids]
    positions = jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope.rope_cos_sin(positions, args.head_dim, args.rope_theta)

    def rms(x, w):
        v = jnp.mean(x * x, axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(v + args.rms_eps) * w

    def moe_mlp(x, fl):
        logits = x @ fl["router"]
        probs = jax.nn.softmax(logits, axis=-1)
        topv, topi = jax.lax.top_k(probs, args.moe_top_k)
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        out = jnp.zeros_like(x)
        for e in range(args.num_experts):
            gu = x @ fl["experts_gate_up"][e]
            g, u = jnp.split(gu, 2, axis=-1)
            d = (jax.nn.silu(g) * u) @ fl["experts_down"][e]
            w = jnp.sum(jnp.where(topi == e, topv, 0.0), axis=-1)
            out = out + w[:, None] * d
        return out

    for fl in float_params["layers"]:
        x = rms(h, fl["input_ln"])
        qkv = x @ fl["qkv"]
        q, k, v = jnp.split(qkv, [args.q_size, args.q_size + args.kv_size], axis=-1)
        q = rope.apply_rope(q.reshape(T, args.num_heads, args.head_dim), cos, sin)
        k = rope.apply_rope(k.reshape(T, args.num_kv_heads, args.head_dim), cos, sin)
        v = v.reshape(T, args.num_kv_heads, args.head_dim)
        seg = jnp.ones((T,), jnp.int32)
        attn = attention.prefill_attention(q, k, v, seg)
        h = h + attn.reshape(T, -1) @ fl["o"]
        x = rms(h, fl["post_ln"])
        if args.num_experts > 0:
            h = h + moe_mlp(x, fl)
        else:
            gu = x @ fl["gate_up"]
            g, u = jnp.split(gu, 2, axis=-1)
            h = h + (jax.nn.silu(g) * u) @ fl["down"]
    h = rms(h, float_params["final_ln"])
    return h @ float_params["lm_head"]
