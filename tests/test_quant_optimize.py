"""Tests for activation-aware scale optimization (quant/optimize.py).

Covers: float-exactness of every smoothing fold, quantization-error
reduction on an outlier-heavy synthetic model, clip-search monotonicity,
and the RoPE-commutation property of SmoothAttention's pair-shared lambda.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.config import QuantSpec
from qserve_tpu.models import llama
from qserve_tpu.quant import optimize, qoq


def _args(gs=-1, wb=4):
    return llama.LlamaArgs(
        vocab_size=384,
        hidden_size=128,
        intermediate_size=256,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        quant=QuantSpec.from_precision(
            "w4a8kv4" if wb == 4 else "w8a8kv8", gs
        ),
    )


def _fp_with_outliers(key, args, outlier_mag=30.0):
    """Float params whose hidden activations develop outlier channels (the
    regime SmoothQuant exists for): embedding columns get a heavy-tailed
    per-channel scale."""
    fp = llama.random_float_params(key, args)
    E = args.hidden_size
    chan = jax.random.uniform(jax.random.PRNGKey(99), (E,)) < 0.05
    boost = jnp.where(chan, outlier_mag, 1.0)
    fp["embed"] = fp["embed"] * boost[None, :]
    return fp


def _windows(args, n=4, T=64):
    rng = np.random.RandomState(0)
    return rng.randint(0, args.vocab_size, size=(n, T)).astype(np.int32)


def _logits(fp, args, toks):
    return llama.reference_forward_float(fp, args, jnp.asarray(toks, jnp.int32))


class TestSmoothingExactness:
    """Every fold must be a float no-op on the model function."""

    @pytest.mark.parametrize("flags", [
        dict(smooth_attn=False, smooth_v=False),
        dict(smooth_attn=True, smooth_v=False),
        dict(smooth_attn=False, smooth_v=True),
        dict(smooth_attn=True, smooth_v=True),
    ])
    def test_fold_preserves_float_forward(self, flags):
        args = _args()
        fp = _fp_with_outliers(jax.random.PRNGKey(0), args)
        win = _windows(args)
        stats = optimize.calibrate(fp, args, win, batch=4)
        toks = win[0]
        base = _logits(fp, args, toks)
        fp2 = dict(fp)
        fp2["layers"] = [
            optimize.smooth_layer(fl, st, args, **flags)[0]
            for fl, st in zip(fp["layers"], stats)
        ]
        out = _logits(fp2, args, toks)
        # bf16-free fp32 forward: folds are exact up to f32 rounding
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), rtol=2e-4, atol=2e-4
        )

    def test_smooth_flattens_act_range(self):
        """Post-fold qkv-input absmax spread must shrink."""
        args = _args()
        fp = _fp_with_outliers(jax.random.PRNGKey(0), args)
        win = _windows(args)
        stats = optimize.calibrate(fp, args, win, batch=4)
        fp2 = dict(fp)
        fp2["layers"] = [
            optimize.smooth_layer(fl, st, args)[0]
            for fl, st in zip(fp["layers"], stats)
        ]
        stats2 = optimize.calibrate(fp2, args, win, batch=4)

        def spread(a):
            a = np.maximum(np.asarray(a), 1e-6)
            return a.max() / np.median(a)

        s_before = spread(stats[0].qkv_in_amax)
        s_after = spread(stats2[0].qkv_in_amax)
        assert s_after < s_before * 0.5, (s_before, s_after)


class TestRopePairSharing:
    def test_lambda_commutes_with_rope(self):
        """Pair-shared lambda applied pre-RoPE == applied post-RoPE."""
        from qserve_tpu.layers import rope

        D, T, H = 32, 8, 2
        key = jax.random.PRNGKey(3)
        x = jax.random.normal(key, (T, H, D), jnp.float32)
        lam_half = jax.random.uniform(
            jax.random.PRNGKey(4), (H, D // 2), minval=0.5, maxval=2.0
        )
        lam = jnp.concatenate([lam_half, lam_half], axis=-1)  # pair-shared
        pos = jnp.arange(T, dtype=jnp.int32)
        cos, sin = rope.rope_cos_sin(pos, D, 10000.0)
        a = rope.apply_rope(x * lam[None], cos, sin)
        b = rope.apply_rope(x, cos, sin) * lam[None]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_unshared_lambda_does_not_commute(self):
        """Sanity: without pair sharing the fold would be wrong."""
        from qserve_tpu.layers import rope

        D, T, H = 32, 8, 1
        x = jax.random.normal(jax.random.PRNGKey(5), (T, H, D), jnp.float32)
        lam = jnp.linspace(0.5, 2.0, D).reshape(1, D)
        pos = jnp.arange(T, dtype=jnp.int32)
        cos, sin = rope.rope_cos_sin(pos, D, 10000.0)
        a = rope.apply_rope(x * lam[None], cos, sin)
        b = rope.apply_rope(x, cos, sin) * lam[None]
        assert float(jnp.max(jnp.abs(a - b))) > 1e-2


class TestClipSearch:
    def test_clip_reduces_weighted_error(self):
        """Outlier weights sitting on *low-activation* input channels can be
        clipped almost for free, shrinking every column's quantization range:
        exactly the regime the act-weighted objective exists for."""
        key = jax.random.PRNGKey(7)
        K, N = 256, 128
        w = jax.random.normal(key, (K, N))
        # rows 0-3 carry 20-sigma weight outliers but near-zero activation
        w = w.at[:4, :].multiply(20.0)
        act_ms = jnp.ones((K,), jnp.float32).at[:4].set(1e-4)

        def werr(wq_src):
            p = qoq.quantize_weight_per_channel(wq_src)
            deq = qoq.dequantize_per_channel(p)
            return float(jnp.sum(act_ms[:, None] * (deq - w.astype(jnp.float32)) ** 2))

        base = werr(w)
        clipped = optimize.clip_weight(w, act_ms, bits=4, group_size=-1, min_ratio=0.05)
        assert werr(clipped) < base * 0.2, (base, werr(clipped))

    def test_clip_never_hurts_with_ratio_one_in_grid(self):
        """Grid includes ratio 1.0, so clip error <= RTN error by design
        (evaluated on the proxy objective)."""
        w = jax.random.normal(jax.random.PRNGKey(9), (128, 64))
        act_ms = jnp.abs(jax.random.normal(jax.random.PRNGKey(10), (128,))) + 0.1

        def proxy_err(wc):
            p = qoq.quantize_weight_per_channel(wc)
            deq = qoq.dequantize_per_channel(p)
            return float(
                jnp.sum(act_ms[:, None] * (deq - w.astype(jnp.float32)) ** 2)
            )

        base = proxy_err(w)
        clipped = optimize.clip_weight(w, act_ms, bits=4, group_size=-1)
        assert proxy_err(clipped) <= base * 1.01

    def test_group_clip_shapes(self):
        w = jax.random.normal(jax.random.PRNGKey(11), (256, 64))
        act_ms = jnp.ones((256,))
        out = optimize.clip_weight(w, act_ms, bits=4, group_size=128)
        assert out.shape == w.shape
        # clipped values never exceed the original range
        assert float(jnp.max(jnp.abs(out))) <= float(jnp.max(jnp.abs(w))) + 1e-6


class TestEndToEnd:
    @pytest.mark.parametrize("gs", [-1, 32])
    def test_optimized_quant_beats_rtn(self, gs):
        """Full pipeline on an outlier-heavy model: quantized-model logit
        error vs the float model must drop vs plain RTN."""
        args = _args(gs=gs)
        fp = _fp_with_outliers(jax.random.PRNGKey(0), args, outlier_mag=40.0)
        win = _windows(args, n=4, T=64)
        fp_opt = optimize.optimize_float_params(
            fp, args, win, calib_batch=4, clip_grid=8
        )
        toks = win[0]
        ref = np.asarray(_logits(fp, args, toks), np.float32)

        def quant_err(fpx):
            p = llama.quantize_params(fpx, args)
            nll_ref = None
            out = _quantized_logits(p, args, toks)
            return float(np.mean((np.asarray(out, np.float32) - ref) ** 2))

        e_rtn = quant_err(fp)
        e_opt = quant_err(fp_opt)
        assert e_opt < e_rtn, (e_rtn, e_opt)

    def test_optimize_rejects_moe(self):
        import dataclasses

        args = dataclasses.replace(_args(), num_experts=4)
        with pytest.raises(NotImplementedError):
            optimize.optimize_float_params({}, args, np.zeros((1, 8), np.int32))


def _quantized_logits(params, args, toks):
    """Teacher-forced quantized forward -> full logits (tiny T, direct)."""
    from qserve_tpu.kernels import attention, ops
    from qserve_tpu.layers import rope as rope_mod

    T = len(toks)
    token_ids = jnp.asarray(toks, jnp.int32)
    h = params.embed[token_ids].astype(jnp.bfloat16)
    positions = jnp.arange(T, dtype=jnp.int32)
    cos, sin = rope_mod.rope_cos_sin(positions, args.head_dim, args.rope_theta)
    seg = jnp.ones((T,), jnp.int32)

    def attend(q, k, v, _li):
        return attention.prefill_attention(q, k, v, seg)

    h, _ = llama._run_layers(params, h, cos, sin, args, attend)
    h = ops.rmsnorm(h, params.final_ln, args.rms_eps)
    return ops.matmul(h, params.lm_head, jnp.float32)
