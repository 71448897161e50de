"""Pallas sampler kernel (interpret mode) vs the XLA threshold sampler.

The kernel must draw only from the EXACT top-k/top-p kept sets (the
integer-key bisection's whole point) with the right renormalized
probabilities; layers/sampler.threshold_mask is the oracle for kept sets
(itself golden-tested against the full-sort rule in test_sampler.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qserve_tpu.kernels import pallas_sampler as ps
from qserve_tpu.layers import sampler


def _keep_of(masked):
    """threshold_mask returns masked logits; kept = not NEG_INF."""
    return np.asarray(masked) > sampler.NEG_INF / 2


def _draw_many(logits_row, topp, topk, n_keys, temp=0.8):
    """Tile a row to a [64, V] batch and draw with n_keys different keys."""
    B = 64
    V = logits_row.shape[0]
    scaled = jnp.tile(
        jnp.asarray(logits_row, jnp.float32)[None, :] / temp, (B, 1)
    )
    tp = jnp.full((B,), topp, jnp.float32)
    tk = jnp.full((B,), topk, jnp.int32)
    toks = []
    for s in range(n_keys):
        out = ps._sample_filtered_dispatch(
            scaled, tp, tk, jax.random.PRNGKey(s)
        )
        assert out is not None
        toks.append(np.asarray(out))
    return np.concatenate(toks), scaled


class TestKeptSets:
    @pytest.mark.parametrize("topp,topk", [
        (0.9, 0), (1.0, 17), (0.7, 40), (0.95, 3), (0.5, 0),
    ])
    def test_support_inside_exact_kept_set(self, topp, topk):
        rng = np.random.default_rng(topk * 100 + int(topp * 10))
        row = rng.normal(0, 3, 512).astype(np.float32)
        toks, scaled = _draw_many(row, topp, topk, n_keys=4)
        keep = _keep_of(sampler.threshold_mask(
            scaled[:1], jnp.asarray([topp]), jnp.asarray([topk], jnp.int32)
        ))[0]
        assert keep[toks].all(), "kernel sampled outside the exact kept set"
        # and it does explore the set, not just the mode (a tiny kept set
        # caps the reachable uniques at its own size)
        assert len(np.unique(toks)) >= min(3, keep.sum())

    def test_heavy_tail_wide_kept_set(self):
        # near-uniform row: nucleus keeps most of the vocabulary; candidate
        # -window samplers break here, the bisection must not
        rng = np.random.default_rng(7)
        row = rng.normal(0, 0.05, 1024).astype(np.float32)
        toks, scaled = _draw_many(row, 0.95, 0, n_keys=4)
        keep = _keep_of(sampler.threshold_mask(
            scaled[:1], jnp.asarray([0.95]), jnp.asarray([0], jnp.int32)
        ))[0]
        assert keep.sum() > 512
        assert keep[toks].all()
        assert len(np.unique(toks)) > 128

    def test_ties_at_the_kth_value_keep_all_ties(self):
        # 5-way tie at the top, then a gap: top_k=2 must keep all 5 ties
        # (reference `scaled >= kth` semantics), and top_p tiny keeps the
        # tie block too
        row = np.full(512, -20.0, np.float32)
        row[:5] = 4.0
        toks, _ = _draw_many(row, 1.0, 2, n_keys=4, temp=1.0)
        assert set(np.unique(toks)) <= set(range(5))
        assert len(np.unique(toks)) == 5  # all ties reachable

    def test_mode_probability(self):
        rng = np.random.default_rng(3)
        row = rng.normal(0, 2, 256).astype(np.float32)
        topp = 0.9
        toks, scaled = _draw_many(row, topp, 0, n_keys=12)
        keep = _keep_of(sampler.threshold_mask(
            scaled[:1], jnp.asarray([topp]), jnp.asarray([0], jnp.int32)
        ))[0]
        s = np.asarray(scaled[0], np.float64)
        probs = np.where(keep, np.exp(s - s.max()), 0.0)
        probs /= probs.sum()
        mode = probs.argmax()
        emp = (toks == mode).mean()
        n = toks.shape[0]
        tol = 5 * np.sqrt(probs[mode] * (1 - probs[mode]) / n) + 0.01
        assert abs(emp - probs[mode]) < tol, (emp, probs[mode], tol)

    def test_rows_independent_and_heterogeneous(self):
        # row 0: top_k=1 (argmax forced); row 1: top_p=0.9; rows get
        # different draws from the same kernel call
        rng = np.random.default_rng(11)
        logits = rng.normal(0, 3, (8, 512)).astype(np.float32)
        scaled = jnp.asarray(logits)
        tp = jnp.asarray([1.0, 0.9] * 4, jnp.float32)
        tk = jnp.asarray([1, 0] * 4, jnp.int32)
        out = ps._sample_filtered_dispatch(
            scaled, tp, tk, jax.random.PRNGKey(0)
        )
        toks = np.asarray(out)
        for i in range(0, 8, 2):
            assert toks[i] == logits[i].argmax()
        keep = _keep_of(sampler.threshold_mask(scaled, tp, tk))
        assert all(keep[i, toks[i]] for i in range(8))


class TestDispatch:
    def test_unsupported_shapes_return_none(self):
        key = jax.random.PRNGKey(0)
        tp = jnp.full((12,), 0.9)
        tk = jnp.zeros((12,), jnp.int32)
        # B not a multiple of the row block
        assert ps._sample_filtered_dispatch(
            jnp.zeros((12, 512)), tp, tk, key) is None
        # V not lane-aligned
        assert ps._sample_filtered_dispatch(
            jnp.zeros((16, 500)), tp[:16], tk[:16], key) is None

    def test_sample_routes_through_kernel(self, monkeypatch):
        # with the registry forced on, sampler.sample must land in the
        # Pallas dispatcher for filtered rows
        from qserve_tpu.kernels import ops

        monkeypatch.setenv("QSERVE_TPU_FORCE_PALLAS", "1")
        ops.use_pallas.cache_clear()
        try:
            calls = []
            orig = ps._sample_filtered_dispatch

            def spy(*a, **k):
                calls.append(1)
                return orig(*a, **k)

            monkeypatch.setitem(
                ops._PALLAS_REGISTRY, "sample_filtered", spy
            )
            rng = np.random.default_rng(0)
            logits = jnp.asarray(rng.normal(0, 2, (8, 512)), jnp.float32)
            toks = sampler.sample(
                logits, jnp.full((8,), 0.7), jnp.full((8,), 0.9),
                jnp.zeros((8,), jnp.int32), jax.random.PRNGKey(5),
            )
            assert calls, "Pallas sampler was not dispatched"
            keep = _keep_of(sampler.threshold_mask(
                logits / 0.7, jnp.full((8,), 0.9), jnp.zeros((8,), jnp.int32)
            ))
            t = np.asarray(toks)
            assert all(keep[i, t[i]] for i in range(8))
        finally:
            ops.use_pallas.cache_clear()
