"""Sampler tests: the sort-free threshold-bisection sampler must match
the exact full-sort semantics (support sets and probabilities), including
heavy-tail near-uniform rows where the kept set is very wide."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.layers import sampler


def _kept_set_reference(logits, temp, top_p, top_k):
    """Exact numpy kept-set + renormalized probs for one row."""
    scaled = logits.astype(np.float64) / max(temp, 1e-6)
    V = scaled.shape[0]
    k = V if top_k <= 0 else min(top_k, V)
    order = np.argsort(scaled)[::-1]
    kth = scaled[order[k - 1]]
    keep = scaled >= kth
    masked = np.where(keep, scaled, -np.inf)
    # nucleus on the k-masked, renormalized distribution
    m = masked[order]
    p = np.exp(m - np.max(m[np.isfinite(m)]))
    p = np.where(np.isfinite(m), p, 0.0)
    p = p / p.sum()
    cum = np.cumsum(p)
    cutoff = (cum - p) < top_p
    finite = np.isfinite(m) & cutoff
    thresh = np.min(m[finite])
    keep = masked >= thresh
    probs = np.where(keep, np.exp(scaled - scaled.max()), 0.0)
    probs = probs / probs.sum()
    return keep, probs


def _draw(logits, temp, topp, topk, n, seed=0):
    B = n
    l = jnp.tile(jnp.asarray(logits, jnp.float32)[None, :], (B, 1))
    toks = sampler.sample(
        l,
        jnp.full((B,), temp, jnp.float32),
        jnp.full((B,), topp, jnp.float32),
        jnp.full((B,), topk, jnp.int32),
        jax.random.PRNGKey(seed),
    )
    return np.asarray(toks)


class TestGreedy:
    def test_greedy_equals_argmax(self):
        rng = np.random.default_rng(0)
        logits = rng.standard_normal((8, 512)).astype(np.float32)
        toks = sampler.sample(
            jnp.asarray(logits),
            jnp.zeros(8), jnp.ones(8), jnp.zeros(8, jnp.int32),
            jax.random.PRNGKey(1),
        )
        np.testing.assert_array_equal(np.asarray(toks), logits.argmax(-1))


class TestSampleExactness:
    """V=512 keeps the oracle cheap while exercising wide kept sets."""

    @pytest.mark.parametrize(
        "temp,topp,topk",
        [
            (0.8, 0.9, 0),    # nucleus closes inside C
            (1.0, 1.0, 50),   # top-k inside C, nucleus off
            (0.7, 0.95, 20),  # both filters
            (1.2, 1.0, 0),    # raw temperature sampling (no filters)
            (0.9, 0.9, 300),  # wide top-k plus nucleus
        ],
    )
    def test_support_and_distribution(self, temp, topp, topk):
        rng = np.random.default_rng(3)
        # peaked but not degenerate distribution
        logits = (rng.standard_normal(512) * 2.0).astype(np.float32)
        keep, probs = _kept_set_reference(logits, temp, topp, topk)
        n = 4000
        toks = _draw(logits, temp, topp, topk, n)
        assert keep[toks].all(), "sampled token outside the exact kept set"
        # empirical frequency of the modal token within statistical noise
        mode = int(np.argmax(probs))
        p_mode = probs[mode]
        emp = (toks == mode).mean()
        tol = 4 * np.sqrt(p_mode * (1 - p_mode) / n) + 1e-3
        assert abs(emp - p_mode) < tol, (emp, p_mode, tol)

    def test_heavy_tail_wide_kept_set(self):
        """Near-uniform logits: the nucleus spans most of the vocab; the
        kept set must still match the exact full-vocab nucleus."""
        rng = np.random.default_rng(5)
        logits = (rng.standard_normal(512) * 0.01).astype(np.float32)
        temp, topp, topk = 1.0, 0.99, 0
        keep, probs = _kept_set_reference(logits, temp, topp, topk)
        assert keep.sum() > 256  # kept set far wider than any candidate window
        toks = _draw(logits, temp, topp, topk, 2000, seed=7)
        assert keep[toks].all()
        # draws genuinely spread over the wide kept set
        assert len(np.unique(toks)) > 128

    def test_mixed_batch_rows_independent(self):
        rng = np.random.default_rng(8)
        logits = (rng.standard_normal((3, 512)) * 2).astype(np.float32)
        toks = sampler.sample(
            jnp.asarray(logits),
            jnp.asarray([0.0, 0.8, 1.0], jnp.float32),
            jnp.asarray([1.0, 0.9, 1.0], jnp.float32),
            jnp.asarray([0, 0, 40], jnp.int32),
            jax.random.PRNGKey(2),
        )
        toks = np.asarray(toks)
        assert toks[0] == logits[0].argmax()
        keep1, _ = _kept_set_reference(logits[1], 0.8, 0.9, 0)
        keep2, _ = _kept_set_reference(logits[2], 1.0, 1.0, 40)
        assert keep1[toks[1]] and keep2[toks[2]]

    def test_small_vocab_unaffected(self):
        """Small vocab: spot-check support."""
        rng = np.random.default_rng(9)
        logits = (rng.standard_normal(64) * 2).astype(np.float32)
        keep, _ = _kept_set_reference(logits, 0.7, 0.8, 5)
        toks = _draw(logits, 0.7, 0.8, 5, 1000, seed=3)
        assert keep[toks].all()


class TestThresholdMask:
    """The bisection slow path must keep EXACTLY the sorted-rule sets."""

    def _mask(self, logits, topp, topk):
        B = logits.shape[0]
        out = sampler.threshold_mask(
            jnp.asarray(logits, jnp.float32),
            jnp.full((B,), topp, jnp.float32),
            jnp.full((B,), topk, jnp.int32),
        )
        return np.asarray(out) > sampler.NEG_INF / 2

    @pytest.mark.parametrize(
        "topp,topk,scale",
        [
            (0.9, 0, 2.0),     # nucleus only, peaked
            (0.99, 0, 0.01),   # near-uniform heavy tail (the slow case)
            (1.0, 40, 1.0),    # top-k only
            (0.95, 20, 1.5),   # both
            (1.0, 0, 1.0),     # keep-all (raw)
            (0.0, 0, 2.0),     # degenerate p -> keeps the argmax only
        ],
    )
    def test_kept_sets_match_sorted_rule(self, topp, topk, scale):
        rng = np.random.default_rng(11)
        logits = (rng.standard_normal((4, 512)) * scale).astype(np.float32)
        got = self._mask(logits, topp, topk)
        for b in range(4):
            want, _ = _kept_set_reference(logits[b], 1.0, max(topp, 1e-9), topk)
            np.testing.assert_array_equal(
                got[b], want, err_msg=f"row {b} topp={topp} topk={topk}"
            )

    def test_ties_at_the_boundary_keep_all_ties(self):
        # 5 equal logits at the top; top_k=3 must keep all 5 (the
        # reference's `scaled >= kth` semantics keeps kth-value ties)
        logits = np.full((1, 64), -4.0, np.float32)
        logits[0, :5] = 1.0
        got = self._mask(logits, 1.0, 3)
        assert got[0, :5].all() and not got[0, 5:].any()

    def test_threshold_sampling_support(self):
        """Draws from _sample_threshold stay inside the exact kept set."""
        rng = np.random.default_rng(13)
        logits = (rng.standard_normal(512) * 0.01).astype(np.float32)
        keep, _ = _kept_set_reference(logits, 1.0, 0.97, 0)
        l = jnp.tile(jnp.asarray(logits)[None, :], (1024, 1))
        toks = np.asarray(
            sampler._sample_threshold(
                l, jnp.full((1024,), 0.97), jnp.zeros((1024,), jnp.int32),
                jax.random.PRNGKey(3),
            )
        )
        assert keep[toks].all()
        assert len(np.unique(toks)) > 128
