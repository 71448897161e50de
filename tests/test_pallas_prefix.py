"""Parity tests: Pallas chunked-prefill/prefix attention (interpret) vs the
bounded-memory XLA fallback in kernels/attention.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import attention, kv_cache as kvc
from qserve_tpu.kernels import pallas_prefix_attention as ppx


def build_prefix_cache(key, L, S, H, D, ps, kv_bits, num_pages):
    """One sequence's prefix of S tokens in pages [0..ceil(S/ps))."""
    cache = kvc.create_kv_cache(L, num_pages, H, ps, D, kv_bits)
    maxP = num_pages
    bt = np.zeros((1, maxP), np.int32)
    npages = max(-(-S // ps), 1)
    bt[0, :npages] = np.arange(npages)
    if S > 0:
        k = jax.random.normal(key, (L, S, H, D), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(key, 1), (L, S, H, D),
                              jnp.float32)
        page_ids = jnp.asarray([i // ps for i in range(S)], jnp.int32)
        slots = jnp.asarray([i % ps for i in range(S)], jnp.int32)
        cache = kvc.append_all_layers(cache, k, v, page_ids, slots, kv_bits,
                                      True)
    return cache, jnp.asarray(bt)


def make_chunk(key, T, n_live, Hq, Hkv, D, prefix_len):
    q = jax.random.normal(key, (T, Hq, D), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (T, Hkv, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (T, Hkv, D), jnp.float32)
    seg = np.zeros(T, np.int32)
    seg[:n_live] = 1
    pos = np.zeros(T, np.int32)
    pos[:n_live] = prefix_len + np.arange(n_live)
    return q, k, v, jnp.asarray(seg), jnp.asarray(pos)


def run_both(cache, bt, q, k, v, seg, pos, prefix_len, li, kv_bits,
             window=None):
    D = q.shape[-1]
    ref = attention.prefix_prefill_attention(
        q, k, v, seg, pos, cache, bt, jnp.int32(prefix_len), jnp.int32(li),
        kv_bits, sliding_window=window,
    )
    out = ppx.prefix_prefill_attention_pallas(
        q, k, v, pos, seg, cache.data, cache.scales, bt,
        jnp.int32(prefix_len), jnp.int32(li), kv_bits == 4, 1.0 / D ** 0.5,
        window=int(window or 0), bt=min(256, q.shape[0]),
    )
    return np.asarray(ref, np.float32), np.asarray(out, np.float32)


class TestPrefixAttentionParity:
    @pytest.mark.parametrize("kv_bits", [4, 8])
    @pytest.mark.parametrize("prefix_len", [0, 64, 97])
    def test_matches_fallback(self, kv_bits, prefix_len):
        L, Hq, Hkv, D, ps = 2, 4, 2, 128, 64
        T, n_live = 128, 100
        key = jax.random.PRNGKey(0)
        cache, bt = build_prefix_cache(
            key, L, prefix_len, Hkv, D, ps, kv_bits, num_pages=8
        )
        q, k, v, seg, pos = make_chunk(
            jax.random.fold_in(key, 5), T, n_live, Hq, Hkv, D, prefix_len
        )
        for li in range(L):
            ref, out = run_both(cache, bt, q, k, v, seg, pos, prefix_len, li,
                                kv_bits)
            live = np.asarray(seg) > 0
            np.testing.assert_allclose(out[live], ref[live], rtol=2e-2,
                                       atol=3e-2)

    def test_multi_block_causal(self):
        """T=512 with bt=256 exercises the causal block skip (j <= i) and the
        cross-block online-softmax merge."""
        L, Hq, Hkv, D, ps = 1, 4, 2, 128, 64
        T, n_live, prefix_len = 512, 450, 130
        key = jax.random.PRNGKey(1)
        cache, bt = build_prefix_cache(key, L, prefix_len, Hkv, D, ps, 4,
                                       num_pages=16)
        q, k, v, seg, pos = make_chunk(
            jax.random.fold_in(key, 6), T, n_live, Hq, Hkv, D, prefix_len
        )
        ref, out = run_both(cache, bt, q, k, v, seg, pos, prefix_len, 0, 4)
        live = np.asarray(seg) > 0
        # int8-q scores + int8 (p*vs) PV requant over the prefix pages: same
        # noise class as the decode kernel (self phase alone measures 7e-3)
        np.testing.assert_allclose(out[live], ref[live], rtol=2e-2, atol=8e-2)

    def test_sliding_window(self):
        L, Hq, Hkv, D, ps = 1, 2, 2, 128, 64
        T, n_live, prefix_len, window = 128, 128, 192, 96
        key = jax.random.PRNGKey(2)
        cache, bt = build_prefix_cache(key, L, prefix_len, Hkv, D, ps, 4,
                                       num_pages=8)
        q, k, v, seg, pos = make_chunk(
            jax.random.fold_in(key, 7), T, n_live, Hq, Hkv, D, prefix_len
        )
        ref, out = run_both(cache, bt, q, k, v, seg, pos, prefix_len, 0, 4,
                            window=window)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=3e-2)

    def test_head_dim_64(self):
        """D=64 (H*Dc = 128 stays lane-aligned for KV4 with 4 kv heads)."""
        L, Hq, Hkv, D, ps = 1, 8, 4, 64, 128
        T, n_live, prefix_len = 128, 128, 200
        key = jax.random.PRNGKey(3)
        cache, bt = build_prefix_cache(key, L, prefix_len, Hkv, D, ps, 4,
                                       num_pages=4)
        q, k, v, seg, pos = make_chunk(
            jax.random.fold_in(key, 8), T, n_live, Hq, Hkv, D, prefix_len
        )
        ref, out = run_both(cache, bt, q, k, v, seg, pos, prefix_len, 0, 4)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=8e-2)

    def test_no_prefix_equals_flash_prefill(self):
        """prefix_len=0 must reproduce plain causal self-attention."""
        Hq, Hkv, D, ps = 4, 2, 128, 64
        T = 128
        key = jax.random.PRNGKey(4)
        cache, bt = build_prefix_cache(key, 1, 0, Hkv, D, ps, 4, num_pages=4)
        q, k, v, seg, pos = make_chunk(
            jax.random.fold_in(key, 9), T, T, Hq, Hkv, D, 0
        )
        expect = attention.prefill_attention(q, k, v, seg)
        out = ppx.prefix_prefill_attention_pallas(
            q, k, v, pos, seg, cache.data, cache.scales, bt, jnp.int32(0),
            jnp.int32(0), True, 1.0 / D ** 0.5, bt=128,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(expect, np.float32),
            rtol=2e-2, atol=2e-2,
        )
