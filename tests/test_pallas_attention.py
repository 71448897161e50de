"""Parity tests: Pallas paged decode attention (interpret) vs XLA math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import attention, kv_cache as kvc
from qserve_tpu.kernels import pallas_paged_attention as ppa


def build_cache_with_history(key, L, B, hist_lens, H, D, ps, kv_bits, num_pages):
    """Fill an L-layer cache with random history (same history per layer);
    returns (cache, bt). hist_lens = tokens already IN the cache per seq."""
    cache = kvc.create_kv_cache(L, num_pages, H, ps, D, kv_bits)
    maxP = max(-(-max(c, 1) // ps) for c in hist_lens) + 1
    bt = np.zeros((B, maxP), np.int32)
    next_page = 0
    keys = jax.random.split(key, B)
    for b, c in enumerate(hist_lens):
        np_b = max(-(-c // ps), 1)
        pages = list(range(next_page, next_page + np_b))
        next_page += np_b
        bt[b, :np_b] = pages
        if c == 0:
            continue
        k = jax.random.normal(keys[b], (L, c, H, D), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(keys[b], 1), (L, c, H, D),
                              jnp.float32)
        page_ids = np.asarray([pages[i // ps] for i in range(c)], np.int32)
        slots = np.asarray([i % ps for i in range(c)], np.int32)
        cache = kvc.append_all_layers(
            cache, k, v, jnp.asarray(page_ids), jnp.asarray(slots), kv_bits, True
        )
    return cache, jnp.asarray(bt)


def reference_attention(cache, bt, q, ctx, li, k_cur, v_cur, kv_bits):
    """Float reference: dequantized history (< ctx-1) + exact self column."""
    B, Hq, D = q.shape
    layer = cache.layer(li)
    k, v = kvc.gather_dequant_layer(layer, bt, kv_bits)
    H = k.shape[2]
    rep = Hq // H
    S = k.shape[1]
    k = jnp.concatenate([k, k_cur.astype(jnp.float32)[:, None]], axis=1)
    v = jnp.concatenate([v, v_cur.astype(jnp.float32)[:, None]], axis=1)
    qf = q.astype(jnp.float32).reshape(B, H, rep, D)
    sm = 1.0 / D ** 0.5
    scores = jnp.einsum("bhrd,bshd->bhrs", qf, k) * sm
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S + 1), 1)
    mask = (pos < jnp.maximum(ctx - 1, 0)[:, None]) | (pos == S)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhrs,bshd->bhrd", p, v).reshape(B, Hq, D)


class TestPagedAttentionParity:
    @pytest.mark.parametrize("kv_bits", [4, 8])
    @pytest.mark.parametrize("ctx_lens", [[33], [64], [17, 80, 5]])
    def test_matches_reference(self, kv_bits, ctx_lens):
        L, B, H, G, D, ps = 2, len(ctx_lens), 2, 2, 128, 16
        Hq = H * G
        key = jax.random.PRNGKey(0)
        hist = [c - 1 for c in ctx_lens]
        cache, bt = build_cache_with_history(
            key, L, B, hist, H, D, ps, kv_bits, num_pages=32
        )
        q = jax.random.normal(jax.random.fold_in(key, 7), (B, Hq, D), jnp.float32)
        k_cur = jax.random.normal(jax.random.fold_in(key, 8), (B, H, D), jnp.float32)
        v_cur = jax.random.normal(jax.random.fold_in(key, 9), (B, H, D), jnp.float32)
        ctx = jnp.asarray(ctx_lens, jnp.int32)

        for li in range(L):
            out = ppa.paged_decode_attention_pallas(
                q, cache.data, cache.scales, bt, ctx, jnp.int32(li),
                k_cur, v_cur, kv_bits == 4, 1.0 / D ** 0.5,
            )
            expect = reference_attention(cache, bt, q, ctx, li, k_cur, v_cur,
                                         kv_bits)
            # kernel quantizes q per row to int8 and runs PV in bf16 — ~0.5%
            # element error, far below the KV quant noise the cache carries
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(expect), rtol=2e-2, atol=3e-2
            )

    def test_first_decode_token_no_history(self):
        """ctx=1: nothing in the cache, pure self-attention."""
        L, B, H, G, D, ps = 1, 2, 2, 2, 128, 16
        cache, bt = build_cache_with_history(
            jax.random.PRNGKey(1), L, B, [0, 0], H, D, ps, 4, num_pages=8
        )
        q = jax.random.normal(jax.random.PRNGKey(2), (B, H * G, D), jnp.float32)
        k_cur = jax.random.normal(jax.random.PRNGKey(3), (B, H, D), jnp.float32)
        v_cur = jax.random.normal(jax.random.PRNGKey(4), (B, H, D), jnp.float32)
        ctx = jnp.asarray([1, 1], jnp.int32)
        out = ppa.paged_decode_attention_pallas(
            q, cache.data, cache.scales, bt, ctx, jnp.int32(0),
            k_cur, v_cur, True, 1.0 / D ** 0.5,
        )
        # softmax over a single column == v_cur exactly
        expect = jnp.repeat(v_cur, G, axis=1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)

    def test_long_multi_page(self):
        """History spanning many pages with ragged last page."""
        L, B, H, G, D, ps = 1, 1, 2, 4, 128, 16
        ctx_lens = [7 * ps + 3]
        hist = [c - 1 for c in ctx_lens]
        cache, bt = build_cache_with_history(
            jax.random.PRNGKey(3), L, B, hist, H, D, ps, 4, num_pages=16
        )
        q = jax.random.normal(jax.random.PRNGKey(4), (B, H * G, D), jnp.float32)
        k_cur = jax.random.normal(jax.random.PRNGKey(5), (B, H, D), jnp.float32)
        v_cur = jax.random.normal(jax.random.PRNGKey(6), (B, H, D), jnp.float32)
        ctx = jnp.asarray(ctx_lens, jnp.int32)
        out = ppa.paged_decode_attention_pallas(
            q, cache.data, cache.scales, bt, ctx, jnp.int32(0),
            k_cur, v_cur, True, 1.0 / D ** 0.5,
        )
        expect = reference_attention(cache, bt, q, ctx, 0, k_cur, v_cur, 4)
        # int8-quantized q rows + int8 (p*vs) PV dot: ~1-2% abs error scale
        # (larger page chunks share one pq_scale across more slots)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=2e-2, atol=2.5e-2)

    def test_dispatcher_fallback_agrees(self):
        """attention.paged_decode_attention (XLA fallback) vs pallas kernel."""
        L, B, H, G, D, ps = 2, 2, 2, 2, 128, 16
        ctx_lens = [40, 9]
        hist = [c - 1 for c in ctx_lens]
        cache, bt = build_cache_with_history(
            jax.random.PRNGKey(5), L, B, hist, H, D, ps, 4, num_pages=16
        )
        q = jax.random.normal(jax.random.PRNGKey(6), (B, H * G, D), jnp.float32)
        k_cur = jax.random.normal(jax.random.PRNGKey(7), (B, H, D), jnp.float32)
        v_cur = jax.random.normal(jax.random.PRNGKey(8), (B, H, D), jnp.float32)
        ctx = jnp.asarray(ctx_lens, jnp.int32)
        a = attention.paged_decode_attention(
            q, cache, bt, ctx, jnp.int32(1), k_cur, v_cur, 4
        )
        b = ppa.paged_decode_attention_pallas(
            q, cache.data, cache.scales, bt, ctx, jnp.int32(1),
            k_cur, v_cur, True, 1.0 / D ** 0.5,
        )
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


class TestAppendAllLayers:
    def test_roundtrip_through_gather(self):
        L, H, D, ps = 3, 2, 128, 16
        cache = kvc.create_kv_cache(L, 8, H, ps, D, 4)
        T = 20
        key = jax.random.PRNGKey(9)
        k = jax.random.normal(key, (L, T, H, D), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(key, 1), (L, T, H, D), jnp.float32)
        page_ids = jnp.asarray([i // ps for i in range(T)], jnp.int32)
        slots = jnp.asarray([i % ps for i in range(T)], jnp.int32)
        cache = kvc.append_all_layers(cache, k, v, page_ids, slots, 4, True)
        bt = jnp.asarray([[0, 1]], jnp.int32)
        for li in range(L):
            kd, vd = kvc.gather_dequant_layer(cache.layer(li), bt, 4)
            np.testing.assert_allclose(
                np.asarray(kd[0, :T]), np.asarray(k[li]), atol=0.45, rtol=0.2
            )
            np.testing.assert_allclose(
                np.asarray(vd[0, :T]), np.asarray(v[li]), atol=0.45, rtol=0.2
            )

    def test_drop_rows(self):
        L, H, D, ps = 2, 2, 128, 16
        cache = kvc.create_kv_cache(L, 4, H, ps, D, 4)
        k = jnp.ones((L, 2, H, D))
        v = jnp.ones((L, 2, H, D))
        out = kvc.append_all_layers(
            cache, k, v, jnp.asarray([-1, -1], jnp.int32),
            jnp.asarray([0, 1], jnp.int32), 4, True,
        )
        np.testing.assert_array_equal(np.asarray(out.data), 0)
        np.testing.assert_array_equal(np.asarray(out.scales), 0)


def reference_attention_windowed(cache, bt, q, ctx, li, k_cur, v_cur, kv_bits,
                                 window):
    """Windowed float reference: history positions p with
    ctx-window <= p < ctx-1, plus the exact self column."""
    B, Hq, D = q.shape
    layer = cache.layer(li)
    k, v = kvc.gather_dequant_layer(layer, bt, kv_bits)
    H = k.shape[2]
    rep = Hq // H
    S = k.shape[1]
    k = jnp.concatenate([k, k_cur.astype(jnp.float32)[:, None]], axis=1)
    v = jnp.concatenate([v, v_cur.astype(jnp.float32)[:, None]], axis=1)
    qf = q.astype(jnp.float32).reshape(B, H, rep, D)
    sm = 1.0 / D ** 0.5
    scores = jnp.einsum("bhrd,bshd->bhrs", qf, k) * sm
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, S + 1), 1)
    hist = jnp.maximum(ctx - 1, 0)[:, None]
    mask = ((pos < hist) & (pos > hist - window)) | (pos == S)
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhrs,bshd->bhrd", p, v).reshape(B, Hq, D)


class TestSlidingWindow:
    @pytest.mark.parametrize("ctx_lens,window", [([70], 32), ([33, 90], 48)])
    def test_window_matches_reference(self, ctx_lens, window):
        """Pallas kernel with a window vs the windowed float reference
        (history fully materialized — no cyclic overwrite in this test)."""
        L, B, H, G, D, ps = 1, len(ctx_lens), 2, 2, 128, 16
        Hq = H * G
        key = jax.random.PRNGKey(3)
        hist = [c - 1 for c in ctx_lens]
        cache, bt = build_cache_with_history(
            key, L, B, hist, H, D, ps, 4, num_pages=32
        )
        q = jax.random.normal(jax.random.fold_in(key, 7), (B, Hq, D), jnp.float32)
        k_cur = jax.random.normal(jax.random.fold_in(key, 8), (B, H, D), jnp.float32)
        v_cur = jax.random.normal(jax.random.fold_in(key, 9), (B, H, D), jnp.float32)
        ctx = jnp.asarray(ctx_lens, jnp.int32)

        out = ppa.paged_decode_attention_pallas(
            q, cache.data, cache.scales, bt, ctx, jnp.int32(0),
            k_cur, v_cur, True, 1.0 / D ** 0.5, window=window,
        )
        expect = reference_attention_windowed(
            cache, bt, q, ctx, jnp.int32(0), k_cur, v_cur, 4, window
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), rtol=0.15, atol=0.15
        )
        # and the XLA fallback path agrees too
        out_xla = attention.paged_decode_attention(
            q, cache, bt, ctx, jnp.int32(0), k_cur, v_cur, 4,
            sliding_window=window,
        )
        np.testing.assert_allclose(
            np.asarray(out_xla), np.asarray(expect), rtol=1e-4, atol=1e-4
        )

    def test_cyclic_pages_consistent(self):
        """With cyclic page aliasing (the allocator's reuse past the window),
        the kernel must read each in-window position from its block-table
        slot: simulate decode past the window and compare against a cache
        big enough to never wrap."""
        L, H, G, D, ps = 1, 2, 2, 128, 16
        Hq = H * G
        window = 2 * ps  # 2 pages
        wp = window // ps
        total = 5 * ps  # generate well past the window
        key = jax.random.PRNGKey(5)
        k_hist = jax.random.normal(key, (L, total, H, D), jnp.float32)
        v_hist = jax.random.normal(jax.random.fold_in(key, 1), (L, total, H, D),
                                   jnp.float32)

        # linear cache: pages 0..4, logical = physical
        lin_cache = kvc.create_kv_cache(L, 8, H, ps, D, 4)
        pages_lin = jnp.asarray([i // ps for i in range(total)], jnp.int32)
        slots = jnp.asarray([i % ps for i in range(total)], jnp.int32)
        lin_cache = kvc.append_all_layers(
            lin_cache, k_hist, v_hist, pages_lin, slots, 4, True
        )
        bt_lin = jnp.asarray([[0, 1, 2, 3, 4]], jnp.int32)

        # cyclic cache: 2 physical pages, logical page l -> l % wp, written
        # in POSITION ORDER (later writes win, as decode would)
        cyc_cache = kvc.create_kv_cache(L, 4, H, ps, D, 4)
        pages_cyc = jnp.asarray([(i // ps) % wp for i in range(total)], jnp.int32)
        cyc_cache = kvc.append_all_layers(
            cyc_cache, k_hist, v_hist, pages_cyc, slots, 4, True
        )
        bt_cyc = jnp.asarray([[0, 1, 0, 1, 0]], jnp.int32)

        q = jax.random.normal(jax.random.fold_in(key, 7), (1, Hq, D), jnp.float32)
        k_cur = jax.random.normal(jax.random.fold_in(key, 8), (1, H, D), jnp.float32)
        v_cur = jax.random.normal(jax.random.fold_in(key, 9), (1, H, D), jnp.float32)
        ctx = jnp.asarray([total + 1], jnp.int32)

        out_lin = ppa.paged_decode_attention_pallas(
            q, lin_cache.data, lin_cache.scales, bt_lin, ctx, jnp.int32(0),
            k_cur, v_cur, True, 1.0 / D ** 0.5, window=window,
        )
        out_cyc = ppa.paged_decode_attention_pallas(
            q, cyc_cache.data, cyc_cache.scales, bt_cyc, ctx, jnp.int32(0),
            k_cur, v_cur, True, 1.0 / D ** 0.5, window=window,
        )
        np.testing.assert_allclose(
            np.asarray(out_cyc), np.asarray(out_lin), rtol=1e-5, atol=1e-5
        )
