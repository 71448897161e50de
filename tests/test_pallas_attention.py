"""Parity tests: Pallas paged decode attention (interpret) vs XLA fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import attention, kv_cache as kvc
from qserve_tpu.kernels import pallas_paged_attention as ppa


def build_cache_with_history(key, B, ctx_lens, H, D, ps, kv_bits, num_pages):
    """Fill a single-layer cache with random history; returns (layer, bt)."""
    layer = kvc.create_kv_cache(1, num_pages, H, ps, D, kv_bits).layer(0)
    maxP = max(-(-c // ps) for c in ctx_lens) + 1
    bt = np.zeros((B, maxP), np.int32)
    next_page = 0
    keys = jax.random.split(key, B)
    for b, c in enumerate(ctx_lens):
        np_b = -(-c // ps)
        pages = list(range(next_page, next_page + np_b))
        next_page += np_b
        bt[b, :np_b] = pages
        k = jax.random.normal(keys[b], (c, H, D), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(keys[b], 1), (c, H, D), jnp.float32)
        page_ids = np.asarray([pages[i // ps] for i in range(c)], np.int32)
        slots = np.asarray([i % ps for i in range(c)], np.int32)
        layer = kvc.append_layer(
            layer, k, v, jnp.asarray(page_ids), jnp.asarray(slots), kv_bits, True
        )
    return layer, jnp.asarray(bt)


class TestPagedAttentionParity:
    @pytest.mark.parametrize("kv_bits", [4, 8])
    @pytest.mark.parametrize("ctx_lens", [[33], [64], [17, 80, 5]])
    def test_matches_fallback(self, kv_bits, ctx_lens):
        B, H, G, D, ps = len(ctx_lens), 2, 2, 128, 16
        Hq = H * G
        key = jax.random.PRNGKey(0)
        layer, bt = build_cache_with_history(
            key, B, ctx_lens, H, D, ps, kv_bits, num_pages=32
        )
        q = jax.random.normal(jax.random.fold_in(key, 7), (B, Hq, D), jnp.float32)
        ctx = jnp.asarray(ctx_lens, jnp.int32)

        ref = attention.paged_decode_attention.__wrapped__ if False else None
        # call the XLA fallback directly (bypassing the pallas registry)
        from qserve_tpu.kernels.attention import paged_decode_attention as fb
        from qserve_tpu.kernels import ops

        # fallback path
        k, v = kvc.gather_dequant_layer(layer, bt, kv_bits)
        sm = 1.0 / (D ** 0.5)
        S = k.shape[1]
        qf = q.reshape(B, H, G, D)
        scores = jnp.einsum("bhgd,bshd->bhgs", qf, k) * sm
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        mask = pos < ctx[:, None]
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        expect = jnp.einsum("bhgs,bshd->bhgd", p, v).reshape(B, Hq, D)

        out = ppa.paged_decode_attention_pallas(
            q, layer.data, layer.scales, bt, ctx, kv_bits == 4, sm
        )
        # kernel computes QK / PV dots in bf16 (f32 accumulate) — ~0.5%
        # element error vs the all-f32 fallback, far below the KV4 quant
        # noise this cache carries anyway
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expect), rtol=2e-2, atol=2e-2
        )

    def test_zero_context_rows_are_safe(self):
        B, H, G, D, ps = 2, 2, 2, 128, 16
        layer, bt_ = build_cache_with_history(
            jax.random.PRNGKey(1), 1, [20], H, D, ps, 4, num_pages=8
        )
        bt = jnp.concatenate([bt_, jnp.zeros_like(bt_)], axis=0)
        q = jax.random.normal(jax.random.PRNGKey(2), (B, H * G, D), jnp.float32)
        ctx = jnp.asarray([20, 0], jnp.int32)
        out = ppa.paged_decode_attention_pallas(
            q, layer.data, layer.scales, bt, ctx, True, 1.0 / D ** 0.5
        )
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_array_equal(np.asarray(out[1]), 0.0)

    def test_long_multi_page(self):
        """History spanning many pages with ragged last page."""
        B, H, G, D, ps = 1, 2, 4, 128, 16
        ctx_lens = [7 * ps + 3]
        layer, bt = build_cache_with_history(
            jax.random.PRNGKey(3), B, ctx_lens, H, D, ps, 4, num_pages=16
        )
        q = jax.random.normal(jax.random.PRNGKey(4), (B, H * G, D), jnp.float32)
        ctx = jnp.asarray(ctx_lens, jnp.int32)
        out = ppa.paged_decode_attention_pallas(
            q, layer.data, layer.scales, bt, ctx, True, 1.0 / D ** 0.5
        )
        k, v = kvc.gather_dequant_layer(layer, bt, 4)
        qf = q.reshape(B, H, G, D)
        sm = 1.0 / D ** 0.5
        scores = jnp.einsum("bhgd,bshd->bhgs", qf, k) * sm
        S = k.shape[1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        scores = jnp.where((pos < ctx[:, None])[:, None, None, :], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        expect = jnp.einsum("bhgs,bshd->bhgd", p, v).reshape(B, H * G, D)
        # bf16 in-kernel dots: see tolerance note in test_matches_fallback
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=2e-2, atol=4e-3)
