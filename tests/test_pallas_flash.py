"""Parity: Pallas flash prefill attention (interpret) vs XLA masked softmax."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import pallas_flash_attention as pfa


def xla_ref(q, k, v, seg, sm):
    T, Hq, D = q.shape
    Hkv = k.shape[1]
    rep = Hq // Hkv
    kq = jnp.repeat(k, rep, axis=1)
    vq = jnp.repeat(v, rep, axis=1)
    scores = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                        kq.astype(jnp.float32)) * sm
    same = seg[:, None] == seg[None, :]
    valid = (seg > 0)[:, None] & (seg > 0)[None, :]
    causal = (
        jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        <= jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    )
    scores = jnp.where((same & causal & valid)[None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hts,shd->thd", p, vq.astype(jnp.float32)).astype(q.dtype)


class TestFlashPrefill:
    @pytest.mark.parametrize("T,segs", [(256, [100, 100]), (512, [17, 200, 250]),
                                        (256, [256])])
    def test_matches_xla(self, T, segs):
        Hq, Hkv, D = 4, 2, 128
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (T, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (T, Hkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (T, Hkv, D), jnp.float32)
        seg = np.zeros(T, np.int32)
        off = 0
        for i, L in enumerate(segs):
            seg[off : off + L] = i + 1
            off += L
        seg = jnp.asarray(seg)
        sm = 1.0 / D**0.5
        out = pfa.flash_prefill_attention_pallas(q, k, v, seg, sm)
        ref = xla_ref(q, k, v, seg, sm)
        # compare only non-padding rows (padding rows are unused downstream)
        m = np.asarray(seg) > 0
        np.testing.assert_allclose(
            np.asarray(out)[m], np.asarray(ref)[m], rtol=2e-4, atol=2e-4
        )

    def test_padding_rows_finite(self):
        Hq, Hkv, D, T = 2, 1, 128, 256
        q = jax.random.normal(jax.random.PRNGKey(1), (T, Hq, D))
        k = jax.random.normal(jax.random.PRNGKey(2), (T, Hkv, D))
        v = jax.random.normal(jax.random.PRNGKey(3), (T, Hkv, D))
        seg = jnp.zeros((T,), jnp.int32).at[:10].set(1)
        out = pfa.flash_prefill_attention_pallas(q, k, v, seg, 0.1)
        assert np.isfinite(np.asarray(out)).all()


class TestFlashSlidingWindow:
    @pytest.mark.parametrize("T,segs,window", [(256, [100, 100], 48),
                                               (512, [300, 212], 128)])
    def test_window_matches_xla(self, T, segs, window):
        Hq, Hkv, D = 4, 2, 128
        key = jax.random.PRNGKey(11)
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (T, Hq, D), jnp.float32)
        k = jax.random.normal(ks[1], (T, Hkv, D), jnp.float32)
        v = jax.random.normal(ks[2], (T, Hkv, D), jnp.float32)
        seg = np.zeros(T, np.int32)
        off = 0
        for i, L in enumerate(segs):
            seg[off : off + L] = i + 1
            off += L
        seg = jnp.asarray(seg)
        sm = 1.0 / D ** 0.5

        out = pfa.flash_prefill_attention_pallas(q, k, v, seg, sm, window=window)

        # windowed XLA reference
        rep = Hq // Hkv
        kq = jnp.repeat(k, rep, axis=1)
        vq = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                            kq.astype(jnp.float32)) * sm
        same = seg[:, None] == seg[None, :]
        valid = (seg > 0)[:, None] & (seg > 0)[None, :]
        ti = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        si = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        mask = same & valid & (si <= ti) & (si > ti - window)
        scores = jnp.where(mask[None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        expect = jnp.einsum("hts,shd->thd", p, vq.astype(jnp.float32))
        # compare only non-padding rows (padding rows are unused downstream)
        m = np.asarray(seg) > 0
        np.testing.assert_allclose(
            np.asarray(out)[m], np.asarray(expect)[m], rtol=2e-3, atol=2e-3
        )
