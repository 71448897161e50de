"""Parity tests: Pallas GEMM kernels (interpret mode) vs the QoQ reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import pallas_gemm as pg
from qserve_tpu.quant import packing, qoq


def _inputs(M, K, N, key=0):
    kx, kw = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (M, K), jnp.float32)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    return x, w


class TestW4A8PerChn:
    @pytest.mark.parametrize("M,K,N", [(8, 512, 128), (32, 1024, 256), (5, 256, 128)])
    def test_matches_reference(self, M, K, N):
        x, w = _inputs(M, K, N)
        p = qoq.quantize_weight_per_channel(w)
        packed = packing.pack_w4(p.qweight)
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)

        out = pg.w4a8_gemm_per_chn_pallas(
            a, ascale, asum, packed, p.s1_scale, p.s1_szero, jnp.float32
        )
        ref = qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4)

    def test_integer_part_exact(self):
        """The int32 accumulation must be exact -> identical outputs."""
        M, K, N = 16, 1024, 128
        x, w = _inputs(M, K, N, key=1)
        p = qoq.quantize_weight_per_channel(w)
        packed = packing.pack_w4(p.qweight)
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
        # force unit scales: output == psum exactly
        one_col = jnp.ones_like(p.s1_scale)
        zero_col = jnp.zeros_like(p.s1_szero)
        out = pg.w4a8_gemm_per_chn_pallas(
            a, jnp.ones_like(ascale), jnp.zeros_like(asum), packed,
            one_col, zero_col, jnp.float32,
        )
        ref = jax.lax.dot_general(
            a, p.qweight, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestW4A8PerGroup:
    @pytest.mark.parametrize("M,K,N,G", [(8, 512, 128, 128), (16, 1024, 256, 128)])
    def test_matches_reference(self, M, K, N, G):
        x, w = _inputs(M, K, N, key=2)
        p = qoq.quantize_weight_per_group(w, G)
        packed = packing.pack_w4(p.qweight)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        out = pg.w4a8_gemm_per_group_pallas(
            a, ascale, packed, p.s2_scale, p.s2_zero, p.s1_scale, G, jnp.float32
        )
        ref = qoq.w4a8_gemm_per_group_ref(a, ascale, p, G, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4)

    @pytest.mark.parametrize(
        "M,K,N,G", [(8, 768, 128, 128), (16, 2816, 256, 128)]
    )
    def test_ragged_group_count_whole_kernel(self, M, K, N, G):
        """K2 with no multiple-of-8-groups divisor (Llama-2 down_proj
        geometry class): the whole-K-strip kernel replaces the round-2 XLA
        bail-out."""
        x, w = _inputs(M, K, N, key=7)
        p = qoq.quantize_weight_per_group(w, G)
        packed = packing.pack_w4(p.qweight)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        out = pg.w4a8_gemm_per_group_whole_pallas(
            a, ascale, packed, p.s2_scale, p.s2_zero, p.s1_scale, G,
            jnp.float32,
        )
        ref = qoq.w4a8_gemm_per_group_ref(a, ascale, p, G, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-4)

    def test_ragged_whole_kernel_stacked_layer(self):
        L, M, K, N, G = 2, 8, 768, 128, 128
        packs, s2s, s2z, s1s, refs = [], [], [], [], []
        a = None
        for li in range(L):
            x, w = _inputs(M, K, N, key=130 + li)
            p = qoq.quantize_weight_per_group(w, G)
            packs.append(packing.pack_w4(p.qweight))
            s2s.append(p.s2_scale)
            s2z.append(p.s2_zero)
            s1s.append(p.s1_scale)
            if a is None:
                a, ascale, _ = qoq.quantize_activation_per_token(x)
            refs.append(qoq.w4a8_gemm_per_group_ref(a, ascale, p, G,
                                                    jnp.float32))
        for li in range(L):
            out = pg.w4a8_gemm_per_group_whole_pallas(
                a, ascale, jnp.stack(packs), jnp.stack(s2s), jnp.stack(s2z),
                jnp.stack(s1s), G, jnp.float32,
                idx=jnp.asarray([li], jnp.int32),
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(refs[li]),
                                       rtol=2e-5, atol=2e-4)


class TestW8A8:
    @pytest.mark.parametrize("M,K,N", [(8, 512, 128), (32, 768, 384), (3, 256, 128)])
    def test_matches_reference(self, M, K, N):
        x, w = _inputs(M, K, N, key=3)
        p = qoq.quantize_weight_w8(w)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        out = pg.w8a8_gemm_pallas(a, ascale, p.qweight, p.scale, jnp.float32)
        ref = qoq.w8a8_gemm_ref(a, ascale, p, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4)


class TestStackedIndexed:
    """Stacked (layer/expert-indexed) operands: the kernel must read blocks
    of layer idx straight from [L, ...] arrays via scalar prefetch."""

    def test_w4a8_chn_stacked_layer(self):
        L, M, K, N = 3, 8, 512, 128
        packs, s1s, szs, refs = [], [], [], []
        a = None
        for li in range(L):
            x, w = _inputs(M, K, N, key=10 + li)
            p = qoq.quantize_weight_per_channel(w)
            packs.append(packing.pack_w4(p.qweight))
            s1s.append(p.s1_scale)
            szs.append(p.s1_szero)
            if a is None:
                a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
            refs.append(qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p, jnp.float32))
        qw = jnp.stack(packs)
        s1 = jnp.stack(s1s)
        sz = jnp.stack(szs)
        for li in range(L):
            out = pg.w4a8_gemm_per_chn_pallas(
                a, ascale, asum, qw, s1, sz, jnp.float32,
                idx=jnp.asarray([li], jnp.int32),
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(refs[li]), rtol=2e-5, atol=2e-4
            )

    def test_w4a8_grp_stacked_layer_expert(self):
        L, E, M, K, N, G = 2, 2, 8, 2048, 128, 128
        packs, s2s, s2z, s1s, refs = [], [], [], [], []
        a = None
        for li in range(L):
            rowp, rows2, rowz, rows1, rowref = [], [], [], [], []
            for e in range(E):
                x, w = _inputs(M, K, N, key=20 + li * E + e)
                p = qoq.quantize_weight_per_group(w, G)
                rowp.append(packing.pack_w4(p.qweight))
                rows2.append(p.s2_scale)
                rowz.append(p.s2_zero)
                rows1.append(p.s1_scale)
                if a is None:
                    a, ascale, _ = qoq.quantize_activation_per_token(x)
                rowref.append(qoq.w4a8_gemm_per_group_ref(a, ascale, p, G, jnp.float32))
            packs.append(jnp.stack(rowp))
            s2s.append(jnp.stack(rows2))
            s2z.append(jnp.stack(rowz))
            s1s.append(jnp.stack(rows1))
            refs.append(rowref)
        qw = jnp.stack(packs)  # [L, E, K/2, N]
        for li in range(L):
            for e in range(E):
                out = pg.w4a8_gemm_per_group_pallas(
                    a, ascale, qw, jnp.stack(s2s), jnp.stack(s2z),
                    jnp.stack(s1s), G, jnp.float32,
                    idx=jnp.asarray([li, e], jnp.int32),
                )
                np.testing.assert_allclose(
                    np.asarray(out), np.asarray(refs[li][e]), rtol=2e-5, atol=2e-4
                )

    def test_w8a8_stacked_layer(self):
        L, M, K, N = 2, 8, 512, 128
        packs, scales, refs = [], [], []
        a = None
        for li in range(L):
            x, w = _inputs(M, K, N, key=30 + li)
            p = qoq.quantize_weight_w8(w)
            packs.append(p.qweight)
            scales.append(p.scale)
            if a is None:
                a, ascale, _ = qoq.quantize_activation_per_token(x)
            refs.append(qoq.w8a8_gemm_ref(a, ascale, p, jnp.float32))
        qw = jnp.stack(packs)
        ws = jnp.stack(scales)
        for li in range(L):
            out = pg.w8a8_gemm_pallas(
                a, ascale, qw, ws, jnp.float32, idx=jnp.asarray([li], jnp.int32)
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(refs[li]), rtol=2e-5, atol=2e-4
            )


class TestW4A8PerChnBigM:
    """Prefill-shape path: streamed half-split A blocks, weights fetched once."""

    @pytest.mark.parametrize("M,K,N", [(512, 1024, 256), (384, 512, 128)])
    def test_matches_reference(self, M, K, N):
        x, w = _inputs(M, K, N, key=42)
        p = qoq.quantize_weight_per_channel(w)
        packed = packing.pack_w4(p.qweight)
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
        out = pg.w4a8_gemm_per_chn_bigm_pallas(
            a, ascale, asum, packed, p.s1_scale, p.s1_szero, jnp.float32
        )
        ref = qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-4)

    def test_stacked_layer_indexed(self):
        L, M, K, N = 2, 256, 1024, 128
        packs, s1s, szs, refs = [], [], [], []
        a = None
        for li in range(L):
            x, w = _inputs(M, K, N, key=50 + li)
            p = qoq.quantize_weight_per_channel(w)
            packs.append(packing.pack_w4(p.qweight))
            s1s.append(p.s1_scale)
            szs.append(p.s1_szero)
            if a is None:
                a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
            refs.append(qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p, jnp.float32))
        qw = jnp.stack(packs)
        for li in range(L):
            out = pg.w4a8_gemm_per_chn_bigm_pallas(
                a, ascale, asum, qw, jnp.stack(s1s), jnp.stack(szs),
                jnp.float32, idx=jnp.asarray([li], jnp.int32),
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(refs[li]),
                                       rtol=2e-5, atol=2e-4)


class TestRoutedGrouped:
    """Grouped (per-M-block expert) GEMMs for the routed MoE dispatch."""

    def _expert_weights_chn(self, E, K, N, key0=60):
        packs, s1s, szs, ps = [], [], [], []
        for e in range(E):
            _, w = _inputs(8, K, N, key=key0 + e)
            p = qoq.quantize_weight_per_channel(w)
            packs.append(packing.pack_w4(p.qweight))
            s1s.append(p.s1_scale)
            szs.append(p.s1_szero)
            ps.append(p)
        return jnp.stack(packs), jnp.stack(s1s), jnp.stack(szs), ps

    def test_w4a8_chn_routed_matches_per_block_reference(self):
        E, K, N, bm, nb = 3, 512, 128, 16, 6
        M = bm * nb
        qw, s1, sz, ps = self._expert_weights_chn(E, K, N)
        x, _ = _inputs(M, K, N, key=70)
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
        block_expert = jnp.asarray([0, 2, 2, 1, 0, 1], jnp.int32)
        out = pg.w4a8_gemm_per_chn_routed_pallas(
            a, ascale, asum, qw, s1, sz, block_expert[:, None], jnp.float32
        )
        for b in range(nb):
            e = int(block_expert[b])
            ref = qoq.w4a8_gemm_per_channel_ref(
                a[b * bm:(b + 1) * bm], ascale[b * bm:(b + 1) * bm],
                asum[b * bm:(b + 1) * bm], ps[e], jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(out[b * bm:(b + 1) * bm]), np.asarray(ref),
                rtol=2e-5, atol=2e-4,
            )

    def test_w4a8_chn_routed_stacked_layer_expert(self):
        L, E, K, N, bm, nb = 2, 2, 512, 128, 16, 4
        M = bm * nb
        qws, s1s, szs, ps = [], [], [], []
        for li in range(L):
            qw, s1, sz, p = self._expert_weights_chn(E, K, N, key0=80 + 10 * li)
            qws.append(qw); s1s.append(s1); szs.append(sz); ps.append(p)
        qw = jnp.stack(qws)  # [L, E, K/2, N]
        x, _ = _inputs(M, K, N, key=90)
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
        block_idx = jnp.asarray(
            [[0, 1], [1, 0], [0, 0], [1, 1]], jnp.int32  # (layer, expert)
        )
        out = pg.w4a8_gemm_per_chn_routed_pallas(
            a, ascale, asum, qw, jnp.stack(s1s), jnp.stack(szs), block_idx,
            jnp.float32,
        )
        for b in range(nb):
            li, e = int(block_idx[b, 0]), int(block_idx[b, 1])
            ref = qoq.w4a8_gemm_per_channel_ref(
                a[b * bm:(b + 1) * bm], ascale[b * bm:(b + 1) * bm],
                asum[b * bm:(b + 1) * bm], ps[li][e], jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(out[b * bm:(b + 1) * bm]), np.asarray(ref),
                rtol=2e-5, atol=2e-4,
            )

    def test_w8a8_routed_matches_per_block_reference(self):
        E, K, N, bm, nb = 3, 512, 128, 16, 6
        M = bm * nb
        packs, scales, ps = [], [], []
        for e in range(E):
            _, w = _inputs(8, K, N, key=100 + e)
            p = qoq.quantize_weight_w8(w)
            packs.append(p.qweight); scales.append(p.scale); ps.append(p)
        qw, ws = jnp.stack(packs), jnp.stack(scales)
        x, _ = _inputs(M, K, N, key=110)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        block_expert = jnp.asarray([2, 0, 1, 1, 2, 0], jnp.int32)
        out = pg.w8a8_gemm_routed_pallas(
            a, ascale, qw, ws, block_expert[:, None], jnp.float32
        )
        for b in range(nb):
            e = int(block_expert[b])
            ref = qoq.w8a8_gemm_ref(
                a[b * bm:(b + 1) * bm], ascale[b * bm:(b + 1) * bm], ps[e],
                jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(out[b * bm:(b + 1) * bm]), np.asarray(ref),
                rtol=2e-5, atol=2e-4,
            )

    def test_w4a8_grp_routed_ragged_k_whole_kernel(self):
        """Ragged K (K2 % (8*G) != 0, e.g. Llama-2 down_proj K=11008-class):
        the routed dispatch takes the whole-K-strip kernel instead of the
        XLA fallback (pallas_gemm.py w4a8_gemm_per_group_whole_routed)."""
        E, K, N, G, bm, nb = 3, 768, 128, 128, 16, 6  # K2=384 -> 3 grp/plane
        M = bm * nb
        assert (K // 2) % (8 * G) != 0 and (K // 2) % G == 0
        packs, s2s, s2z, s1s, ps = [], [], [], [], []
        for e in range(E):
            _, w = _inputs(8, K, N, key=160 + e)
            p = qoq.quantize_weight_per_group(w, G)
            packs.append(packing.pack_w4(p.qweight))
            s2s.append(p.s2_scale); s2z.append(p.s2_zero)
            s1s.append(p.s1_scale); ps.append(p)
        x, _ = _inputs(M, K, N, key=170)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        block_expert = jnp.asarray([2, 1, 0, 1, 2, 0], jnp.int32)
        out = pg.w4a8_gemm_per_group_whole_routed_pallas(
            a, ascale, jnp.stack(packs), jnp.stack(s2s), jnp.stack(s2z),
            jnp.stack(s1s), block_expert[:, None], G, jnp.float32,
        )
        for b in range(nb):
            e = int(block_expert[b])
            ref = qoq.w4a8_gemm_per_group_ref(
                a[b * bm:(b + 1) * bm], ascale[b * bm:(b + 1) * bm], ps[e],
                G, jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(out[b * bm:(b + 1) * bm]), np.asarray(ref),
                rtol=2e-5, atol=2e-4,
            )

    def test_w4a8_grp_routed_matches_per_block_reference(self):
        E, K, N, G, bm, nb = 3, 2048, 128, 128, 16, 6
        M = bm * nb
        packs, s2s, s2z, s1s, ps = [], [], [], [], []
        for e in range(E):
            _, w = _inputs(8, K, N, key=140 + e)
            p = qoq.quantize_weight_per_group(w, G)
            packs.append(packing.pack_w4(p.qweight))
            s2s.append(p.s2_scale); s2z.append(p.s2_zero)
            s1s.append(p.s1_scale); ps.append(p)
        x, _ = _inputs(M, K, N, key=150)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        block_expert = jnp.asarray([1, 0, 2, 2, 1, 0], jnp.int32)
        out = pg.w4a8_gemm_per_group_routed_pallas(
            a, ascale, jnp.stack(packs), jnp.stack(s2s), jnp.stack(s2z),
            jnp.stack(s1s), block_expert[:, None], G, jnp.float32,
        )
        for b in range(nb):
            e = int(block_expert[b])
            ref = qoq.w4a8_gemm_per_group_ref(
                a[b * bm:(b + 1) * bm], ascale[b * bm:(b + 1) * bm], ps[e],
                G, jnp.float32,
            )
            np.testing.assert_allclose(
                np.asarray(out[b * bm:(b + 1) * bm]), np.asarray(ref),
                rtol=2e-5, atol=2e-4,
            )
