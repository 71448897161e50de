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


class TestW8A8:
    @pytest.mark.parametrize("M,K,N", [(8, 512, 128), (32, 768, 384), (3, 256, 128)])
    def test_matches_reference(self, M, K, N):
        x, w = _inputs(M, K, N, key=3)
        p = qoq.quantize_weight_w8(w)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        out = pg.w8a8_gemm_pallas(a, ascale, p.qweight, p.scale, jnp.float32)
        ref = qoq.w8a8_gemm_ref(a, ascale, p, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-4)
