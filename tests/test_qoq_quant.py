"""Golden tests for the QoQ quantization core (pure JAX, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.quant import packing, qoq


def _rand(key, shape, scale=1.0):
    return jax.random.normal(key, shape, dtype=jnp.float32) * scale


class TestActivationQuant:
    def test_roundtrip_error_bounded(self):
        x = _rand(jax.random.PRNGKey(0), (16, 256))
        q, scale, _ = qoq.quantize_activation_per_token(x)
        xhat = q.astype(jnp.float32) * scale
        err = jnp.max(jnp.abs(xhat - x))
        # half-step of the per-token lattice
        assert err <= float(jnp.max(scale)) * 0.5 + 1e-6

    def test_sum_matches(self):
        x = _rand(jax.random.PRNGKey(1), (8, 128))
        q, scale, s = qoq.quantize_activation_per_token(x, with_sum=True)
        expect = np.asarray(q.astype(jnp.int32).sum(-1)) * np.asarray(scale[:, 0])
        np.testing.assert_allclose(np.asarray(s[:, 0]), expect, rtol=1e-6)

    def test_int8_range(self):
        x = _rand(jax.random.PRNGKey(2), (4, 64), scale=100.0)
        q, _, _ = qoq.quantize_activation_per_token(x)
        assert q.dtype == jnp.int8
        assert int(q.max()) <= 127 and int(q.min()) >= -128


class TestPerChannelW4:
    def test_values_in_uint4(self):
        w = _rand(jax.random.PRNGKey(3), (256, 128))
        p = qoq.quantize_weight_per_channel(w)
        assert int(p.qweight.min()) >= 0 and int(p.qweight.max()) <= 15

    def test_dequant_error(self):
        w = _rand(jax.random.PRNGKey(4), (512, 128))
        p = qoq.quantize_weight_per_channel(w)
        what = qoq.dequantize_per_channel(p)
        # max error is half an LSB of the per-channel scale
        err = jnp.max(jnp.abs(what - w) / p.s1_scale[None, :])
        assert float(err) <= 0.5 + 1e-3

    def test_gemm_matches_float_dequant(self):
        """The subtraction-free epilogue must equal the naive dequant GEMM."""
        kx, kw = jax.random.split(jax.random.PRNGKey(5))
        x = _rand(kx, (16, 256))
        w = _rand(kw, (256, 128))
        p = qoq.quantize_weight_per_channel(w)
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)

        out = qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p, out_dtype=jnp.float32)

        what = qoq.dequantize_per_channel(p)
        ahat = a.astype(jnp.float32) * ascale
        ref = ahat @ what
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


class TestPerGroupW4:
    def test_level2_in_int8(self):
        w = _rand(jax.random.PRNGKey(6), (512, 128))
        p = qoq.quantize_weight_per_group(w, 128)
        w8 = qoq.pergroup_level2_int8(p, 128)
        assert w8.dtype == jnp.int8  # would overflow-wrap if params were wrong
        # verify no wraparound occurred: recompute in int32
        q = p.qweight.reshape(4, 128, 128).astype(jnp.int32)
        s2 = p.s2_scale.astype(jnp.int32) & 0xFF
        full = q * s2[:, None, :] + p.s2_zero.astype(jnp.int32)[:, None, :]
        assert int(full.max()) <= 127 and int(full.min()) >= -128

    def test_dequant_error(self):
        w = _rand(jax.random.PRNGKey(7), (512, 128))
        p = qoq.quantize_weight_per_group(w, 128)
        what = qoq.dequantize_per_group(p, 128)
        # integer level-2 scale: rounding (s2/2) + zero rounding (1/2) in
        # units of s1*s2 -> worst case one full s1*s2 step.
        s2 = (p.s2_scale.astype(jnp.int32) & 0xFF).astype(jnp.float32)
        bound = p.s1_scale[None, :] * jnp.repeat(s2, 128, axis=0)
        assert bool(jnp.all(jnp.abs(what - w) <= bound + 1e-3))

    def test_gemm_matches_float_dequant(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(8))
        x = _rand(kx, (8, 512))
        w = _rand(kw, (512, 128))
        p = qoq.quantize_weight_per_group(w, 128)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        out = qoq.w4a8_gemm_per_group_ref(a, ascale, p, 128, out_dtype=jnp.float32)
        ref = (a.astype(jnp.float32) * ascale) @ qoq.dequantize_per_group(p, 128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


class TestW8:
    def test_gemm(self):
        kx, kw = jax.random.split(jax.random.PRNGKey(9))
        x = _rand(kx, (8, 256))
        w = _rand(kw, (256, 128))
        p = qoq.quantize_weight_w8(w)
        a, ascale, _ = qoq.quantize_activation_per_token(x)
        out = qoq.w8a8_gemm_ref(a, ascale, p, out_dtype=jnp.float32)
        ref = (a.astype(jnp.float32) * ascale) @ qoq.dequantize_w8(p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-3)


class TestKVQuant:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_asymmetric_roundtrip(self, bits):
        x = _rand(jax.random.PRNGKey(10), (4, 7, 128))  # [tokens, heads, dim]
        q, scale, zero = qoq.quantize_kv(x, bits=bits, asymmetric=True)
        xhat = qoq.dequantize_kv(q, scale, zero)
        err = jnp.max(jnp.abs(xhat - x) / scale)
        assert float(err) <= 0.5 + 1e-3

    @pytest.mark.parametrize("bits", [4, 8])
    def test_symmetric_roundtrip(self, bits):
        x = _rand(jax.random.PRNGKey(11), (4, 7, 128))
        q, scale, _ = qoq.quantize_kv(x, bits=bits, asymmetric=False)
        xhat = qoq.dequantize_kv_signed(q, scale)
        err = jnp.max(jnp.abs(xhat - x) / scale)
        assert float(err) <= 0.5 + 1e-3

    def test_uint4_bit_pattern(self):
        x = _rand(jax.random.PRNGKey(12), (2, 2, 64))
        q, _, _ = qoq.quantize_kv(x, bits=4, asymmetric=True)
        vals = np.asarray(q).astype(np.int32) & 0xFF
        assert vals.max() <= 15 and vals.min() >= 0


class TestPacking:
    def test_w4_roundtrip(self):
        q = jax.random.randint(jax.random.PRNGKey(13), (1024, 256), 0, 16, jnp.int8)
        packed = packing.pack_w4(q)
        assert packed.shape == (512, 256)
        out = packing.unpack_w4(packed)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(q))

    def test_w4_roundtrip_small(self):
        q = jax.random.randint(jax.random.PRNGKey(14), (64, 128), 0, 16, jnp.int8)
        out = packing.unpack_w4(packing.pack_w4(q))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(q))

    def test_nibble_planes_match(self):
        """Kernel-side int8-domain nibble split == the two K halves."""
        K = 1024
        q = jax.random.randint(jax.random.PRNGKey(15), (K, 128), 0, 16, jnp.int8)
        packed = packing.pack_w4(q)
        # interpret=True: the compiled path's pltpu.bitcast is TPU-only; its
        # parity with this path is covered by the on-TPU GEMM kernels
        lo, hi = packing.unpack_w4_nibbles(packed, interpret=True)
        np.testing.assert_array_equal(np.asarray(lo), np.asarray(q[: K // 2]))
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(q[K // 2 :]))
        assert lo.dtype == jnp.int8 and hi.dtype == jnp.int8

    def test_kv4_roundtrip(self):
        q = jax.random.randint(jax.random.PRNGKey(16), (3, 5, 128), 0, 16, jnp.int8)
        out = packing.unpack_kv4(packing.pack_kv4(q))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(q))

    def test_packed_gemm_equivalence(self):
        """GEMM on unpacked(pack(W)) == GEMM on W."""
        kx, kw = jax.random.split(jax.random.PRNGKey(17))
        w = _rand(kw, (1024, 128))
        x = _rand(kx, (4, 1024))
        p = qoq.quantize_weight_per_channel(w)
        packed = packing.pack_w4(p.qweight)
        p2 = p._replace(qweight=packing.unpack_w4(packed))
        a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
        o1 = qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p, out_dtype=jnp.float32)
        o2 = qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p2, out_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
