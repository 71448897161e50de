"""Parity tests: fused elementwise/quant Pallas kernels (interpret mode)
vs the pure-XLA references in kernels/ops.py / quant/qoq.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import pallas_elementwise as pe
from qserve_tpu.quant import qoq


def _assert_quant_match(got, want, rtol=1e-6):
    q_g, s_g, sum_g = got
    q_w, s_w, sum_w = want
    q_g, q_w = np.asarray(q_g, np.int32), np.asarray(q_w, np.int32)
    # reduction-order ulp noise may flip exact round-boundary codes
    diff = np.abs(q_g - q_w)
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3
    np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_w), rtol=rtol)
    if sum_w is None:
        assert sum_g is None
    else:
        np.testing.assert_allclose(
            np.asarray(sum_g), np.asarray(sum_w), rtol=1e-4, atol=1e-5
        )


class TestQuantPerToken:
    @pytest.mark.parametrize("T,K", [(128, 4096), (16, 1024), (8, 128)])
    @pytest.mark.parametrize("with_sum", [False, True])
    def test_matches_reference(self, T, K, with_sum):
        x = jax.random.normal(jax.random.PRNGKey(0), (T, K), jnp.bfloat16)
        got = pe._quant_jit(x, with_sum)
        want = qoq.quantize_activation_per_token(x, with_sum)
        # same amax -> same scale -> identical codes
        q_g, q_w = np.asarray(got[0]), np.asarray(want[0])
        np.testing.assert_array_equal(q_g, q_w)
        _assert_quant_match(got, want)

    def test_unaligned_shapes_fall_back(self):
        assert pe._quant_dispatch(jnp.zeros((5, 256)), False) is None
        assert pe._quant_dispatch(jnp.zeros((8, 200)), False) is None


class TestRMSNormQuant:
    @pytest.mark.parametrize("T,K", [(128, 4096), (24, 512)])
    def test_matches_reference(self, T, K):
        kx, kw = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(kx, (T, K), jnp.bfloat16)
        w = (1.0 + 0.1 * jax.random.normal(kw, (K,), jnp.float32))
        eps = 1e-5
        got = pe._rmsnorm_quant_jit(x, w, eps, True)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + eps) * w
        want = qoq.quantize_activation_per_token(y, True)
        _assert_quant_match(got, want)


class TestSiluMulQuant:
    @pytest.mark.parametrize("T,I", [(64, 1536), (16, 128)])
    def test_matches_reference(self, T, I):
        gu = jax.random.normal(jax.random.PRNGKey(2), (T, 2 * I), jnp.bfloat16)
        got = pe._silu_mul_quant_jit(gu, True)
        g, u = jnp.split(gu.astype(jnp.float32), 2, axis=-1)
        want = qoq.quantize_activation_per_token(jax.nn.silu(g) * u, True)
        _assert_quant_match(got, want)


class TestDispatchContract:
    def test_ops_falls_through_on_none(self, monkeypatch):
        """ops.quant_per_token must run the XLA path when the kernel
        dispatcher declines the shape (ADVICE round-2 contract)."""
        from qserve_tpu.kernels import ops

        monkeypatch.setattr(ops, "use_pallas", lambda: True)
        x = jnp.ones((5, 200), jnp.float32)  # unaligned both ways
        q, s, asum = ops.quant_per_token(x, True)
        assert q.shape == (5, 200) and s.shape == (5, 1)


class TestAddRMSNormQuant:
    @pytest.mark.parametrize("T,K", [(128, 4096), (24, 512)])
    def test_matches_unfused(self, T, K):
        kx, kd, kw = jax.random.split(jax.random.PRNGKey(3), 3)
        h = jax.random.normal(kx, (T, K), jnp.bfloat16)
        d = jax.random.normal(kd, (T, K), jnp.bfloat16)
        w = (1.0 + 0.1 * jax.random.normal(kw, (K,), jnp.float32))
        eps = 1e-5
        h_new, q, s, asum = pe._add_rmsnorm_quant_jit(h, d, w, eps, True)
        # unfused semantics: add in f32, round to bf16, normalize the
        # rounded value (exactly what the pre-fusion path computed)
        want_h = (h.astype(jnp.float32) + d.astype(jnp.float32)).astype(
            jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(h_new), np.asarray(want_h))
        hf = want_h.astype(jnp.float32)
        var = jnp.mean(hf * hf, axis=-1, keepdims=True)
        y = hf * jax.lax.rsqrt(var + eps) * w
        q_w, s_w, sum_w = qoq.quantize_activation_per_token(y, True)
        diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_w, np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_w), rtol=1e-6)
        # each boundary-flipped code moves asum by one scale step
        flips = diff.sum(axis=-1, keepdims=True)
        tol = (flips + 0.01) * np.asarray(s_w)
        assert (np.abs(np.asarray(asum) - np.asarray(sum_w)) <= tol).all()

    def test_ops_wrapper_fallback(self, monkeypatch):
        from qserve_tpu.kernels import ops
        h = jnp.ones((5, 200), jnp.bfloat16)
        d = jnp.full((5, 200), 0.5, jnp.bfloat16)
        w = jnp.ones((200,), jnp.float32)
        h_new, q, s, asum = ops.add_rmsnorm_quant(h, d, w, 1e-6, True)
        assert h_new.shape == (5, 200) and q.shape == (5, 200)
        np.testing.assert_allclose(np.asarray(h_new, np.float32), 1.5)
