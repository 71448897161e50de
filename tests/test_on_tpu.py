"""Compiled-kernel parity checks that only run when a real TPU is attached.

The regular suite validates every kernel in Pallas interpret mode on CPU;
these re-run the critical ones through the actual Mosaic compiler (bitcast
nibble tricks, DMA alignment, input_output_aliases) when `pytest` executes
on a TPU host. They skip cleanly on CPU CI.
"""

import os

import numpy as np
import pytest

import jax

if jax.devices()[0].platform not in ("tpu", "axon"):
    pytest.skip("real TPU required", allow_module_level=True)

import jax.numpy as jnp

from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.kernels.pallas_gemm import w4a8_gemm_per_chn_pallas
from qserve_tpu.kernels.pallas_kv_append import kv_append_inplace
from qserve_tpu.quant import packing, qoq


def test_w4a8_chn_gemm_compiled_matches_ref():
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (32, 1024), jnp.float32)
    w = jax.random.normal(kw, (1024, 512), jnp.float32) * 0.05
    p = qoq.quantize_weight_per_channel(w)
    packed = packing.pack_w4(p.qweight)
    a, ascale, asum = qoq.quantize_activation_per_token(x, with_sum=True)
    out = w4a8_gemm_per_chn_pallas(a, ascale, asum, packed, p.s1_scale,
                                   p.s1_szero)
    ref = qoq.w4a8_gemm_per_channel_ref(a, ascale, asum, p)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2,
                               atol=2e-2)


def test_kv_append_inplace_compiled_bit_exact():
    L, P, H, D, ps = 2, 8, 2, 128, 128
    T = 5
    key = jax.random.PRNGKey(0)
    cache = kvc.create_kv_cache(L, P, H, ps, D, 4)
    cache = kvc.KVCache(
        data=jax.random.randint(key, cache.data.shape, -128, 127, jnp.int8),
        scales=jax.random.normal(key, cache.scales.shape),
    )
    k = jax.random.normal(jax.random.fold_in(key, 1), (L, T, H, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (L, T, H, D))
    pages = jnp.asarray([0, 3, 4, -1, 7], jnp.int32)
    slots = jnp.asarray([2, 0, 9, 1, 127], jnp.int32)
    rows, sc = kvc._quantize_rows(k, v, 4, True)
    d1, s1 = kv_append_inplace(cache.data, cache.scales, rows, sc, pages, slots)
    safe = jnp.where(pages >= 0, pages, P)
    d2 = cache.data.at[:, safe, :, slots, :].set(
        jnp.swapaxes(rows, 0, 1), mode="drop")
    s2 = cache.scales.at[:, safe, :, :, slots].set(
        jnp.swapaxes(sc, 0, 1), mode="drop")
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
