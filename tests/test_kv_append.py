"""Pallas in-place KV append vs the XLA scatter reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.kernels.pallas_kv_append import kv_append_inplace


@pytest.mark.parametrize("kv_bits", [4, 8])
def test_inplace_matches_scatter(kv_bits):
    L, P, H, D, ps = 3, 8, 2, 128, 16
    T = 5
    key = jax.random.PRNGKey(0)
    cache = kvc.create_kv_cache(L, P, H, ps, D, kv_bits)
    # pre-existing content to prove untouched regions stay intact
    cache = kvc.KVCache(
        data=jax.random.randint(key, cache.data.shape, -128, 127, jnp.int8),
        scales=jax.random.normal(key, cache.scales.shape),
    )
    k = jax.random.normal(jax.random.fold_in(key, 1), (L, T, H, D))
    v = jax.random.normal(jax.random.fold_in(key, 2), (L, T, H, D))
    # distinct pages (the kernel's precondition — decode's CoW guarantees
    # exclusive last pages), plus a dropped row
    pages = jnp.asarray([0, 3, 4, -1, 7], jnp.int32)
    slots = jnp.asarray([2, 0, 9, 1, 15], jnp.int32)

    rows, sc = kvc._quantize_rows(k, v, kv_bits, True)
    d1, s1 = kv_append_inplace(cache.data, cache.scales, rows, sc, pages, slots)

    valid = pages >= 0
    safe = jnp.where(valid, pages, P)
    d2 = cache.data.at[:, safe, :, slots, :].set(
        jnp.swapaxes(rows, 0, 1), mode="drop")
    s2 = cache.scales.at[:, safe, :, :, slots].set(
        jnp.swapaxes(sc, 0, 1), mode="drop")

    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_dispatch_decode_vs_prefill_path():
    """append_all_layers output identical regardless of dispatch path."""
    L, P, H, D, ps = 2, 6, 2, 128, 16
    T = 4
    cache = kvc.create_kv_cache(L, P, H, ps, D, 4)
    key = jax.random.PRNGKey(3)
    k = jax.random.normal(key, (L, T, H, D))
    v = jax.random.normal(jax.random.fold_in(key, 1), (L, T, H, D))
    pages = jnp.asarray([0, 1, 2, 5], jnp.int32)
    slots = jnp.asarray([0, 3, 7, 11], jnp.int32)

    out_xla = kvc.append_all_layers(cache, k, v, pages, slots, 4, True)
    rows, sc = kvc._quantize_rows(k, v, 4, True)
    d, s = kv_append_inplace(cache.data, cache.scales, rows, sc, pages, slots)
    np.testing.assert_array_equal(np.asarray(out_xla.data), np.asarray(d))
    np.testing.assert_allclose(np.asarray(out_xla.scales), np.asarray(s),
                               rtol=1e-6)


class TestScaleDtypeSelection:
    """bf16 KV scales apply exactly when the 2H sublane dim is bf16-tile
    aligned; smaller geometries keep f32 (padding would cancel the byte
    saving). Pins the policy so the fallback can't regress silently."""

    @pytest.mark.parametrize(
        "kv_heads,expect",
        [(8, jnp.bfloat16), (16, jnp.bfloat16), (4, jnp.float32),
         (2, jnp.float32), (1, jnp.float32)],
    )
    def test_geometry_to_scale_dtype(self, kv_heads, expect):
        c = kvc.create_kv_cache(1, 2, kv_heads, 128, 128, 4)
        assert c.scales.dtype == expect, (kv_heads, c.scales.dtype)

    def test_explicit_override_wins(self):
        c = kvc.create_kv_cache(1, 2, 8, 128, 128, 4, scale_dtype=jnp.float32)
        assert c.scales.dtype == jnp.float32
