"""Staged full-page prefill append vs the XLA scatter reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.kernels import kv_cache as kvc, ops


@pytest.fixture()
def force_pallas(monkeypatch):
    monkeypatch.setattr(ops, "use_pallas", lambda: True)


def _prefill_pattern(ps, lens):
    """Packed-prompt page/slot pattern: each prompt gets fresh pages."""
    page_ids, slots = [], []
    next_page = 1  # leave page 0 untouched to check it survives
    for ln in lens:
        pages = list(range(next_page, next_page + -(-ln // ps)))
        next_page += len(pages)
        for i in range(ln):
            page_ids.append(pages[i // ps])
            slots.append(i % ps)
    return np.asarray(page_ids, np.int32), np.asarray(slots, np.int32)


@pytest.mark.parametrize("kv_bits", [4, 8])
def test_staged_prefill_matches_scatter(force_pallas, kv_bits):
    L, P, H, D, ps = 2, 12, 2, 128, 16
    lens = [20, 7, 16]
    pg, sl = _prefill_pattern(ps, lens)
    T_real = len(pg)
    T = 64  # padded stream
    page_ids = np.full(T, -1, np.int32)
    slots = np.zeros(T, np.int32)
    page_ids[:T_real] = pg
    slots[:T_real] = sl

    key = jax.random.PRNGKey(0)
    cache = kvc.create_kv_cache(L, P, H, ps, D, kv_bits)
    k = jax.random.normal(key, (L, T, H, D))
    v = jax.random.normal(jax.random.fold_in(key, 1), (L, T, H, D))

    out_pallas = kvc.append_all_layers(
        cache, k, v, jnp.asarray(page_ids), jnp.asarray(slots), kv_bits, True,
        max_stages=T // ps + len(lens) + 1,
    )
    out_xla = kvc.append_all_layers(
        cache, k, v, jnp.asarray(page_ids), jnp.asarray(slots), kv_bits, True,
    )
    # written slots must agree; unwritten slots of touched pages are zeros in
    # both (fresh cache), untouched pages (page 0) must be identical
    np.testing.assert_array_equal(np.asarray(out_pallas.data),
                                  np.asarray(out_xla.data))
    np.testing.assert_allclose(np.asarray(out_pallas.scales),
                               np.asarray(out_xla.scales), rtol=1e-6)


def test_staged_prefill_overwrites_partial_pages_with_zeros(force_pallas):
    """Documented precondition: staged pages clobber unwritten slots (fine
    for fresh pages; prompts always start at slot 0 of new pages)."""
    L, P, H, D, ps = 1, 4, 2, 128, 16
    cache = kvc.create_kv_cache(L, P, H, ps, D, 4)
    cache = kvc.KVCache(
        data=jnp.ones_like(cache.data), scales=jnp.ones_like(cache.scales)
    )
    T = 16
    page_ids = np.full(T, -1, np.int32)
    slots = np.zeros(T, np.int32)
    page_ids[:4] = 2  # 4 tokens into page 2
    slots[:4] = np.arange(4)
    k = jnp.ones((L, T, H, D))
    v = jnp.ones((L, T, H, D))
    out = kvc.append_all_layers(
        cache, k, v, jnp.asarray(page_ids), jnp.asarray(slots), 4, True,
        max_stages=4,
    )
    d = np.asarray(out.data)
    # untouched pages keep old contents
    assert (d[:, 0] == 1).all() and (d[:, 3] == 1).all()
    # touched page: slots 4.. are zeroed (whole-page write)
    assert (d[:, 2, :, 4:, :] == 0).all()
