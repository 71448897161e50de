"""Staged full-page prefill append vs the XLA scatter reference.

The staged path writes WHOLE pages: written slots must match the scatter
reference exactly; unwritten tail slots of a partial page are
implementation-defined (gather staging fills them with neighboring-token
garbage — they are masked by context length everywhere and rewritten by
the decode RMW kernel before ever becoming visible)."""

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
def test_staged_prefill_matches_scatter_on_written_slots(force_pallas,
                                                         kv_bits):
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
    dp, dx = np.asarray(out_pallas.data), np.asarray(out_xla.data)
    sp, sx = np.asarray(out_pallas.scales, np.float32), np.asarray(
        out_xla.scales, np.float32)
    # every written (page, slot) must agree exactly
    for t in range(T_real):
        np.testing.assert_array_equal(
            dp[:, page_ids[t], :, slots[t], :],
            dx[:, page_ids[t], :, slots[t], :],
        )
        np.testing.assert_allclose(
            sp[:, page_ids[t], :, :, slots[t]],
            sx[:, page_ids[t], :, :, slots[t]], rtol=1e-6,
        )
    # untouched pages (0 and the tail of the pool) must be identical
    touched = set(pg.tolist())
    for p in range(P):
        if p not in touched:
            np.testing.assert_array_equal(dp[:, p], dx[:, p])
            np.testing.assert_array_equal(sp[:, p], sx[:, p])
    # staged tails must at least be FINITE (they multiply into masked
    # attention lanes before the position mask zeroes them)
    assert np.isfinite(sp).all()


def test_staged_prefill_clobbers_only_touched_pages(force_pallas):
    """Documented precondition: staged pages are written WHOLE (unwritten
    slots become never-read garbage); untouched pages must survive."""
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
    key = jax.random.PRNGKey(3)
    k = jax.random.normal(key, (L, T, H, D))
    v = jax.random.normal(jax.random.fold_in(key, 1), (L, T, H, D))
    out = kvc.append_all_layers(
        cache, k, v, jnp.asarray(page_ids), jnp.asarray(slots), 4, True,
        max_stages=4,
    )
    ref = kvc.append_all_layers(
        cache, k, v, jnp.asarray(page_ids), jnp.asarray(slots), 4, True,
    )
    d, r = np.asarray(out.data), np.asarray(ref.data)
    # untouched pages keep old contents
    assert (d[:, 0] == 1).all() and (d[:, 3] == 1).all()
    # written slots match the scatter reference
    np.testing.assert_array_equal(d[:, 2, :, :4, :], r[:, 2, :, :4, :])
    assert np.isfinite(np.asarray(out.scales, np.float32)).all()
