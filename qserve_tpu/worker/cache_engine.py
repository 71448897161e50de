"""Device KV page pool management: allocation, CoW copies, CPU swap.

Reference counterpart: qserve/worker/cache_engine.py (whose CPU-swap/copy
methods are stubs, :148-177 — here they are real: page copies run as a jitted
gather/scatter on device; swaps move page slices host<->device).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.config import CacheConfig, ModelConfig, ParallelConfig
from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.logger import init_logger

logger = init_logger(__name__)


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_pages(cache: kvc.KVCache, src: jax.Array, dst: jax.Array) -> kvc.KVCache:
    """cache[*, dst] = cache[*, src] for every layer array (CoW support)."""
    return kvc.KVCache(
        *(a.at[:, dst].set(a[:, src]) for a in cache)
    )


class CacheEngine:
    """Owns the device KVCache arrays + a host-side swap pool."""

    def __init__(
        self,
        num_layers: int,
        num_kv_heads: int,
        head_dim: int,
        cache_config: CacheConfig,
    ) -> None:
        self.cache_config = cache_config
        self.block_size = cache_config.block_size
        self.num_pages = cache_config.num_device_pages
        assert self.num_pages, "num_device_pages must be resolved before CacheEngine"
        self.kv_bits = cache_config.quant.kv_bits
        self.cache = kvc.create_kv_cache(
            num_layers,
            self.num_pages,
            num_kv_heads,
            self.block_size,
            head_dim,
            kv_bits=self.kv_bits,
        )
        self.cpu_pool: Dict[int, list] = {}  # cpu page id -> list of np arrays

    def copy(self, blocks_to_copy: Dict[int, List[int]]) -> None:
        if not blocks_to_copy:
            return
        src, dst = [], []
        for s, ds in blocks_to_copy.items():
            for d in ds:
                src.append(s)
                dst.append(d)
        self.cache = _copy_pages(
            self.cache, jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32)
        )

    def swap_out(self, mapping: Dict[int, int]) -> None:
        """device page -> cpu page (host copy)."""
        if not mapping:
            return
        pages = jnp.asarray(list(mapping.keys()), jnp.int32)
        host = jax.device_get(tuple(a[:, pages] for a in self.cache))
        for i, cpu_page in enumerate(mapping.values()):
            self.cpu_pool[cpu_page] = [np.asarray(a[:, i]) for a in host]

    def swap_in(self, mapping: Dict[int, int]) -> None:
        """cpu page -> device page."""
        if not mapping:
            return
        cache = list(self.cache)
        for cpu_page, dev_page in mapping.items():
            arrs = self.cpu_pool.pop(cpu_page)
            for j in range(len(cache)):
                cache[j] = cache[j].at[:, dev_page].set(jnp.asarray(arrs[j]))
        self.cache = kvc.KVCache(*cache)

    @staticmethod
    def page_bytes(
        num_layers: int,
        num_kv_heads: int,
        head_dim: int,
        cache_config: CacheConfig,
    ) -> int:
        dc = head_dim // 2 if cache_config.quant.kv_bits == 4 else head_dim
        ps = cache_config.block_size
        # data [2, ps, H, Dc] int8 + scales [2, ps, H, 2] f32
        per_layer = 2 * ps * num_kv_heads * dc + 2 * ps * num_kv_heads * 2 * 4
        return num_layers * per_layer
