"""Prefix pool tests: dedup, page sharing, refcounts, engine wiring."""

import numpy as np
import pytest

from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
from qserve_tpu.core.block_manager import BlockSpaceManager
from qserve_tpu.core.prefix import Prefix, PrefixPool
from qserve_tpu.sampling_params import SamplingParams
from qserve_tpu.sequence import Sequence, SequenceGroup


class TestPrefixPool:
    def test_truncation_and_dedup(self):
        pool = PrefixPool(block_size=4)
        a = pool.add_or_get_prefix([1, 2, 3, 4, 5, 6])  # truncates to 4
        b = pool.add_or_get_prefix([1, 2, 3, 4, 9, 9, 9])
        assert a is b
        assert a.length == 4
        assert len(pool) == 1
        assert pool.add_or_get_prefix([1, 2]) is None  # shorter than a page

    def test_match(self):
        p = Prefix([1, 2, 3, 4], 4)
        assert p.match([1, 2, 3, 4, 7, 8])
        assert not p.match([1, 2, 3, 5, 7])


def _group(rid, ids, block_size, prefix=None, counter=[0]):
    counter[0] += 1
    seq = Sequence(counter[0], None, ids, block_size)
    return SequenceGroup(rid, [seq], SamplingParams(), prefix=prefix), seq


class TestBlockSharing:
    def test_two_groups_share_prefix_pages(self):
        bm = BlockSpaceManager(block_size=4, num_device_pages=32)
        pool = PrefixPool(4)
        ids = [1, 2, 3, 4, 5, 6, 7, 8, 10, 11]
        prefix = pool.add_or_get_prefix(ids[:8])

        g1, s1 = _group("a", ids, 4, prefix)
        bm.allocate(g1)
        t1 = bm.get_page_table(s1)
        assert prefix.allocated
        assert t1[:2] == prefix.get_page_numbers()
        free_after_first = bm.get_num_free_device_pages()

        g2, s2 = _group("b", ids[:8] + [20, 21, 22], 4, prefix)
        bm.allocate(g2)
        t2 = bm.get_page_table(s2)
        assert t2[:2] == t1[:2]  # shared pages
        assert t2[2] != t1[2]  # private suffix pages
        # second group only consumed its private page(s)
        assert free_after_first - bm.get_num_free_device_pages() == 1

        # freeing both sequences keeps the prefix pages alive (pool ref)
        bm.free(s1)
        bm.free(s2)
        for p in prefix.get_page_numbers():
            assert bm.device.ref_count(p) == 1

    def test_engine_prefix_request(self):
        from qserve_tpu.engine.llm_engine import LLMEngine
        from qserve_tpu.models import llama
        from qserve_tpu.worker.worker import Worker
        import jax

        args = llama.LlamaArgs(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            quant=QuantSpec.from_precision("w8a8kv8"),
        )
        cache = CacheConfig(block_size=16, num_device_pages=64,
                            quant=args.quant)
        sched = SchedulerConfig(max_num_batched_tokens=256, max_num_seqs=4,
                                max_model_len=64)
        worker = Worker.create(args, cache, sched, seed=0)
        engine = LLMEngine(worker, sched, cache, tokenizer=None)

        shared = list(range(1, 17))  # one full page
        engine.add_request("p0", prompt_token_ids=shared + [40, 41],
                           sampling_params=SamplingParams(max_tokens=2,
                                                          temperature=0.0,
                                                          ignore_eos=True),
                           prefix_pos=16)
        while engine.has_unfinished_requests():
            engine.step()
        assert len(engine.scheduler.prefix_pool) == 1
        pref = next(iter(engine.scheduler.prefix_pool.prefixes.values()))
        assert pref.computed and pref.allocated

        engine.add_request("p1", prompt_token_ids=shared + [50, 51],
                           sampling_params=SamplingParams(max_tokens=2,
                                                          temperature=0.0,
                                                          ignore_eos=True),
                           prefix_pos=16)
        outs = []
        while engine.has_unfinished_requests():
            outs.extend(engine.step())
        assert any(o.finished and o.request_id == "p1" for o in outs)
        assert len(engine.scheduler.prefix_pool) == 1  # deduped
