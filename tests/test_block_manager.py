"""Unit tests for the page allocator / block space manager (pure Python)."""

import pytest

from qserve_tpu.core.block_manager import AllocStatus, BlockSpaceManager, PageAllocator
from qserve_tpu.sampling_params import SamplingParams
from qserve_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

BS = 16  # tokens per page


def make_group(req_id, prompt_len, n=1):
    seqs = [Sequence(i + hash(req_id) % 1000 * 10, "p", list(range(prompt_len)), BS)
            for i in range(n)]
    return SequenceGroup(req_id, seqs, SamplingParams(max_tokens=64))


class TestPageAllocator:
    def test_alloc_free_cycle(self):
        a = PageAllocator(4)
        pages = [a.allocate() for _ in range(4)]
        assert len(set(pages)) == 4
        with pytest.raises(RuntimeError):
            a.allocate()
        a.free(pages[0])
        assert a.get_num_free() == 1

    def test_refcount(self):
        a = PageAllocator(2)
        p = a.allocate()
        a.incref(p)
        a.free(p)
        assert a.get_num_free() == 1  # still held once
        a.free(p)
        assert a.get_num_free() == 2

    def test_double_free_raises(self):
        a = PageAllocator(2)
        p = a.allocate()
        a.free(p)
        with pytest.raises(ValueError):
            a.free(p)


class TestBlockSpaceManager:
    def test_allocate_and_free(self):
        m = BlockSpaceManager(BS, num_device_pages=8, watermark=0.0)
        g = make_group("r0", prompt_len=33)  # 3 pages
        assert m.can_allocate(g) == AllocStatus.OK
        m.allocate(g)
        seq = g.get_seqs()[0]
        assert len(m.get_page_table(seq)) == 3
        assert m.get_num_free_device_pages() == 5
        m.free(seq)
        assert m.get_num_free_device_pages() == 8

    def test_watermark_defers(self):
        m = BlockSpaceManager(BS, num_device_pages=10, watermark=0.2)  # 2 reserved
        g1 = make_group("r0", prompt_len=BS * 5)
        assert m.can_allocate(g1) == AllocStatus.OK
        m.allocate(g1)  # free: 5
        g2 = make_group("r1", prompt_len=BS * 4)
        # 5 free - 4 needed = 1 < watermark(2) -> defer
        assert m.can_allocate(g2) == AllocStatus.LATER

    def test_never_fits(self):
        m = BlockSpaceManager(BS, num_device_pages=4, watermark=0.0)
        g = make_group("r0", prompt_len=BS * 5)
        assert m.can_allocate(g) == AllocStatus.NEVER

    def test_append_slot_grows_on_boundary(self):
        m = BlockSpaceManager(BS, num_device_pages=8, watermark=0.0)
        g = make_group("r0", prompt_len=BS)  # exactly 1 page
        m.allocate(g)
        seq = g.get_seqs()[0]
        seq.status = SequenceStatus.RUNNING
        assert len(m.get_page_table(seq)) == 1
        seq.append_token_id(5)  # token BS+1 -> needs 2nd page
        assert m.append_slot(seq) is None
        assert len(m.get_page_table(seq)) == 2
        seq.append_token_id(6)  # still fits
        assert m.append_slot(seq) is None
        assert len(m.get_page_table(seq)) == 2

    def test_fork_and_cow(self):
        m = BlockSpaceManager(BS, num_device_pages=8, watermark=0.0)
        g = make_group("r0", prompt_len=BS - 1)
        m.allocate(g)
        parent = g.get_seqs()[0]
        parent.status = SequenceStatus.RUNNING
        child = parent.fork(999)
        m.fork(parent, child)
        free_before = m.get_num_free_device_pages()
        # parent appends within the shared (ref=2) page -> CoW
        parent.append_token_id(1)
        cow = m.append_slot(parent)
        assert cow is not None
        src, dst = cow
        assert m.get_page_table(parent)[-1] == dst
        assert m.get_page_table(child)[-1] == src
        assert m.get_num_free_device_pages() == free_before - 1
        # child then appends in its own (now ref=1) page -> no CoW
        child.append_token_id(1)
        assert m.append_slot(child) is None

    def test_swap_out_in_roundtrip(self):
        m = BlockSpaceManager(BS, num_device_pages=4, num_cpu_pages=4, watermark=0.0)
        g = make_group("r0", prompt_len=BS * 2)
        m.allocate(g)
        seq = g.get_seqs()[0]
        seq.status = SequenceStatus.RUNNING
        table0 = list(m.get_page_table(seq))
        assert m.can_swap_out(g)
        out_map = m.swap_out(g)
        seq.status = SequenceStatus.SWAPPED
        assert set(out_map.keys()) == set(table0)
        assert m.get_num_free_device_pages() == 4
        assert m.can_swap_in(g)
        in_map = m.swap_in(g)
        seq.status = SequenceStatus.RUNNING
        assert len(m.get_page_table(seq)) == 2
        assert m.get_num_free_device_pages() == 2
