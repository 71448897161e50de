"""Scheduler semantics tests (pure Python, no device)."""

from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
from qserve_tpu.core.scheduler import Scheduler
from qserve_tpu.sampling_params import SamplingParams
from qserve_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

BS = 16
_next_id = [0]


def make_scheduler(pages=32, max_tokens=256, max_seqs=8, max_len=512):
    sc = SchedulerConfig(
        max_num_batched_tokens=max_tokens, max_num_seqs=max_seqs, max_model_len=max_len
    )
    cc = CacheConfig(
        block_size=BS, num_device_pages=pages,
        quant=QuantSpec.from_precision("w4a8kv4"),
    )
    return Scheduler(sc, cc)


def add_request(sched, req_id, prompt_len, max_tokens=64):
    _next_id[0] += 1
    seq = Sequence(_next_id[0], "p", list(range(prompt_len)), BS)
    group = SequenceGroup(req_id, [seq], SamplingParams(max_tokens=max_tokens))
    sched.add_seq_group(group)
    return group, seq


class TestAdmission:
    def test_prompt_batch_first(self):
        s = make_scheduler()
        add_request(s, "a", 20)
        add_request(s, "b", 30)
        md, out = s.schedule()
        assert out.prompt_run
        assert len(md) == 2
        assert out.num_batched_tokens == 50
        assert not s.waiting

    def test_token_budget_limits_batch(self):
        s = make_scheduler(max_tokens=64)
        add_request(s, "a", 40)
        add_request(s, "b", 40)
        md, out = s.schedule()
        assert out.prompt_run and len(md) == 1
        md, out = s.schedule()
        assert out.prompt_run and len(md) == 1

    def test_seq_budget(self):
        s = make_scheduler(max_seqs=2)
        for i in range(4):
            add_request(s, f"r{i}", 8)
        md, _ = s.schedule()
        assert len(md) == 2

    def test_too_long_prompt_ignored(self):
        s = make_scheduler(max_tokens=64, max_len=64)
        g, seq = add_request(s, "big", 100)
        md, out = s.schedule()
        assert not md
        assert out.ignored_seq_groups == [g]
        assert seq.status == SequenceStatus.FINISHED_IGNORED

    def test_decode_after_prefill(self):
        s = make_scheduler()
        g, seq = add_request(s, "a", 20)
        s.schedule()
        seq.append_token_id(1)
        md, out = s.schedule()
        assert not out.prompt_run
        assert len(md) == 1
        assert md[0].block_tables[seq.seq_id]


class TestPreemption:
    def test_preempt_by_recompute_when_pages_exhausted(self):
        # 4 pages; two seqs of 1.9 pages each -> 4 allocated; growth forces
        # preemption of the newer seq.
        s = make_scheduler(pages=4)
        ga, sa = add_request(s, "a", BS * 2 - 1)
        s.schedule()
        gb, sb = add_request(s, "b", BS * 2 - 1)
        s.schedule()
        assert s.block_manager.get_num_free_device_pages() == 0
        # both grow past the page boundary -> need 2 new pages, have 0
        sa.append_token_id(1)
        sb.append_token_id(1)
        md, out = s.schedule()
        assert not out.prompt_run
        # one survives, one got preempted back to waiting
        assert len(md) == 1
        assert len(s.waiting) == 1
        preempted = s.waiting[0]
        pseq = preempted.get_seqs()[0]
        assert pseq.status == SequenceStatus.WAITING
        # generated token is preserved for recompute
        assert pseq.get_output_len() == 1

    def test_preempted_prompt_readmitted(self):
        s = make_scheduler(pages=4)
        ga, sa = add_request(s, "a", BS * 2 - 1)
        s.schedule()
        gb, sb = add_request(s, "b", BS * 2 - 1)
        s.schedule()
        sa.append_token_id(1)
        sb.append_token_id(1)
        s.schedule()  # preempts one
        # finish the survivor
        survivor = s.running[0].get_seqs()[0]
        survivor.status = SequenceStatus.FINISHED_STOPPED
        s.free_seq(survivor)
        s.free_finished_seq_groups()
        md, out = s.schedule()
        assert out.prompt_run and len(md) == 1
        # re-prefill includes the generated token (recompute semantics)
        (seq_id, data), = md[0].seq_data.items()
        assert data.get_len() == BS * 2  # prompt + 1 generated


class TestLifecycle:
    def test_abort(self):
        s = make_scheduler()
        g, seq = add_request(s, "a", 8)
        s.abort_seq_group(["a"])
        assert not s.has_unfinished_seqs()

    def test_finished_groups_removed(self):
        s = make_scheduler()
        g, seq = add_request(s, "a", 8)
        s.schedule()
        seq.append_token_id(1)
        seq.status = SequenceStatus.FINISHED_STOPPED
        s.free_seq(seq)
        s.free_finished_seq_groups()
        assert not s.has_unfinished_seqs()
        assert s.block_manager.get_num_free_device_pages() == 32


class TestSchedulerDeterminism:
    """Replicated multi-host serving requires every host's scheduler to make
    IDENTICAL decisions from an identical request stream (the design in
    parallel/distributed.py; exercised end-to-end by
    scripts/dryrun_multihost.py)."""

    def _drive(self):
        from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
        from qserve_tpu.core.scheduler import Scheduler
        from qserve_tpu.sampling_params import SamplingParams
        from qserve_tpu.sequence import Sequence, SequenceGroup

        sc = SchedulerConfig(max_num_batched_tokens=64, max_num_seqs=4,
                             max_model_len=128)
        cc = CacheConfig(block_size=8, num_device_pages=20,
                         quant=QuantSpec.from_precision("w4a8kv4"))
        sched = Scheduler(sc, cc)
        trace = []
        next_id = [0]

        def add(prompt_len):
            seq = Sequence(next_id[0], None, list(range(1, prompt_len + 1)), 8)
            next_id[0] += 1
            sched.add_seq_group(SequenceGroup(
                f"r{seq.seq_id}", [seq], SamplingParams(max_tokens=8)
            ))

        # interleave adds with steps; append a token to every scheduled seq
        script = [3, None, 10, 5, None, None, 17, None, None, None, None, None]
        for ev in script:
            if ev is not None:
                add(ev)
                continue
            metadata, out = sched.schedule()
            snap = []
            for md in metadata:
                for sid in sorted(md.seq_data):
                    snap.append((
                        md.request_id, sid, md.is_prompt,
                        tuple(md.block_tables[sid]),
                        md.seq_data[sid].get_len(),
                    ))
            trace.append((tuple(snap), out.prompt_run,
                          tuple(sorted(out.blocks_to_copy.items()))))
            for md in metadata:
                for sid, data in md.seq_data.items():
                    data.append_token_id(99)
        return trace

    def test_identical_traces(self):
        t1 = self._drive()
        t2 = self._drive()
        assert t1 == t2
        assert any(step[0] for step in t1)  # something actually scheduled


class TestChunkedPrefillPriority:
    def test_mid_chunk_group_rotates_to_queue_head(self):
        """A recompute-preempted prompt appendleft'ed ahead of a mid-chunk
        group must not starve it: the page-holding mid-chunk group rotates
        back to the head and keeps prefilling."""
        from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
        from qserve_tpu.core.scheduler import Scheduler
        from qserve_tpu.sampling_params import SamplingParams
        from qserve_tpu.sequence import Sequence, SequenceGroup

        sc = SchedulerConfig(max_num_batched_tokens=32, max_num_seqs=4,
                             max_model_len=256)
        cc = CacheConfig(block_size=8, num_device_pages=32,
                         quant=QuantSpec.from_precision("w4a8kv4"))
        sched = Scheduler(sc, cc)

        long_seq = Sequence(0, None, list(range(1, 101)), 8)  # 100 tokens
        long_group = SequenceGroup("long", [long_seq], SamplingParams())
        sched.add_seq_group(long_group)

        md, out = sched.schedule()  # first chunk (32 tokens)
        assert out.prompt_chunks[0] == (0, 32)
        assert long_seq.data.computed_tokens == 32

        # simulate a preempted group jumping the queue
        other = Sequence(1, None, [1, 2, 3], 8)
        other_group = SequenceGroup("other", [other], SamplingParams())
        sched.waiting.appendleft(other_group)

        md, out = sched.schedule()  # must continue the CHUNKED group
        assert out.scheduled_seq_groups[0] is long_group
        assert out.prompt_chunks[0] == (32, 64)
        assert long_seq.data.computed_tokens == 64
