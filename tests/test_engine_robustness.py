"""Engine robustness: abort, preemption under page pressure, CPU swap e2e."""

import jax
import numpy as np
import pytest

from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
from qserve_tpu.engine.llm_engine import LLMEngine
from qserve_tpu.models import llama
from qserve_tpu.sampling_params import SamplingParams
from qserve_tpu.worker.worker import Worker

QUANT = QuantSpec.from_precision("w8a8kv8")
ARGS = llama.LlamaArgs(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16, quant=QUANT,
)


def make_engine(num_pages, max_seqs=4, num_cpu_pages=0, max_len=96):
    cache = CacheConfig(block_size=16, num_device_pages=num_pages,
                        num_cpu_pages=num_cpu_pages, quant=QUANT)
    sched = SchedulerConfig(max_num_batched_tokens=256, max_num_seqs=max_seqs,
                            max_model_len=max_len)
    worker = Worker.create(ARGS, cache, sched, seed=0)
    return LLMEngine(worker, sched, cache, tokenizer=None)


def drive(engine, max_steps=200):
    outs = []
    steps = 0
    while engine.has_unfinished_requests() and steps < max_steps:
        outs.extend(engine.step())
        steps += 1
    return outs, steps


class TestAbort:
    def test_abort_waiting_and_running(self):
        engine = make_engine(32)
        sp = SamplingParams(max_tokens=20, temperature=0.0, ignore_eos=True)
        engine.add_request("a", prompt_token_ids=[1, 2, 3], sampling_params=sp)
        engine.add_request("b", prompt_token_ids=[4, 5, 6], sampling_params=sp)
        engine.step()  # prefill both
        free_mid = engine.scheduler.block_manager.get_num_free_device_pages()
        engine.abort_request("a")
        outs, _ = drive(engine)
        done = {o.request_id for o in outs if o.finished}
        assert done == {"b"}
        # all pages returned after completion
        assert (engine.scheduler.block_manager.get_num_free_device_pages()
                == 32)
        assert engine.scheduler.block_manager.get_num_free_device_pages() > free_mid

    def test_abort_unknown_is_noop(self):
        engine = make_engine(16)
        engine.abort_request("nope")  # must not raise


class TestPreemption:
    def test_recompute_preemption_under_page_pressure(self):
        # 6 pages total; 3 seqs each eventually needing ~3 pages -> preempt
        engine = make_engine(num_pages=7, max_seqs=3)
        sp = SamplingParams(max_tokens=34, temperature=0.0, ignore_eos=True)
        for i in range(3):
            engine.add_request(f"r{i}", prompt_token_ids=[i + 1] * 14,
                               sampling_params=sp)
        outs, steps = drive(engine, max_steps=400)
        done = {o.request_id for o in outs if o.finished}
        assert done == {"r0", "r1", "r2"}
        for o in outs:
            if o.finished:
                assert len(o.outputs[0]["token_ids"]) == 34
        assert engine.scheduler.block_manager.get_num_free_device_pages() == 7

    def test_swap_preemption_roundtrip(self):
        """Force SWAP mode preemption via the scheduler API + cache engine."""
        engine = make_engine(num_pages=8, num_cpu_pages=8)
        sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
        engine.add_request("s0", prompt_token_ids=[1] * 14, sampling_params=sp)
        engine.step()  # prefill -> RUNNING with 1 page
        sched = engine.scheduler
        group = sched.running[0]

        from qserve_tpu.core.scheduler import PreemptionMode

        swaps = {}
        sched._preempt(group, swaps, mode=PreemptionMode.SWAP)
        sched.running.clear()
        assert group in sched.swapped and swaps
        engine.worker.cache_engine.swap_out(swaps)

        outs, _ = drive(engine)  # scheduler swaps back in and finishes
        done = [o for o in outs if o.finished]
        assert len(done) == 1
        assert len(done[0].outputs[0]["token_ids"]) == 8


class TestDeterminism:
    def test_greedy_generation_reproducible(self):
        def gen():
            engine = make_engine(32)
            engine.add_request(
                "d", prompt_token_ids=[7, 8, 9],
                sampling_params=SamplingParams(max_tokens=10, temperature=0.0,
                                               ignore_eos=True),
            )
            outs, _ = drive(engine)
            return [o for o in outs if o.finished][0].outputs[0]["token_ids"]

        assert gen() == gen()
