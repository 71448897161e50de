"""End-to-end LLMEngine tests on a tiny random model (CPU)."""

import numpy as np
import pytest

from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
from qserve_tpu.engine.llm_engine import LLMEngine
from qserve_tpu.models import llama
from qserve_tpu.sampling_params import SamplingParams
from qserve_tpu.worker.worker import Worker

BS = 16


def build_engine(pages=64, max_seqs=8, max_tokens=256, max_len=256, precision="w4a8kv4"):
    args = llama.LlamaArgs(
        vocab_size=128,
        hidden_size=128,
        intermediate_size=256,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        quant=QuantSpec.from_precision(precision),
    )
    sc = SchedulerConfig(
        max_num_batched_tokens=max_tokens, max_num_seqs=max_seqs, max_model_len=max_len
    )
    cc = CacheConfig(
        block_size=BS, num_device_pages=pages, quant=args.quant,
    )
    worker = Worker.create(args, cc, sc, seed=0)
    return LLMEngine(worker, sc, cc)


def run_to_completion(engine, max_steps=200):
    outputs = {}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                outputs[out.request_id] = out
        steps += 1
        assert steps < max_steps, "engine did not converge"
    return outputs, steps


class TestEngineE2E:
    def test_basic_generation(self):
        engine = build_engine()
        engine.add_request(
            "r0", prompt_token_ids=[1, 5, 9, 13],
            sampling_params=SamplingParams(max_tokens=8, temperature=0.0),
        )
        outputs, _ = run_to_completion(engine)
        out = outputs["r0"]
        assert out.finished
        assert len(out.outputs[0]["token_ids"]) == 8
        assert out.outputs[0]["finish_reason"] == "length"

    def test_many_requests_ifb(self):
        engine = build_engine(max_seqs=4)
        for i in range(10):
            engine.add_request(
                f"r{i}", prompt_token_ids=[i + 1, i + 2, i + 3],
                sampling_params=SamplingParams(max_tokens=4 + i % 3, temperature=0.0),
            )
        outputs, _ = run_to_completion(engine)
        assert len(outputs) == 10
        for i in range(10):
            assert len(outputs[f"r{i}"].outputs[0]["token_ids"]) == 4 + i % 3

    def test_greedy_deterministic_across_batching(self):
        """Same request alone vs batched with others: identical greedy tokens."""
        engine = build_engine()
        engine.add_request(
            "solo", prompt_token_ids=[7, 8, 9],
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
        )
        solo, _ = run_to_completion(engine)

        engine2 = build_engine()
        for i in range(3):
            engine2.add_request(
                f"other{i}", prompt_token_ids=[20 + i],
                sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
            )
        engine2.add_request(
            "solo", prompt_token_ids=[7, 8, 9],
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
        )
        batched, _ = run_to_completion(engine2)
        assert (
            solo["solo"].outputs[0]["token_ids"]
            == batched["solo"].outputs[0]["token_ids"]
        )

    def test_stop_token(self):
        engine = build_engine()
        engine.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_tokens=50, temperature=0.0),
        )
        # find what greedy generates, then use its 3rd token as a stop token
        outputs, _ = run_to_completion(engine)
        toks = outputs["r0"].outputs[0]["token_ids"]
        stop_tok = toks[2]

        engine2 = build_engine()
        engine2.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                max_tokens=50, temperature=0.0, stop_token_ids=[stop_tok]
            ),
        )
        outputs2, _ = run_to_completion(engine2)
        toks2 = outputs2["r0"].outputs[0]["token_ids"]
        assert toks2[-1] == stop_tok
        # stops at the FIRST occurrence of the stop token
        assert len(toks2) == toks.index(stop_tok) + 1
        assert outputs2["r0"].outputs[0]["finish_reason"] == "stop"

    def test_max_model_len_caps(self):
        engine = build_engine(max_len=24)
        engine.add_request(
            "r0", prompt_token_ids=list(range(1, 20)),
            sampling_params=SamplingParams(max_tokens=100, temperature=0.0),
        )
        outputs, _ = run_to_completion(engine)
        assert outputs["r0"].outputs[0]["finish_reason"] == "length"
        assert len(outputs["r0"].outputs[0]["token_ids"]) == 24 - 19

    def test_page_pressure_preemption_still_completes(self):
        """More concurrent requests than pages -> preemption, all finish."""
        engine = build_engine(pages=8, max_seqs=8)
        for i in range(6):
            engine.add_request(
                f"r{i}", prompt_token_ids=[i + 1] * (BS - 2),
                sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
            )
        outputs, _ = run_to_completion(engine, max_steps=400)
        assert len(outputs) == 6
        for i in range(6):
            assert len(outputs[f"r{i}"].outputs[0]["token_ids"]) == 6
        # all pages returned
        assert engine.scheduler.block_manager.get_num_free_device_pages() == 8

    def test_sampled_generation_valid(self):
        engine = build_engine()
        engine.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                max_tokens=12, temperature=0.9, top_p=0.9, top_k=20
            ),
        )
        outputs, _ = run_to_completion(engine)
        toks = outputs["r0"].outputs[0]["token_ids"]
        assert len(toks) == 12
        assert all(0 <= t < 128 for t in toks)

    def test_n2_returns_two_candidates(self):
        engine = build_engine()
        engine.add_request(
            "r0", prompt_token_ids=[1, 2, 3, 4],
            sampling_params=SamplingParams(n=2, max_tokens=6, temperature=0.8),
        )
        outputs, _ = run_to_completion(engine)
        out = outputs["r0"]
        assert len(out.outputs) == 2
        for cand in out.outputs:
            assert len(cand["token_ids"]) == 6
            assert cand["finish_reason"] == "length"
        # fork/CoW pages all released
        assert engine.scheduler.block_manager.get_num_free_device_pages() == 64

    def test_n2_greedy_matches_single(self):
        """Greedy n=2: both candidates must equal the n=1 result (the fork
        shares prompt pages; divergence would mean CoW corrupted the KV)."""
        engine = build_engine()
        engine.add_request(
            "solo", prompt_token_ids=[7, 8, 9],
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
        )
        solo, _ = run_to_completion(engine)
        engine2 = build_engine()
        engine2.add_request(
            "dual", prompt_token_ids=[7, 8, 9],
            sampling_params=SamplingParams(n=2, max_tokens=6, temperature=0.0),
        )
        dual, _ = run_to_completion(engine2)
        assert len(dual["dual"].outputs) == 2
        for cand in dual["dual"].outputs:
            assert cand["token_ids"] == solo["solo"].outputs[0]["token_ids"]

    def test_best_of_exceeds_n(self):
        engine = build_engine()
        engine.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                n=2, best_of=4, max_tokens=5, temperature=0.8
            ),
        )
        outputs, _ = run_to_completion(engine)
        assert len(outputs["r0"].outputs) == 2
        assert engine.scheduler.block_manager.get_num_free_device_pages() == 64

    def test_pipeline_parallel_rejected(self):
        from qserve_tpu.config import ParallelConfig

        with pytest.raises(NotImplementedError):
            ParallelConfig(pipeline_parallel_size=2)

    def test_abort_releases_pages(self):
        engine = build_engine()
        engine.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_tokens=50, temperature=0.0),
        )
        engine.step()  # prefill
        assert engine.scheduler.block_manager.get_num_free_device_pages() < 64
        engine.abort_request("r0")
        assert not engine.has_unfinished_requests()
        assert engine.scheduler.block_manager.get_num_free_device_pages() == 64


class CharTokenizer:
    """One lowercase letter per token id — enough to drive detokenization."""

    eos_token_id = None
    all_special_ids = ()

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def encode(self, text):
        return [ord(c) - 97 for c in text]

    def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
        return [chr(97 + (i % 26)) for i in ids]

    def convert_tokens_to_string(self, tokens):
        return "".join(tokens)


class TestStopStrings:
    def _engine(self):
        engine = build_engine()
        engine.tokenizer = CharTokenizer()
        return engine

    def test_stop_string_trims_output(self):
        engine = self._engine()
        engine.add_request(
            "probe", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_tokens=10, temperature=0.0),
        )
        outputs, _ = run_to_completion(engine)
        full_text = outputs["probe"].outputs[0]["text"]
        assert len(full_text) == 10
        stop = full_text[3:5]  # stop at the 4th generated char

        engine2 = self._engine()
        engine2.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                max_tokens=10, temperature=0.0, stop=[stop]
            ),
        )
        outputs2, _ = run_to_completion(engine2)
        out = outputs2["r0"].outputs[0]
        assert out["finish_reason"] == "stop"
        assert out["text"] == full_text[: full_text.find(stop)]

    def test_stop_string_incremental_state(self):
        """The stop-string scan must be O(new tokens): the token-string
        buffer advances instead of re-decoding from scratch."""
        engine = self._engine()
        engine.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(
                max_tokens=8, temperature=0.0, stop=["zzzz"]  # never hits
            ),
        )
        outputs, _ = run_to_completion(engine)
        group, seq = engine._seq_index[0]
        assert seq.tokens is not None and len(seq.tokens) > 0
        assert seq.read_offset == len(seq.tokens)
        assert len(outputs["r0"].outputs[0]["text"]) == 8


class TestSlidingWindowEngine:
    def test_generate_past_window_with_cyclic_pages(self):
        """Mistral-style window: generation runs past the window, the page
        table reuses pages cyclically, and page accounting stays consistent
        (reference core/block_manager.py:192-225)."""
        from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
        from qserve_tpu.models import llama
        from qserve_tpu.worker.worker import Worker

        window = 2 * BS  # 2 pages
        args = llama.LlamaArgs(
            vocab_size=128, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
            sliding_window=window,
            quant=QuantSpec.from_precision("w4a8kv4"),
        )
        sc = SchedulerConfig(
            max_num_batched_tokens=256, max_num_seqs=4, max_model_len=8 * BS
        )
        cc = CacheConfig(
            block_size=BS, num_device_pages=16, quant=args.quant,
            sliding_window=window,
        )
        worker = Worker.create(args, cc, sc, seed=0)
        engine = LLMEngine(worker, sc, cc)
        n_gen = 5 * BS  # well past the 2-page window
        engine.add_request(
            "r0", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_tokens=n_gen, temperature=0.0),
        )
        outputs, _ = run_to_completion(engine, max_steps=n_gen + 10)
        toks = outputs["r0"].outputs[0]["token_ids"]
        assert len(toks) == n_gen
        # never more than window pages ever allocated for the request
        bm = engine.scheduler.block_manager
        assert bm.get_num_free_device_pages() == 16  # all freed at the end
        # window-limited allocation held throughout: with 16 pages total and
        # one sequence needing ceil((3 + n_gen)/BS) = 6 > 2 window pages,
        # completion itself proves cyclic reuse (6 distinct pages would also
        # fit, so additionally check the table maxed at window pages)

    def test_window_allocation_bounded(self):
        """Directly: append_slot past the window reuses pages cyclically."""
        from qserve_tpu.core.block_manager import BlockSpaceManager
        from qserve_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

        bm = BlockSpaceManager(block_size=4, num_device_pages=8,
                               sliding_window=8)  # 2 pages
        seq = Sequence(0, None, [1, 2, 3, 4], 4)
        group = SequenceGroup("r", [seq], SamplingParams())
        bm.allocate(group)
        seq.status = SequenceStatus.RUNNING
        distinct = set(bm.get_page_table(seq))
        for _ in range(20):
            seq.append_token_id(7)
            bm.append_slot(seq)
        table = bm.get_page_table(seq)
        assert len(set(table)) == 2  # only window pages distinct
        assert table[2] == table[0] and table[3] == table[1]
        bm.free(seq)
        assert bm.get_num_free_device_pages() == 8


class TestChunkedPrefill:
    def test_long_prompt_chunked_matches_unchunked(self):
        """A prompt longer than max_num_batched_tokens prefills in chunks;
        greedy continuation must be IDENTICAL to an engine with a big enough
        budget (the prefix-aware chunk attention must be exact)."""
        prompt = [(7 * i + 3) % 128 for i in range(150)]

        big = build_engine(pages=64, max_tokens=512, max_len=256)
        big.add_request(
            "r", prompt_token_ids=prompt,
            sampling_params=SamplingParams(max_tokens=8, temperature=0.0),
        )
        ref, _ = run_to_completion(big)

        small = build_engine(pages=64, max_tokens=64, max_len=256)
        small.add_request(
            "r", prompt_token_ids=prompt,
            sampling_params=SamplingParams(max_tokens=8, temperature=0.0),
        )
        got, steps = run_to_completion(small)
        assert got["r"].outputs[0]["token_ids"] == ref["r"].outputs[0]["token_ids"]
        assert small.scheduler.block_manager.get_num_free_device_pages() == 64

    def test_chunked_prompt_batches_with_short_ones(self):
        """Chunked steps run alone, but short prompts before/after still work."""
        engine = build_engine(pages=64, max_tokens=64, max_len=256)
        engine.add_request(
            "short1", prompt_token_ids=[1, 2, 3],
            sampling_params=SamplingParams(max_tokens=4, temperature=0.0),
        )
        engine.add_request(
            "long", prompt_token_ids=[(i * 5 + 1) % 128 for i in range(100)],
            sampling_params=SamplingParams(max_tokens=4, temperature=0.0),
        )
        engine.add_request(
            "short2", prompt_token_ids=[9, 8, 7],
            sampling_params=SamplingParams(max_tokens=4, temperature=0.0),
        )
        outputs, _ = run_to_completion(engine, max_steps=60)
        assert len(outputs) == 3
        for r in ("short1", "long", "short2"):
            assert len(outputs[r].outputs[0]["token_ids"]) == 4

    def test_decodes_ride_along_with_chunk_steps(self):
        """While a long prompt admits over multiple chunk steps, already-
        running sequences must keep generating EVERY step (fused chunk+
        decode batch — the reference stalls decodes for the whole prompt
        admission, ref scheduler.py:279-285)."""
        engine = build_engine(pages=64, max_tokens=64, max_len=256)
        engine.add_request(
            "run", prompt_token_ids=[3, 1, 4],
            sampling_params=SamplingParams(max_tokens=40, temperature=0.0,
                                           ignore_eos=True),
        )
        engine.step()  # prefill "run"; it decodes from here on
        (run_group, run_seq), = [engine._seq_index[s] for s in [0]]
        long_prompt = [(i * 5 + 1) % 128 for i in range(150)]  # 3 chunks @64
        engine.add_request(
            "long", prompt_token_ids=long_prompt,
            sampling_params=SamplingParams(max_tokens=4, temperature=0.0,
                                           ignore_eos=True),
        )
        chunk_steps = 0
        outputs = {}
        steps = 0
        while engine.has_unfinished_requests() and steps < 100:
            before = run_seq.get_output_len()
            done_before = run_seq.is_finished()
            for out in engine.step():
                if out.finished:
                    outputs[out.request_id] = out
            steps += 1
            if not done_before and "long" not in outputs and engine.scheduler.waiting:
                chunk_steps += 1
                # the running sequence generated a token during this
                # chunk step — no decode gap
                assert run_seq.get_output_len() == before + 1, (
                    f"decode stalled during chunk step {steps}"
                )
        assert chunk_steps >= 2, "admission did not span multiple chunk steps"
        assert len(outputs["run"].outputs[0]["token_ids"]) == 40
        assert len(outputs["long"].outputs[0]["token_ids"]) == 4
        assert engine.scheduler.block_manager.get_num_free_device_pages() == 64

    def test_chunked_with_decodes_greedy_parity(self):
        """Mixed chunk+decode steps must not perturb either stream: greedy
        outputs match a run where the long prompt is admitted unchunked
        after the short one finishes."""
        long_prompt = [(7 * i + 3) % 128 for i in range(150)]

        ref_eng = build_engine(pages=64, max_tokens=512, max_len=256)
        ref_eng.add_request(
            "s", prompt_token_ids=[9, 2, 6],
            sampling_params=SamplingParams(max_tokens=24, temperature=0.0,
                                           ignore_eos=True),
        )
        ref_s, _ = run_to_completion(ref_eng)
        ref_eng.add_request(
            "l", prompt_token_ids=long_prompt,
            sampling_params=SamplingParams(max_tokens=8, temperature=0.0,
                                           ignore_eos=True),
        )
        ref_l, _ = run_to_completion(ref_eng)

        eng = build_engine(pages=64, max_tokens=64, max_len=256)
        eng.add_request(
            "s", prompt_token_ids=[9, 2, 6],
            sampling_params=SamplingParams(max_tokens=24, temperature=0.0,
                                           ignore_eos=True),
        )
        eng.step()  # "s" starts decoding, then "l" chunks in alongside
        eng.add_request(
            "l", prompt_token_ids=long_prompt,
            sampling_params=SamplingParams(max_tokens=8, temperature=0.0,
                                           ignore_eos=True),
        )
        got, _ = run_to_completion(eng)
        assert got["s"].outputs[0]["token_ids"] == ref_s["s"].outputs[0]["token_ids"]
        assert got["l"].outputs[0]["token_ids"] == ref_l["l"].outputs[0]["token_ids"]

    def test_n2_greedy_chunked_prompt_matches_single(self):
        """n=2 on a prompt longer than the token budget: the final chunk's
        logits feed the extra candidates; both greedy candidates must match
        the n=1 chunked result."""
        prompt = [(11 * i + 2) % 128 for i in range(100)]
        solo = build_engine(pages=64, max_tokens=64, max_len=256)
        solo.add_request(
            "s", prompt_token_ids=prompt,
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
        )
        ref, _ = run_to_completion(solo)

        dual = build_engine(pages=64, max_tokens=64, max_len=256)
        dual.add_request(
            "d", prompt_token_ids=prompt,
            sampling_params=SamplingParams(n=2, max_tokens=6, temperature=0.0),
        )
        got, _ = run_to_completion(dual)
        assert len(got["d"].outputs) == 2
        for cand in got["d"].outputs:
            assert cand["token_ids"] == ref["s"].outputs[0]["token_ids"]
        assert dual.scheduler.block_manager.get_num_free_device_pages() == 64

    def test_prefix_compute_skip(self):
        """Second request sharing a computed prefix: identical output AND
        measurably fewer prompt tokens computed."""
        prefix = [(3 * i + 5) % 128 for i in range(64)]  # 4 pages of 16
        p1 = prefix + [1, 2, 3]
        p2 = prefix + [4, 5, 6]

        # kv8: the skip path attends the prefix from the (near-lossless)
        # quantized cache while the baseline attends it in-flight — under
        # kv4 the exact-token assertion is a coin flip on tie-breaks
        kv8 = dict(precision="w4a8kv8")

        # baseline: no prefix sharing
        base = build_engine(pages=64, max_tokens=256, max_len=256, **kv8)
        base.add_request(
            "b", prompt_token_ids=p2,
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
        )
        ref, _ = run_to_completion(base)

        eng = build_engine(pages=64, max_tokens=256, max_len=256, **kv8)
        eng.add_request(
            "r1", prompt_token_ids=p1,
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
            prefix_pos=64,
        )
        run_to_completion(eng)
        tokens_before = eng._num_prompt_tokens
        eng.add_request(
            "r2", prompt_token_ids=p2,
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0),
            prefix_pos=64,
        )
        outputs, _ = run_to_completion(eng)
        skipped_cost = eng._num_prompt_tokens - tokens_before
        assert outputs["r2"].outputs[0]["token_ids"] == ref["b"].outputs[0]["token_ids"]
        # only the 3-token suffix (bucketed span) was computed, not 67 tokens
        assert skipped_cost <= 16, skipped_cost
        # the prefix POOL retains its 4 shared pages (by design); everything
        # else is released
        assert eng.scheduler.block_manager.get_num_free_device_pages() == 60
