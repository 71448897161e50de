"""End-to-end engine test with real tensor parallelism on the virtual mesh."""

import jax
import numpy as np
import pytest

from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
from qserve_tpu.engine.llm_engine import LLMEngine
from qserve_tpu.models import llama
from qserve_tpu.sampling_params import SamplingParams
from qserve_tpu.worker.worker import Worker


@pytest.mark.parametrize("precision", ["w4a8kv4", "w8a8kv8"])
def test_tp2_generation_matches_tp1(precision):
    quant = QuantSpec.from_precision(precision)
    args = llama.LlamaArgs(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32, quant=quant,
    )
    fp = llama.random_float_params(jax.random.PRNGKey(0), args, scale=0.05)
    cache = CacheConfig(block_size=16, num_device_pages=64, quant=quant)
    sched = SchedulerConfig(max_num_batched_tokens=256, max_num_seqs=4,
                            max_model_len=64)

    def gen(worker):
        engine = LLMEngine(worker, sched, cache, tokenizer=None)
        engine.add_request(
            "r", prompt_token_ids=[5, 6, 7, 8],
            sampling_params=SamplingParams(max_tokens=6, temperature=0.0,
                                           ignore_eos=True),
        )
        outs = []
        steps = 0
        while engine.has_unfinished_requests() and steps < 20:
            outs.extend(engine.step())
            steps += 1
        return [o for o in outs if o.finished][0].outputs[0]["token_ids"]

    toks_tp = gen(Worker.create_tp(fp, args, cache, sched, tp_size=2))
    params1 = llama.quantize_params(fp, args)
    toks_1 = gen(Worker.create(args, cache, sched, params=params1))
    assert len(toks_tp) == len(toks_1) == 6
    # per-shard quantization differs slightly from whole-matrix quantization
    # (row-parallel scales are finer) so exact token match isn't guaranteed,
    # but greedy decode from the same weights should rarely diverge on a
    # tiny model; require the first tokens to agree
    assert toks_tp[0] == toks_1[0]
    assert all(0 <= t < 256 for t in toks_tp)
