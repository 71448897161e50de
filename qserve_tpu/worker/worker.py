"""Worker: owns ModelRunner + CacheEngine for one SPMD program.

Reference counterpart: qserve/worker/worker.py. The reference precomputes
per-layer raw KV pointer tables (:137-221); here page tables are plain index
arrays built per step by the runner, so there is nothing to precompute.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from qserve_tpu.config import CacheConfig, ModelConfig, ParallelConfig, SchedulerConfig
from qserve_tpu.core.scheduler import SchedulerOutputs
from qserve_tpu.logger import init_logger
from qserve_tpu.models import llama
from qserve_tpu.sequence import SequenceGroupMetadata
from qserve_tpu.worker.cache_engine import CacheEngine
from qserve_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)


class Worker:
    def __init__(
        self,
        model_runner: ModelRunner,
        cache_engine: CacheEngine,
    ) -> None:
        self.model_runner = model_runner
        self.cache_engine = cache_engine

    @classmethod
    def create(
        cls,
        model_args: llama.LlamaArgs,
        cache_config: CacheConfig,
        scheduler_config: SchedulerConfig,
        params=None,
        seed: int = 0,
        benchmarking: bool = False,
    ) -> "Worker":
        if params is None:
            runner = ModelRunner.from_random(
                model_args,
                max_model_len=scheduler_config.max_model_len,
                block_size=cache_config.block_size,
                max_num_batched_tokens=scheduler_config.max_num_batched_tokens,
                max_num_seqs=scheduler_config.max_num_seqs,
                seed=seed,
                benchmarking=benchmarking,
            )
        else:
            runner = ModelRunner(
                params,
                model_args,
                max_model_len=scheduler_config.max_model_len,
                block_size=cache_config.block_size,
                max_num_batched_tokens=scheduler_config.max_num_batched_tokens,
                max_num_seqs=scheduler_config.max_num_seqs,
                benchmarking=benchmarking,
            )
        cache_engine = CacheEngine(
            num_layers=model_args.num_layers,
            num_kv_heads=model_args.num_kv_heads,
            head_dim=model_args.head_dim,
            cache_config=cache_config,
        )
        return cls(runner, cache_engine)

    @classmethod
    def create_tp(
        cls,
        float_params: dict,
        model_args,
        cache_config: CacheConfig,
        scheduler_config: SchedulerConfig,
        tp_size: int,
        dp_size: int = 1,
        seed: int = 0,
    ) -> "Worker":
        """Tensor-parallel worker: shard_map step functions over a mesh."""
        from qserve_tpu.worker.tp_runner import TPModelRunner

        runner = TPModelRunner(
            float_params, model_args,
            max_model_len=scheduler_config.max_model_len,
            block_size=cache_config.block_size,
            tp_size=tp_size, dp_size=dp_size,
            max_num_batched_tokens=scheduler_config.max_num_batched_tokens,
            max_num_seqs=scheduler_config.max_num_seqs,
            rng_seed=seed,
        )
        cache_engine = CacheEngine(
            num_layers=model_args.num_layers,
            num_kv_heads=model_args.num_kv_heads,
            head_dim=model_args.head_dim,
            cache_config=cache_config,
        )
        cache_engine.cache = runner.shard_cache(cache_engine.cache)
        return cls(runner, cache_engine)

    @classmethod
    def create_vlm(
        cls,
        vila_args,
        cache_config: CacheConfig,
        scheduler_config: SchedulerConfig,
        params=None,
        seed: int = 0,
    ) -> "Worker":
        """VLM worker: VLMModelRunner over the same cache machinery."""
        from qserve_tpu.worker.vlm_runner import VLMModelRunner

        kw = dict(
            max_model_len=scheduler_config.max_model_len,
            block_size=cache_config.block_size,
            max_num_batched_tokens=scheduler_config.max_num_batched_tokens,
            max_num_seqs=scheduler_config.max_num_seqs,
        )
        if params is None:
            runner = VLMModelRunner.from_random_vlm(
                vila_args, seed=seed, **kw
            )
        else:
            runner = VLMModelRunner(params, vila_args, **kw)
        largs = vila_args.llm
        cache_engine = CacheEngine(
            num_layers=largs.num_layers,
            num_kv_heads=largs.num_kv_heads,
            head_dim=largs.head_dim,
            cache_config=cache_config,
        )
        return cls(runner, cache_engine)

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        scheduler_outputs: SchedulerOutputs,
    ) -> List[Tuple[int, int]]:
        # cache maintenance first (CoW copies, swaps), then the model step
        self.cache_engine.swap_out(scheduler_outputs.blocks_to_swap_out)
        self.cache_engine.swap_in(scheduler_outputs.blocks_to_swap_in)
        self.cache_engine.copy(scheduler_outputs.blocks_to_copy)
        if not seq_group_metadata_list:
            return []
        if scheduler_outputs.prompt_run:
            prompt_mds = [md for md in seq_group_metadata_list if md.is_prompt]
            decode_mds = [
                md for md in seq_group_metadata_list if not md.is_prompt
            ]
            if decode_mds:
                # mixed step: one prefill chunk + the running decode batch
                assert len(prompt_mds) == 1
                return self.model_runner.execute_chunk_with_decode(
                    prompt_mds[0], decode_mds, self.cache_engine
                )
            return self.model_runner.execute_prefill(
                prompt_mds, self.cache_engine
            )
        return self.model_runner.execute_decode(
            seq_group_metadata_list, self.cache_engine
        )
