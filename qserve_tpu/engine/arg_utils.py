"""EngineArgs: the CLI flag surface -> config objects -> engine.

Reference counterpart: qserve/engine/arg_utils.py (flag names kept compatible
where they make sense on TPU; GPU-specific knobs become TPU equivalents).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

from qserve_tpu.config import (
    CacheConfig,
    IFBConfig,
    ModelConfig,
    ParallelConfig,
    ProfilingConfig,
    QuantSpec,
    SchedulerConfig,
)
from qserve_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclasses.dataclass
class EngineArgs:
    model: str = ""
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    trust_remote_code: bool = True
    seed: int = 0
    # quantization
    precision: str = "w4a8kv4"
    group_size: int = -1
    kv_zero_point: bool = True
    quant_lm_head: bool = False
    quant_path: Optional[str] = None
    # kv cache (256-token pages keep the Pallas decode-attention kernel on
    # its fast path — page_size % 128 == 0 — and amortize per-page costs;
    # the reference defaults to 64, arg_utils.py:215-221)
    block_size: int = 256
    num_device_pages: Optional[int] = None
    num_cpu_pages: int = 0
    gpu_memory_utilization: float = 0.5  # kept for CLI compat; HBM fraction
    # scheduler
    max_num_batched_tokens: int = 2048
    max_num_seqs: int = 64
    max_model_len: int = 2048
    # parallel
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    # engine
    ifb_mode: bool = True
    benchmarking: bool = False
    profiling_prompt_len: Optional[int] = None
    profiling_generation_len: Optional[int] = None
    random_weights: bool = False
    scan_layers: bool = True
    disable_log_stats: bool = True
    # VLM
    run_vlm: bool = False
    img_per_seq: int = 1
    omit_vision_tower: bool = False

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        g = parser.add_argument
        g("--model", type=str, required=True, help="local HF model dir")
        g("--tokenizer", type=str, default=None)
        g("--tokenizer-mode", type=str, default="auto", choices=["auto", "slow"])
        g("--trust-remote-code", action="store_true", default=True)
        g("--seed", type=int, default=0)
        g("--precision", type=str, default="w4a8kv4",
          help="w4a8kv4|w4a8kv8|w8a8kv4|w8a8kv8|w16a16kv4|w16a16kv8")
        g("--group-size", type=int, default=-1,
          help="-1 per-channel, or e.g. 128 for per-group W4")
        g("--no-kv-zero-point", dest="kv_zero_point", action="store_false")
        g("--quant-lm-head", action="store_true",
          help="serve lm_head W8 per-channel (beyond reference: halves the "
               "logits GEMM's weight stream; near-lossless)")
        g("--quant-path", type=str, default=None,
          help="packed QoQ checkpoint (from the checkpoint converter)")
        g("--block-size", type=int, default=256,
          help="KV page size in tokens (multiples of 128 use the Pallas "
               "decode kernel; the reference default was 64)")
        g("--num-device-pages", type=int, default=None,
          help="KV pages on device (auto-sized if omitted; "
              "NUM_GPU_PAGE_BLOCKS env honored for compat)")
        g("--num-cpu-pages", type=int, default=0, help="host swap pool pages")
        g("--gpu-memory-utilization", type=float, default=0.5,
          help="fraction of HBM for the KV cache when auto-sizing")
        g("--max-num-batched-tokens", type=int, default=2048)
        g("--max-num-seqs", type=int, default=64)
        g("--max-model-len", type=int, default=2048)
        g("--tensor-parallel-size", "-tp", type=int, default=1)
        g("--data-parallel-size", "-dp", type=int, default=1)
        g("--pipeline-parallel-size", "-pp", type=int, default=1)
        g("--no-ifb-mode", dest="ifb_mode", action="store_false")
        g("--benchmarking", action="store_true")
        g("--profiling-prompt-len", type=int, default=None)
        g("--profiling-generation-len", type=int, default=None)
        g("--random-weights", action="store_true",
          help="skip checkpoint loading (synthetic benchmarking)")
        g("--no-scan-layers", dest="scan_layers", action="store_false")
        g("--run-vlm", action="store_true",
          help="vision-language model (VILA/LLaVA): vision tower + projector")
        g("--img-per-seq", type=int, default=1,
          help="images per request in VLM benchmarks")
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in vars(args).items() if k in fields})

    # ------------------------------------------------------------------
    def quant_spec(self) -> QuantSpec:
        return QuantSpec.from_precision(
            self.precision, self.group_size, self.kv_zero_point,
            lm_head_bits=8 if self.quant_lm_head else 16,
        )

    def create_engine_configs(self):
        quant = self.quant_spec()
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer or self.model,
            tokenizer_mode=self.tokenizer_mode,
            trust_remote_code=self.trust_remote_code,
            seed=self.seed,
            max_model_len=self.max_model_len,
            quant_path=self.quant_path,
        )
        env_pages = os.environ.get("NUM_GPU_PAGE_BLOCKS")
        cache_config = CacheConfig(
            block_size=self.block_size,
            gpu_memory_utilization=self.gpu_memory_utilization,
            num_device_pages=(
                self.num_device_pages
                if self.num_device_pages is not None
                else (int(env_pages) if env_pages else None)
            ),
            num_cpu_pages=self.num_cpu_pages,
            quant=quant,
        )
        parallel_config = ParallelConfig(
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
            pipeline_parallel_size=self.pipeline_parallel_size,
        )
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=self.max_model_len,
        )
        ifb_config = IFBConfig(ifb_mode=self.ifb_mode)
        return model_config, cache_config, parallel_config, scheduler_config, ifb_config

    # ------------------------------------------------------------------
    def build_engine(self):
        """Construct the full engine (model load / random init included)."""
        import jax

        from qserve_tpu.engine.llm_engine import LLMEngine
        from qserve_tpu.models import llama as llama_mod
        from qserve_tpu.models import loader
        from qserve_tpu.worker.cache_engine import CacheEngine
        from qserve_tpu.worker.worker import Worker

        (model_config, cache_config, parallel_config, scheduler_config, ifb_config
         ) = self.create_engine_configs()
        quant = self.quant_spec()

        vlm_args = None
        vlm_params = None
        if self.run_vlm:
            if self.random_weights:
                vlm_args = self._random_vlm_args(quant)
            else:
                vlm_args, vlm_params = loader.load_vlm_model(
                    self.model, quant, self.scan_layers, self.quant_path
                )
            args = vlm_args.llm
            params = None
        elif self.random_weights:
            cfg = loader.load_hf_config_dict(self.model)
            args = loader.args_from_config_dict(cfg, quant, self.scan_layers)
            params = None
        else:
            args, params = loader.load_model(
                self.model, quant, self.scan_layers, self.quant_path
            )

        if self.run_vlm:
            # VLM prompts chunk through vlm_prefill_chunk (image embeds
            # spliced at global offsets), but the fused chunk+decode step
            # is dense/TP-only — VLM chunk steps run alone
            scheduler_config.mixed_chunk_decode = False

        if args.sliding_window is not None:
            # plumb the model's window into the allocator (cyclic page reuse)
            # and (via LlamaArgs) the attention kernels' masks
            cache_config.sliding_window = args.sliding_window

        if cache_config.num_device_pages is None:
            cache_config.num_device_pages = auto_num_pages(
                args, cache_config, self.gpu_memory_utilization
            )
            logger.info("Auto-sized KV cache: %d pages", cache_config.num_device_pages)

        tokenizer = None
        try:
            from qserve_tpu.utils.tokenizer import get_tokenizer

            tok_path = self.tokenizer or self.model
            if self.run_vlm and os.path.isdir(os.path.join(tok_path, "llm")):
                # VILA keeps the tokenizer under llm/ (reference
                # llm_engine.py:223-239)
                tok_path = os.path.join(tok_path, "llm")
            tokenizer = get_tokenizer(
                tok_path, self.tokenizer_mode, self.trust_remote_code,
            )
        except Exception as e:
            logger.warning("Tokenizer unavailable (%s); token-id-only mode", e)

        if self.run_vlm:
            worker = Worker.create_vlm(
                vlm_args, cache_config, scheduler_config, params=vlm_params,
                seed=self.seed,
            )
        elif self.tensor_parallel_size > 1 or self.data_parallel_size > 1:
            # real TP/DP over a jax mesh (the reference's TP is vestigial —
            # models hardcode tp_size=1, worker.py:100-103)
            from qserve_tpu.models import mixtral as mixtral_mod

            if self.random_weights:
                import jax as _jax

                rand_fp = (
                    mixtral_mod.random_float_params
                    if args.num_experts
                    else llama_mod.random_float_params
                )
                fp = rand_fp(_jax.random.PRNGKey(self.seed), args)
            elif args.num_experts:
                fp = mixtral_mod.load_float_params_from_hf(self.model, args)
            else:
                fp = loader.load_float_params_from_hf(self.model, args)
            worker = Worker.create_tp(
                fp, args, cache_config, scheduler_config,
                tp_size=self.tensor_parallel_size,
                dp_size=self.data_parallel_size,
                seed=self.seed,
            )
        else:
            worker = Worker.create(
                args, cache_config, scheduler_config, params=params,
                seed=self.seed, benchmarking=self.benchmarking,
            )
        return LLMEngine(
            worker, scheduler_config, cache_config, tokenizer=tokenizer,
            log_stats=not self.disable_log_stats,
        )

    def _random_vlm_args(self, quant: QuantSpec):
        """Random-weight VLM geometry: CLIP-L/14-336-class tower (as the
        reference's LLaVA models use) + mlp2x_gelu projector over the LLM
        from --model's config.json."""
        from qserve_tpu.models import clip, loader, mm_projector, vila

        cfg = loader.load_hf_config_dict(self.model)
        largs = loader.args_from_config_dict(cfg, quant, self.scan_layers)
        if os.environ.get("QSERVE_TPU_VISION_PRESET") == "tiny":  # CPU smoke
            vargs = clip.VisionArgs(
                hidden_size=64, intermediate_size=128, num_layers=2,
                num_heads=4, image_size=32, patch_size=8,
            )
        else:
            vargs = clip.VisionArgs(
                hidden_size=1024, intermediate_size=4096, num_layers=24,
                num_heads=16, image_size=336, patch_size=14,
            )
        pargs = mm_projector.ProjectorArgs(
            kind="mlp_downsample",  # 24x24 grid -> 144 tokens/image
            vision_hidden=vargs.hidden_size,
            llm_hidden=largs.hidden_size,
            grid=vargs.grid,
        )
        return vila.VilaArgs(llm=largs, vision=vargs, projector=pargs)


def auto_num_pages(model_args, cache_config: CacheConfig, hbm_fraction: float) -> int:
    """Size the page pool from free device memory (reference model_runner.py:291-315)."""
    import jax

    from qserve_tpu.worker.cache_engine import CacheEngine

    page_bytes = CacheEngine.page_bytes(
        model_args.num_layers, model_args.num_kv_heads, model_args.head_dim,
        cache_config,
    )
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        free = stats["bytes_limit"] - stats["bytes_in_use"]
    except Exception:
        free = 8 << 30  # assume 8GB free if the backend lacks memory stats
    return max(16, int(free * hbm_fraction) // page_bytes)


@dataclasses.dataclass
class AsyncEngineArgs(EngineArgs):
    """Async-serving argument surface (reference: arg_utils.py:504-527 — kept
    for API parity; the reference's async path is likewise vestigial).

    engine_use_ray / worker_use_ray have no TPU meaning (no per-GPU worker
    processes: one SPMD program spans the mesh); they are accepted and
    ignored so vLLM-style launchers keep working.
    """

    engine_use_ray: bool = False
    worker_use_ray: bool = False
    max_log_len: int = 0

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser = EngineArgs.add_cli_args(parser)
        parser.add_argument("--engine-use-ray", action="store_true")
        parser.add_argument("--worker-use-ray", action="store_true")
        parser.add_argument("--max-log-len", type=int, default=0)
        return parser
