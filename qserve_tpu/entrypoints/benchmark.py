"""Offline throughput benchmark (reference: qserve_benchmark.py).

Synthetic workload: GLOBAL_BATCH_SIZE requests of fixed prompt/generation
lengths with random token ids, run for N rounds; appends tokens/s to a
results CSV. TRT-LLM-aligned default: 1024 in / 512 out.

  python -m qserve_tpu.entrypoints.benchmark --model <dir> --random-weights \
      --precision w4a8kv4 --benchmarking
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import numpy as np


def add_args(parser):
    from qserve_tpu.engine.arg_utils import EngineArgs

    EngineArgs.add_cli_args(parser)
    parser.add_argument("--prompt-len", type=int,
                        default=int(os.environ.get("PROMPT_LEN", "1024")))
    parser.add_argument("--generation-len", type=int,
                        default=int(os.environ.get("GENERATION_LEN", "512")))
    parser.add_argument("--global-batch-size", type=int,
                        default=int(os.environ.get("GLOBAL_BATCH_SIZE", "32")))
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--results-csv", type=str, default="results.csv")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace of round 0 here "
                             "(TPU equivalent of the reference's cuda-sync "
                             "timing bracket, SURVEY.md §5)")
    return parser


def run(engine, vocab_size, batch, prompt_len, gen_len, rounds, csv_path,
        profile_dir=None):
    import contextlib

    from qserve_tpu.sampling_params import SamplingParams

    rng = np.random.default_rng(0)
    rows = []
    for rnd in range(rounds):
        profiling = profile_dir is not None and rnd == min(1, rounds - 1)
        if profiling:
            import jax

            prof_cm = jax.profiler.trace(profile_dir)
        else:
            prof_cm = contextlib.nullcontext()
        for i in range(batch):
            toks = rng.integers(4, vocab_size - 1, prompt_len).tolist()
            engine.add_request(
                f"r{rnd}-{i}",
                prompt_token_ids=toks,
                sampling_params=SamplingParams(
                    max_tokens=gen_len, temperature=0.0, ignore_eos=True
                ),
            )
        t0 = time.time()
        finished = 0
        gen_tokens = 0
        with prof_cm:
            while engine.has_unfinished_requests():
                for out in engine.step():
                    if out.finished:
                        finished += 1
                        gen_tokens += sum(
                            len(o["token_ids"]) for o in out.outputs
                        )
        dt = time.time() - t0
        tput = gen_tokens / dt
        print(f"round {rnd}: {finished} seqs, {gen_tokens} tokens, "
              f"{dt:.2f}s, {tput:.1f} tok/s")
        rows.append(dict(round=rnd, batch=batch, prompt_len=prompt_len,
                         generation_len=gen_len, seconds=round(dt, 3),
                         tokens_per_s=round(tput, 1)))
    if csv_path:
        exists = os.path.exists(csv_path)
        with open(csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            if not exists:
                w.writeheader()
            w.writerows(rows)
    return rows


def main():
    parser = add_args(argparse.ArgumentParser())
    args = parser.parse_args()
    from qserve_tpu.engine.arg_utils import EngineArgs

    engine_args = EngineArgs.from_cli_args(args)
    engine = engine_args.build_engine()
    vocab = engine.worker.model_runner.model_args.vocab_size
    run(engine, vocab, args.global_batch_size, args.prompt_len,
        args.generation_len, args.rounds, args.results_csv,
        profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
