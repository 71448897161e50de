"""Multi-host serving dryrun (CPU emulation).

Spawns 2 "hosts" (processes), each with N/2 virtual CPU devices, connected
through the jax distributed runtime (gloo collectives). Each host runs an
IDENTICAL LLMEngine instance — the replicated deterministic scheduler design
(parallel/distributed.py) — over a tensor-parallel mesh that SPANS both
hosts, serves the same requests, and prints its sampled token streams. The
parent asserts both hosts produced byte-identical streams, which is the
correctness condition for replicated multi-host serving (every host must
make the same scheduling + sampling decisions or the SPMD step diverges).

Geometries:
  toy      — 2 layers / hidden 256 / W4A8: fast; wired into
             __graft_entry__.dryrun_multichip (driver budget).
  flagship — TinyLlama-1.1B (22 layers / hidden 2048 / 32 heads), W16A16KV8
             so the 1-core CPU host runs real bf16 matmuls instead of
             per-step W4 dequant fallbacks; exercises the same shard_map
             step fns, cache sharding, and gloo collectives at real size.

--measure additionally times decode steps and runs a 1-process control on
the same total device count, reporting the multi-process per-step overhead.

Usage:
  python scripts/dryrun_multihost.py [n_devices_total] [--geometry flagship]
      [--measure]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GEOMETRIES = ("toy", "flagship")


def _build_engine(tp: int, geometry: str):
    import jax

    from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
    from qserve_tpu.engine.llm_engine import LLMEngine
    from qserve_tpu.models import llama
    from qserve_tpu.worker.worker import Worker

    if geometry == "flagship":
        args = llama.LlamaArgs(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_layers=22, num_heads=32, num_kv_heads=4, head_dim=64,
            quant=QuantSpec.from_precision("w16a16kv8"), tp_size=tp,
        )
        pages = 48
    else:
        args = llama.LlamaArgs(
            vocab_size=512, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=8, num_kv_heads=8, head_dim=32,
            quant=QuantSpec.from_precision("w4a8kv4", -1), tp_size=tp,
        )
        pages = 24
    fp = llama.random_float_params(jax.random.PRNGKey(0), args, scale=0.05)
    sc = SchedulerConfig(
        max_num_batched_tokens=128, max_num_seqs=4, max_model_len=128
    )
    cc = CacheConfig(block_size=16, num_device_pages=pages, quant=args.quant)
    worker = Worker.create_tp(fp, args, cc, sc, tp_size=tp)
    return LLMEngine(worker, sc, cc)


def _serve_and_time(engine, measure: bool):
    from qserve_tpu.sampling_params import SamplingParams

    for i in range(3):
        engine.add_request(
            f"r{i}", prompt_token_ids=[3 + i, 5 + i, 7 + i, 11 + i],
            sampling_params=SamplingParams(
                max_tokens=24 if measure else 6, temperature=0.7, top_p=0.9
            ),
        )
    results = {}
    step_ms = []
    first = True
    while engine.has_unfinished_requests():
        t0 = time.perf_counter()
        outs = engine.step()
        if not first:  # decode steps only (prefill compiles + runs once)
            step_ms.append((time.perf_counter() - t0) * 1e3)
        first = False
        for out in outs:
            if out.finished:
                results[out.request_id] = out.outputs[0]["token_ids"]
    return results, step_ms


def _median_steady(step_ms):
    # drop the first few (compile/cache warm) steps, take the median
    xs = sorted(step_ms[3:]) if len(step_ms) > 6 else sorted(step_ms)
    return xs[len(xs) // 2] if xs else float("nan")


def child(port: int, pid: int, n_local: int, geometry: str,
          measure: bool) -> None:
    from qserve_tpu.parallel.distributed import init_distributed

    init_distributed(
        f"127.0.0.1:{port}", num_processes=2, process_id=pid,
        cpu_devices_per_process=n_local,
    )
    import jax

    engine = _build_engine(jax.device_count(), geometry)
    results, step_ms = _serve_and_time(engine, measure)
    print("TOKENS " + json.dumps(results, sort_keys=True), flush=True)
    if measure:
        print(f"STEP_MS {_median_steady(step_ms):.1f}", flush=True)


def control(n_devices: int, geometry: str) -> None:
    """1-process control: same device count, no distributed runtime."""
    engine = _build_engine(n_devices, geometry)
    results, step_ms = _serve_and_time(engine, measure=True)
    print("TOKENS " + json.dumps(results, sort_keys=True), flush=True)
    print(f"STEP_MS {_median_steady(step_ms):.1f}", flush=True)


def _grep(out: str, tag: str) -> str:
    lines = [l for l in out.splitlines() if l.startswith(tag + " ")]
    assert lines, f"child produced no {tag}:\n{out}"
    return lines[-1][len(tag) + 1:]


def main(n_devices: int = 8, geometry: str = "toy",
         measure: bool = False) -> None:
    from qserve_tpu.parallel.distributed import find_free_port

    port = find_free_port()
    n_local = max(n_devices // 2, 1)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # children pin their own device counts
    env["QSERVE_TPU_INTERPRET"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(port), str(pid), str(n_local), geometry, str(int(measure))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        outs.append(out)
        if p.returncode != 0:
            sys.stderr.write(out)
            raise RuntimeError(f"multihost child failed (rc={p.returncode})")
    streams = [_grep(out, "TOKENS") for out in outs]
    assert streams[0] == streams[1], (
        f"hosts diverged!\nhost0: {streams[0]}\nhost1: {streams[1]}"
    )
    print(
        f"dryrun_multihost OK: 2 hosts x {n_local} devices, tp={n_devices} "
        f"spanning hosts, geometry={geometry}, identical token streams: "
        f"{streams[0]}"
    )
    if measure:
        mh_ms = float(_grep(outs[0], "STEP_MS"))
        cenv = dict(env)
        cenv["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
        cp = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--control",
             str(n_devices), geometry],
            env=cenv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, timeout=3600,
        )
        if cp.returncode != 0:
            sys.stderr.write(cp.stdout)
            raise RuntimeError("control run failed")
        sp_ms = float(_grep(cp.stdout, "STEP_MS"))
        print(
            f"per-step decode: {mh_ms:.1f} ms (2-process gloo) vs "
            f"{sp_ms:.1f} ms (1-process, same {n_devices} devices) -> "
            f"overhead {mh_ms - sp_ms:+.1f} ms ({mh_ms / sp_ms:.2f}x)"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
              sys.argv[5], bool(int(sys.argv[6])))
    elif len(sys.argv) > 1 and sys.argv[1] == "--control":
        control(int(sys.argv[2]), sys.argv[3])
    else:
        argv = sys.argv[1:]
        measure = "--measure" in argv
        geometry = "toy"
        if "--geometry" in argv:
            geometry = argv[argv.index("--geometry") + 1]
            assert geometry in GEOMETRIES, geometry
        rest = [a for a in argv if a not in ("--measure", "--geometry",
                                             *GEOMETRIES)]
        main(int(rest[0]) if rest else 8, geometry, measure)
