"""Two-process multi-host serving dryrun (CPU emulation).

Spawns 2 "hosts" (processes), each with N/2 virtual CPU devices, connected
through the jax distributed runtime (gloo collectives). Each host runs an
IDENTICAL LLMEngine instance — the replicated deterministic scheduler design
(parallel/distributed.py) — over a tensor-parallel mesh that SPANS both
hosts, serves the same requests, and prints its sampled token streams. The
parent asserts both hosts produced byte-identical streams, which is the
correctness condition for replicated multi-host serving (every host must
make the same scheduling + sampling decisions or the SPMD step diverges).

Usage: python scripts/dryrun_multihost.py [n_devices_total]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def child(port: int, pid: int, n_local: int) -> None:
    from qserve_tpu.parallel.distributed import init_distributed

    init_distributed(
        f"127.0.0.1:{port}", num_processes=2, process_id=pid,
        cpu_devices_per_process=n_local,
    )
    import jax

    from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
    from qserve_tpu.engine.llm_engine import LLMEngine
    from qserve_tpu.models import llama
    from qserve_tpu.sampling_params import SamplingParams
    from qserve_tpu.worker.worker import Worker

    tp = jax.device_count()  # TP spans both hosts (the hard case)
    args = llama.LlamaArgs(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=32,
        quant=QuantSpec.from_precision("w4a8kv4", -1), tp_size=tp,
    )
    fp = llama.random_float_params(jax.random.PRNGKey(0), args, scale=0.05)
    sc = SchedulerConfig(
        max_num_batched_tokens=128, max_num_seqs=4, max_model_len=128
    )
    cc = CacheConfig(block_size=16, num_device_pages=24, quant=args.quant)
    worker = Worker.create_tp(fp, args, cc, sc, tp_size=tp)
    engine = LLMEngine(worker, sc, cc)

    for i in range(3):
        engine.add_request(
            f"r{i}", prompt_token_ids=[3 + i, 5 + i, 7 + i, 11 + i],
            sampling_params=SamplingParams(
                max_tokens=6, temperature=0.7, top_p=0.9
            ),
        )
    results = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0]["token_ids"]
    print("TOKENS " + json.dumps(results, sort_keys=True), flush=True)


def main(n_devices: int = 8) -> None:
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
             str(port), str(pid), str(n_local)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        if p.returncode != 0:
            sys.stderr.write(out)
            raise RuntimeError(f"multihost child failed (rc={p.returncode})")
    streams = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("TOKENS ")]
        assert lines, f"child produced no token stream:\n{out}"
        streams.append(lines[-1])
    assert streams[0] == streams[1], (
        f"hosts diverged!\nhost0: {streams[0]}\nhost1: {streams[1]}"
    )
    print(
        f"dryrun_multihost OK: 2 hosts x {n_local} devices, tp={n_devices} "
        f"spanning hosts, identical token streams: {streams[0][7:]}"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
