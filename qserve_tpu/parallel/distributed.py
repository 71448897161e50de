"""Multi-host (multi-process) serving support.

The reference has no working distributed backend (torch.distributed init is
commented out, worker.py:100-103; NCCL only in env hygiene). Here multi-host
is first-class and TPU-native:

  * `init_distributed` brings up the jax distributed runtime (coordinator +
    process grid). On TPU pods this is `jax.distributed.initialize()` with
    automatic cluster detection; for CPU emulation (tests, this image) it
    pins N virtual devices per process and uses gloo cross-process
    collectives.
  * the serving mesh is built over the GLOBAL device list; with
    `tp <= local_device_count` the TP axis stays inside each host (ICI) and
    the DP axis spans hosts (DCN) — the sharding layout puts the per-token
    all-reduces on ICI and only request-level traffic on DCN. `tp >
    local_device_count` (e.g. a 72B model across 2 hosts) is also valid:
    the row-parallel psums then ride DCN.
  * the engine runs REPLICATED: every host executes the same scheduler on
    the same request stream (deterministic: FCFS + dict-ordered metadata +
    counter-derived RNG keys), so every host marshals identical step inputs
    and no scheduler coordination traffic is needed at all. Each host feeds
    its addressable shards (multihost_utils.host_local_array_to_global_array)
    and reads back replicated sampled tokens. Determinism is tested in
    tests/test_scheduler.py::TestSchedulerDeterminism and end-to-end by the
    two-process dryrun (scripts/dryrun_multihost.py) asserting identical
    token streams on both hosts.
"""

from __future__ import annotations

import os
import socket
from typing import Optional

from qserve_tpu.logger import init_logger

logger = init_logger(__name__)


def find_free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_devices_per_process: Optional[int] = None,
) -> None:
    """Initialize the jax distributed runtime for multi-host serving.

    On a TPU pod slice, call with no arguments (cluster auto-detection).
    For CPU emulation pass all of coordinator/num_processes/process_id and
    cpu_devices_per_process (virtual devices per process, gloo collectives).
    """
    import jax

    if cpu_devices_per_process:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator_address is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    logger.info(
        "distributed init: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1
