"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.

Set QSERVE_TPU_RUN_TPU_TESTS=1 to keep the attached TPU instead (enables
tests/test_on_tpu.py; most other tests compile remotely and are SLOW there —
select test files explicitly).
"""

import os

_USE_TPU = os.environ.get("QSERVE_TPU_RUN_TPU_TESTS", "0") == "1"

if not _USE_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ.setdefault("QSERVE_TPU_INTERPRET", "1")  # Pallas interpreter

import jax  # noqa: E402

if not _USE_TPU:
    # The axon sitecustomize registers the tunneled TPU backend in every
    # process and force-selects it via jax.config. Tests run on a virtual
    # 8-device CPU mesh, so override it back.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    letting them accumulate has produced a deterministic segfault inside
    backend_compile_and_load near the end of the run (test_tp_engine), while
    every module passes in isolation. Per-module cache clearing keeps the
    live-executable population bounded; modules don't share jitted functions,
    so the only cost is re-tracing a handful of library-level lru caches."""
    yield
    jax.clear_caches()
