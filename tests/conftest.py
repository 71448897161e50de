"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("QSERVE_TPU_INTERPRET", "1")  # Pallas interpreter mode

import jax  # noqa: E402

# The axon sitecustomize registers the tunneled TPU backend in every process
# and force-selects it via jax.config. Tests run on a virtual 8-device CPU
# mesh, so override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
