"""Compute kernels: public op API (ops.py) + Pallas TPU implementations.

Importing this package registers the Pallas kernels into the ops registry;
ops dispatch falls back to pure-XLA implementations when Pallas is disabled
or unavailable (see ops.use_pallas).
"""

from qserve_tpu.kernels import ops  # noqa: F401

try:  # Pallas kernels register themselves on import
    from qserve_tpu.kernels import pallas_elementwise  # noqa: F401
    from qserve_tpu.kernels import pallas_flash_attention  # noqa: F401
    from qserve_tpu.kernels import pallas_gemm  # noqa: F401
    from qserve_tpu.kernels import pallas_paged_attention  # noqa: F401
    from qserve_tpu.kernels import pallas_prefix_attention  # noqa: F401
    from qserve_tpu.kernels import pallas_sampler  # noqa: F401
except Exception as _e:  # pragma: no cover
    import warnings

    warnings.warn(f"Pallas kernels unavailable: {_e}")
