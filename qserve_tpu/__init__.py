"""qserve_tpu: a TPU-native quantized LLM serving engine (QoQ W4A8KV4).

Public API mirrors the reference package (qserve/__init__.py):
EngineArgs, LLMEngine, SamplingParams.
"""

from qserve_tpu.engine.arg_utils import EngineArgs
from qserve_tpu.engine.llm_engine import LLMEngine
from qserve_tpu.sampling_params import SamplingParams

__version__ = "0.1.0"

__all__ = ["EngineArgs", "LLMEngine", "SamplingParams", "__version__"]
