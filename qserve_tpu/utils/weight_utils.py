"""Checkpoint weight iteration (reference: qserve/utils/weight_utils.py).

Iterates (name, np.ndarray) pairs from a local HF-format directory:
safetensors shards preferred, torch .bin fallback. No hub downloads — models
are expected on local disk (zero-egress serving environments).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator, Tuple

import numpy as np

from qserve_tpu.logger import init_logger

logger = init_logger(__name__)


def hf_weight_files(model_dir: str) -> Tuple[list, str]:
    st = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st:
        return st, "safetensors"
    bins = sorted(glob.glob(os.path.join(model_dir, "*.bin")))
    if bins:
        return bins, "pt"
    pts = sorted(glob.glob(os.path.join(model_dir, "*.pt")))
    if pts:
        return pts, "pt"
    raise FileNotFoundError(f"no weight files (*.safetensors|*.bin|*.pt) in {model_dir}")


def hf_model_weights_iterator(model_dir: str) -> Iterator[Tuple[str, np.ndarray]]:
    files, fmt = hf_weight_files(model_dir)
    if fmt == "safetensors":
        from safetensors import safe_open

        for f in files:
            with safe_open(f, framework="np") as reader:
                for name in reader.keys():
                    yield name, reader.get_tensor(name)
    else:
        import torch

        for f in files:
            state = torch.load(f, map_location="cpu", weights_only=True)
            for name, t in state.items():
                yield name, t.float().numpy()
