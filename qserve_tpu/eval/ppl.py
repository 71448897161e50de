"""WikiText-2-style perplexity evaluation.

The reference delegates accuracy evaluation to the external DeepCompressor
repo (README.md:371-389: WikiText-2 PPL, eval seqlen 2048, non-overlapping
windows over the concatenated corpus). This module brings the protocol
in-framework so QoQ accuracy (ΔPPL vs FP16) is checkable end-to-end on any
checkpoint: the model forward runs the exact serving kernels (quantized GEMMs,
int8 activation handoffs), only the KV cache is bypassed.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.logger import init_logger
from qserve_tpu.models import llama

logger = init_logger(__name__)


def tokenize_text(tokenizer, text: str) -> np.ndarray:
    """Concatenated corpus -> int32 token ids (BOS prepended once)."""
    ids = tokenizer.encode(text)
    return np.asarray(ids, dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("args", "row_chunk"))
def _window_nll(params, tokens, length, *, args, row_chunk):
    return llama.teacher_forced_nll(params, tokens, length, args, row_chunk)


def evaluate_ppl(
    params: llama.LlamaParams,
    args: llama.LlamaArgs,
    token_ids: np.ndarray,
    seqlen: int = 2048,
    max_windows: Optional[int] = None,
    row_chunk: int = 256,
    progress: bool = False,
) -> float:
    """PPL over non-overlapping `seqlen` windows of the concatenated corpus.

    Each window predicts tokens 1..len-1 given the window prefix (the first
    token of each window is never scored), matching the DeepCompressor
    protocol the reference's published numbers use.
    """
    n = len(token_ids)
    num_windows = n // seqlen if n >= seqlen else 1
    if max_windows is not None:
        num_windows = min(num_windows, max_windows)
    if num_windows == 0:
        raise ValueError(f"corpus of {n} tokens shorter than one window")

    # pad T to a row_chunk multiple once; same compiled fn for every window
    T = max(seqlen, row_chunk)
    T = -(-T // row_chunk) * row_chunk

    total_nll = 0.0
    total_cnt = 0
    for wi in range(num_windows):
        chunk = token_ids[wi * seqlen : (wi + 1) * seqlen]
        buf = np.zeros(T, np.int32)
        buf[: len(chunk)] = chunk
        nll, cnt = _window_nll(
            params,
            jnp.asarray(buf),
            jnp.int32(len(chunk)),
            args=args,
            row_chunk=row_chunk,
        )
        total_nll += float(nll)
        total_cnt += int(cnt)
        if progress:
            logger.info(
                "window %d/%d: running ppl %.4f",
                wi + 1, num_windows, math.exp(total_nll / max(total_cnt, 1)),
            )
    return math.exp(total_nll / max(total_cnt, 1))
