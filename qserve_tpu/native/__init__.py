"""Native (C++) host runtime: per-step batch marshalling via ctypes.

Compiled lazily with g++ on first use (cached as marshal.so next to the
source); every entry point has a pure-numpy fallback so the framework works
without a toolchain. See marshal.cpp for the rationale (the reference does
this assembly in Python/torch per step, model_runner.py:333-611).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from qserve_tpu.logger import init_logger

logger = init_logger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "marshal.cpp")
_lock = threading.Lock()
_lib = None
_tried = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> Optional[str]:
    # Cache keyed on the source hash, not mtime (git checkouts don't preserve
    # mtimes, and a stale binary from another arch/glibc must never load).
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_HERE, f"marshal-{digest}.so")
        if not os.path.exists(so):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", so, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        return so
    except Exception as e:  # no toolchain / read-only fs -> fallback
        logger.warning("native marshal build failed (%s); using numpy fallback", e)
        return None


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("QSERVE_TPU_NO_NATIVE", "0") == "1":
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:  # wrong arch/glibc -> fallback, don't crash
            logger.warning("native marshal load failed (%s); using numpy fallback", e)
            return None
        lib.qs_pack_decode.argtypes = [
            ctypes.c_int32, _I32P, _I32P, _I32P, _I32P,
            ctypes.c_int32, ctypes.c_int32, _I32P, _I32P, _I32P,
        ]
        lib.qs_pack_decode.restype = None
        lib.qs_pack_prefill.argtypes = [
            ctypes.c_int32, _I32P, _I32P, _I32P, _I32P, _I32P,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I32P, _I32P, _I32P, _I32P, _I32P, _I32P,
        ]
        lib.qs_pack_prefill.restype = ctypes.c_int32
        _lib = lib
        logger.info("native marshal loaded from %s", so)
    return _lib


def _flatten(lists: Sequence[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(lists) + 1, np.int32)
    for i, l in enumerate(lists):
        offsets[i + 1] = offsets[i] + len(l)
    flat = np.empty(offsets[-1], np.int32)
    for i, l in enumerate(lists):
        flat[offsets[i] : offsets[i + 1]] = l
    return flat, offsets


def pack_decode(
    last_tokens: Sequence[int],
    ctx_lens: Sequence[int],
    tables: Sequence[Sequence[int]],
    B_pad: int,
    maxP: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (tokens [B_pad], ctx [B_pad], block_table [B_pad, maxP])."""
    n = len(last_tokens)
    lib = get_lib()
    out_tok = np.empty(B_pad, np.int32)
    out_ctx = np.empty(B_pad, np.int32)
    out_bt = np.empty((B_pad, maxP), np.int32)
    if lib is not None:
        flat, offs = _flatten(tables)
        lib.qs_pack_decode(
            n, np.ascontiguousarray(last_tokens, np.int32),
            np.ascontiguousarray(ctx_lens, np.int32), flat, offs,
            B_pad, maxP, out_tok, out_ctx, out_bt.reshape(-1),
        )
        return out_tok, out_ctx, out_bt
    out_tok[:] = 0
    out_ctx[:] = 0
    out_bt[:] = 0
    out_tok[:n] = last_tokens
    out_ctx[:n] = ctx_lens
    for i, t in enumerate(tables):
        out_bt[i, : min(len(t), maxP)] = t[:maxP]
    return out_tok, out_ctx, out_bt


def pack_prefill(
    prompts: Sequence[Sequence[int]],
    tables: Sequence[Sequence[int]],
    block_size: int,
    T_pad: int,
    B_pad: int,
    image_token: Optional[int] = None,
    starts: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, ...]:
    """-> (tokens, positions, segids, pages, slots, img_idx [T_pad],
           last_idx [B_pad], total_tokens).

    starts: absolute start position per prompt (chunked prefill — `prompts`
    then holds only the chunk's tokens); None = all prompts start at 0."""
    n = len(prompts)
    lib = get_lib()
    outs = [np.empty(T_pad, np.int32) for _ in range(6)]
    last_idx = np.empty(B_pad, np.int32)
    itok = np.int32(image_token) if image_token is not None else np.int32(-(2**31))
    st = np.ascontiguousarray(
        starts if starts is not None else np.zeros(n, np.int32), dtype=np.int32
    )
    if lib is not None:
        pflat, poffs = _flatten(prompts)
        tflat, toffs = _flatten(tables)
        total = lib.qs_pack_prefill(
            n, pflat, poffs, tflat, toffs, st, block_size, itok, T_pad, B_pad,
            *outs, last_idx,
        )
        if total < 0:
            raise ValueError(
                f"pack_prefill overflow: {n} prompts ({int(poffs[-1])} tokens) "
                f"do not fit T_pad={T_pad} / B_pad={B_pad} or a page table is "
                "too short"
            )
        return (*outs, last_idx, int(total))
    total = sum(len(p) for p in prompts)
    if n > B_pad or total > T_pad or any(
        p and (int(st[i]) + len(p) - 1) // block_size >= len(tables[i])
        for i, p in enumerate(prompts)
    ):
        raise ValueError(
            f"pack_prefill overflow: {n} prompts ({total} tokens) do not fit "
            f"T_pad={T_pad} / B_pad={B_pad} or a page table is too short"
        )
    tokens, positions, segids, pages, slots, img_idx = outs
    tokens[:] = 0
    positions[:] = 0
    segids[:] = 0
    pages[:] = -1
    slots[:] = 0
    img_idx[:] = 0
    last_idx[:] = 0
    t = 0
    n_img = 0
    for i, prompt in enumerate(prompts):
        table = tables[i]
        s0 = int(st[i])
        for p, tok in enumerate(prompt):
            tokens[t] = tok
            positions[t] = s0 + p
            segids[t] = i + 1
            pages[t] = table[(s0 + p) // block_size]
            slots[t] = (s0 + p) % block_size
            if tok == itok:
                img_idx[t] = n_img
                n_img += 1
            t += 1
        last_idx[i] = t - 1
    return (tokens, positions, segids, pages, slots, img_idx, last_idx, t)
