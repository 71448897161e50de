"""Tokenizer loading (reference: qserve/utils/tokenizer.py)."""

from __future__ import annotations

from typing import Optional

from qserve_tpu.logger import init_logger

logger = init_logger(__name__)


def get_tokenizer(
    tokenizer_name: str,
    tokenizer_mode: str = "auto",
    trust_remote_code: bool = True,
    **kwargs,
):
    from transformers import AutoTokenizer

    if tokenizer_mode == "slow":
        kwargs["use_fast"] = False
    try:
        tok = AutoTokenizer.from_pretrained(
            tokenizer_name, trust_remote_code=trust_remote_code, **kwargs
        )
    except Exception as e:  # pragma: no cover - network/deps dependent
        logger.warning("Failed to load fast tokenizer (%s); retrying slow", e)
        tok = AutoTokenizer.from_pretrained(
            tokenizer_name, use_fast=False, trust_remote_code=trust_remote_code
        )
    return tok


def detokenize_incrementally(tokenizer, all_token_ids, prev_text_len: int):
    """Cheap incremental detokenization: decode all, return the new suffix."""
    text = tokenizer.decode(all_token_ids, skip_special_tokens=True)
    return text, text[prev_text_len:]
