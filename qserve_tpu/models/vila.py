"""VILA/LLaVA-style VLM: vision tower + mm_projector + quantized Llama LLM.

Reference counterparts: modeling/models/vila_llama_w{16a16,8a8,4a8}_unpad.py
(init_vlm :45-77, prepare_inputs_labels_for_multimodal :79-321, forward
:323-365) and llava_llama_w4a8_unpad.py. The reference splices 196-token
image embeddings at IMAGE_TOKEN_INDEX positions on the fly; here prompts are
expanded host-side at request-add time (each image tag becomes
tokens_per_image placeholder ids), so every page/context-length computation
in the scheduler is automatically correct, and the device step just selects
(token-embed | image-embed) per position.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.models import clip, llama, mm_projector
from qserve_tpu.utils.constants import IMAGE_TOKEN_INDEX


@dataclasses.dataclass(frozen=True)
class VilaArgs:
    llm: llama.LlamaArgs
    vision: clip.VisionArgs
    projector: mm_projector.ProjectorArgs

    @property
    def tokens_per_image(self) -> int:
        return self.projector.tokens_per_image


class VilaParams(NamedTuple):
    vision: clip.VisionParams
    projector: mm_projector.ProjectorParams
    llm: llama.LlamaParams


def random_params(key: jax.Array, args: VilaArgs, scale=0.02) -> VilaParams:
    kv, kp, kl = jax.random.split(key, 3)
    return VilaParams(
        vision=clip.random_params(kv, args.vision, scale),
        projector=mm_projector.random_params(kp, args.projector, scale),
        # streaming quantization: never holds the full fp32 LLM (needed to
        # build 8B-class VLMs on a 16GB chip)
        llm=llama.random_quantized_params(kl, args.llm, scale),
    )


# ---------------------------------------------------------------------------
# Host-side prompt expansion
# ---------------------------------------------------------------------------


def expand_multimodal_prompt(
    token_ids: Sequence[int], tokens_per_image: int
) -> List[int]:
    """Each IMAGE_TOKEN_INDEX becomes tokens_per_image placeholder ids.

    (Reference expands inside prepare_inputs_labels_for_multimodal at prefill;
    expanding at request time keeps scheduler block/ctx accounting exact.)
    """
    out: List[int] = []
    for t in token_ids:
        if t == IMAGE_TOKEN_INDEX:
            out.extend([IMAGE_TOKEN_INDEX] * tokens_per_image)
        else:
            out.append(int(t))
    return out


def tokenizer_image_token(
    prompt: str, tokenizer, image_token: str = "<image>"
) -> List[int]:
    """Tokenize a prompt with <image> tags -> ids with IMAGE_TOKEN_INDEX
    markers (reference: llm_engine.py:47-71)."""
    chunks = [tokenizer.encode(c) for c in prompt.split(image_token)]
    ids: List[int] = list(chunks[0])
    bos = getattr(tokenizer, "bos_token_id", None)
    for c in chunks[1:]:
        ids.append(IMAGE_TOKEN_INDEX)
        # strip the BOS that encode() prepends to non-initial chunks
        ids.extend(c[1:] if (bos is not None and c and c[0] == bos) else c)
    return ids


# ---------------------------------------------------------------------------
# Device steps
# ---------------------------------------------------------------------------


def encode_images(
    params: VilaParams, images: jax.Array, args: VilaArgs
) -> jax.Array:
    """[n, C, H, W] -> flat image embeddings [n * tokens_per_image, E_llm].

    Reference: encode_images (llava_arch.py:110-114) = vision tower features
    -> mm_projector.
    """
    feats = clip.forward_features(params.vision, images, args.vision)
    emb = mm_projector.apply_projector(params.projector, feats, args.projector)
    return emb.reshape(-1, args.llm.hidden_size)


def vlm_prefill(
    llm_params: llama.LlamaParams,
    kv,
    token_ids: jax.Array,  # [T] int32 (IMAGE_TOKEN_INDEX at image positions)
    image_embeds: jax.Array,  # [n_img_tokens_padded, E] flat image embeddings
    image_idx: jax.Array,  # [T] int32 index into image_embeds (0 if not image)
    positions: jax.Array,
    segment_ids: jax.Array,
    page_ids: jax.Array,
    slots: jax.Array,
    last_token_idx: jax.Array,
    args: llama.LlamaArgs,
) -> Tuple[jax.Array, Any]:
    """Prefill with image embeddings spliced at marker positions."""
    is_img = token_ids == IMAGE_TOKEN_INDEX
    safe_tok = jnp.where(is_img, 0, token_ids)
    tok_embed = llm_params.embed[safe_tok].astype(jnp.bfloat16)
    img_embed = image_embeds[image_idx].astype(jnp.bfloat16)
    h = jnp.where(is_img[:, None], img_embed, tok_embed)
    return llama.prefill_from_hidden(
        llm_params, kv, h, positions, segment_ids, page_ids, slots,
        last_token_idx, args,
    )


def vlm_prefill_chunk(
    llm_params: llama.LlamaParams,
    kv,
    token_ids: jax.Array,  # [T] int32 chunk tokens (IMAGE_TOKEN_INDEX markers)
    image_embeds: jax.Array,  # [n_img_tokens_padded, E] flat image embeddings
    image_idx: jax.Array,  # [T] int32 index into image_embeds (0 if not image)
    positions: jax.Array,
    segment_ids: jax.Array,
    page_ids: jax.Array,
    slots: jax.Array,
    last_token_idx: jax.Array,
    block_tables: jax.Array,  # [1, maxP] — the chunk's cached prefix
    prefix_len: jax.Array,  # [] int32
    args: llama.LlamaArgs,
) -> Tuple[jax.Array, Any]:
    """One chunk of an image-spliced prompt whose prefix KV is cached
    (VLM chunked prefill; an image's marker run may straddle the chunk
    boundary — image_idx carries the global flat-embed offsets)."""
    is_img = token_ids == IMAGE_TOKEN_INDEX
    safe_tok = jnp.where(is_img, 0, token_ids)
    tok_embed = llm_params.embed[safe_tok].astype(jnp.bfloat16)
    img_embed = image_embeds[image_idx].astype(jnp.bfloat16)
    h = jnp.where(is_img[:, None], img_embed, tok_embed)
    return llama.prefill_chunk_from_hidden(
        llm_params, kv, h, positions, segment_ids, page_ids, slots,
        last_token_idx, block_tables, prefix_len, args,
    )
