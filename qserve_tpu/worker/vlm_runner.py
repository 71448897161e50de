"""VLM model runner: vision encode + image-spliced prefill.

Reference counterpart: the run_vlm branches of qserve/worker/model_runner.py
(:133-262 model dispatch, image loading at prompt stage via InputMetadata,
input_metadata.py:206-234) and the VILA wrappers' multimodal splicing. Here
prompts arrive already *expanded* (tokens_per_image markers per image, see
models/vila.py), so this runner only has to (a) encode the step's images and
(b) hand the flat image embeddings + per-token indices to the jitted
vlm_prefill. Decode is inherited unchanged — image tokens live in the KV
cache like any others.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.layers import sampler as sampler_mod
from qserve_tpu.logger import init_logger
from qserve_tpu.models import vila
from qserve_tpu.sequence import SequenceGroupMetadata
from qserve_tpu.utils.constants import IMAGE_TOKEN_INDEX
from qserve_tpu.utils.utils import bucket
from qserve_tpu.worker.model_runner import ModelRunner, sample_host

logger = init_logger(__name__)


@functools.partial(jax.jit, static_argnames=("args",))
def _encode_images_step(params, images, *, args):
    return vila.encode_images(params, images, args)


@functools.partial(jax.jit, static_argnames=("args",), donate_argnames=("kv",))
def _vlm_prefill_step(
    llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots, last_idx,
    temp, topp, topk, key, *, args
):
    logits, kv = vila.vlm_prefill(
        llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots,
        last_idx, args,
    )
    toks = sampler_mod.sample(logits, temp, topp, topk, key)
    return toks, kv


@functools.partial(jax.jit, static_argnames=("args",), donate_argnames=("kv",))
def _vlm_prefill_step_logits(
    llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots, last_idx,
    temp, topp, topk, key, *, args
):
    """VLM prefill that also returns last-token logits (n>1 / best_of>1
    prompts: the host draws the extra candidate tokens from these rows)."""
    logits, kv = vila.vlm_prefill(
        llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots,
        last_idx, args,
    )
    toks = sampler_mod.sample(logits, temp, topp, topk, key)
    return toks, kv, logits.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("args",), donate_argnames=("kv",))
def _vlm_prefill_chunk_step(
    llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots, last_idx,
    bt, prefix_len, temp, topp, topk, key, *, args
):
    logits, kv = vila.vlm_prefill_chunk(
        llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots,
        last_idx, bt, prefix_len, args,
    )
    toks = sampler_mod.sample(logits, temp, topp, topk, key)
    return toks, kv


@functools.partial(jax.jit, static_argnames=("args",), donate_argnames=("kv",))
def _vlm_prefill_chunk_step_logits(
    llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots, last_idx,
    bt, prefix_len, temp, topp, topk, key, *, args
):
    """Final chunk of a best_of>1 image prompt: also return the last-token
    logits so the host can draw the extra candidates."""
    logits, kv = vila.vlm_prefill_chunk(
        llm_params, kv, tok, embeds, img_idx, pos, seg, pages, slots,
        last_idx, bt, prefix_len, args,
    )
    toks = sampler_mod.sample(logits, temp, topp, topk, key)
    return toks, kv, logits.astype(jnp.float32)


class VLMModelRunner(ModelRunner):
    """ModelRunner whose prefill splices vision-tower embeddings."""

    # n>1 / best_of>1 image prompts: extra candidates host-sampled from the
    # spliced prefill's last-token logits, exactly like the dense runner
    supports_multi_sample = True

    def __init__(self, vila_params: vila.VilaParams, vila_args: vila.VilaArgs,
                 *args, **kw):
        super().__init__(vila_params.llm, vila_args.llm, *args, **kw)
        self.vila_params = vila_params
        self.vila_args = vila_args
        # seq_id -> encoded image embeddings, reused across a chunked
        # prompt's continuation steps (vision tower runs once per prompt)
        self._chunk_embeds = {}

    @classmethod
    def from_random_vlm(cls, vila_args: vila.VilaArgs, max_model_len: int,
                        block_size: int, seed: int = 0, **kw):
        params = vila.random_params(jax.random.PRNGKey(seed), vila_args)
        return cls(params, vila_args, max_model_len, block_size, **kw)

    # ------------------------------------------------------------------
    def _encode_prompt_images(self, pixel_values) -> Tuple[jnp.ndarray, int]:
        """[n_img, 3, S, S] -> (flat embeds [n_bucket*tpi, E], n_img)."""
        images = np.asarray(pixel_values)
        n_img = images.shape[0]
        n_bucket = bucket(n_img, 1, 64)
        if n_bucket != n_img:
            pad = np.zeros((n_bucket - n_img, *images.shape[1:]), images.dtype)
            images = np.concatenate([images, pad], axis=0)
        embeds = _encode_images_step(
            self.vila_params, jnp.asarray(images), args=self.vila_args
        )
        return embeds, n_img

    def execute_prefill(
        self,
        metadata: List[SequenceGroupMetadata],
        cache_engine,
    ) -> List[Tuple[int, int]]:
        if any(md.chunk is not None and md.chunk[0] > 0 for md in metadata):
            # prefix-continuation chunk of an image-spliced prompt
            assert len(metadata) == 1
            md = metadata[0]
            if md.multi_modal_data and md.multi_modal_data.get(
                "pixel_values"
            ) is not None:
                return self._execute_prefill_chunk_vlm(md, cache_engine)
            return super().execute_prefill(metadata, cache_engine)

        pixel_list = [
            md.multi_modal_data["pixel_values"]
            for md in metadata
            if md.multi_modal_data and md.multi_modal_data.get("pixel_values") is not None
        ]
        if not pixel_list:
            return super().execute_prefill(metadata, cache_engine)

        images = np.concatenate(pixel_list, axis=0)  # [n_img, 3, S, S]
        embeds, n_img = self._encode_prompt_images(images)

        # marshal the packed prompt stream (image markers keep their id)
        from qserve_tpu import native

        prompts: List[List[int]] = []
        tables: List[List[int]] = []
        seq_order: List[int] = []
        sp_list = []
        completes: List[bool] = []  # this step finishes the prompt
        total = 0
        chunked = False
        for md in metadata:
            for seq_id, data in md.seq_data.items():
                ids = data.get_token_ids()
                if md.chunk is not None:  # first chunk of a long VLM prompt
                    ids = ids[md.chunk[0] : md.chunk[1]]
                    chunked = True
                    # continuation chunks reuse this prompt's embeddings
                    self._chunk_embeds[seq_id] = embeds
                completes.append(
                    md.chunk is None or md.chunk[1] >= data.get_len()
                )
                prompts.append(ids)
                tables.append(md.block_tables[seq_id])
                total += len(ids)
                seq_order.append(seq_id)
                sp_list.append(md.sampling_params)

        T = bucket(total, 16, self.max_num_batched_tokens * 2)
        B = bucket(len(seq_order), 1, self.max_num_seqs)
        tok, pos, sg, pg, sl, ii, li, _ = native.pack_prefill(
            prompts, tables, self.block_size, T, B,
            image_token=IMAGE_TOKEN_INDEX,
        )
        tpi = self.vila_args.tokens_per_image
        n_img_tok = sum(p.count(IMAGE_TOKEN_INDEX) for p in prompts)
        if chunked:
            # an image's marker run may extend past the chunk boundary
            assert n_img_tok <= n_img * tpi
        else:
            assert n_img_tok == n_img * tpi, (
                f"image token count {n_img_tok} != {n_img} images x {tpi}"
            )
        temp, topp, topk = self._sampling_arrays(sp_list, B)

        self.last_extra_samples = {}
        want_extra = any(
            sp.best_of > 1 and c for sp, c in zip(sp_list, completes)
        )
        step_args = (
            self.params,
            cache_engine.cache,
            jnp.asarray(tok), embeds, jnp.asarray(ii),
            jnp.asarray(pos), jnp.asarray(sg), jnp.asarray(pg),
            jnp.asarray(sl), jnp.asarray(li),
            temp, topp, topk,
            self._next_key(),
        )
        if want_extra:
            toks, cache_engine.cache, logits = _vlm_prefill_step_logits(
                *step_args, args=self.model_args
            )
            logits_np = np.asarray(jax.device_get(logits))
            for i, (sid, sp) in enumerate(zip(seq_order, sp_list)):
                if sp.best_of > 1 and completes[i]:
                    self.last_extra_samples[sid] = sample_host(
                        logits_np[i], sp, self._host_rng, sp.best_of - 1
                    )
        else:
            toks, cache_engine.cache = _vlm_prefill_step(
                *step_args, args=self.model_args
            )
        out = np.asarray(jax.device_get(toks))
        return [(sid, int(out[i])) for i, sid in enumerate(seq_order)]

    # ------------------------------------------------------------------
    def _execute_prefill_chunk_vlm(
        self, md: SequenceGroupMetadata, cache_engine
    ) -> List[Tuple[int, int]]:
        """Continuation chunk of an image-spliced prompt: splice this
        chunk's image-marker positions against the prompt's (cached) flat
        image embeddings at their global offsets."""
        from qserve_tpu import native

        (seq_id, data), = md.seq_data.items()
        start, end = md.chunk
        full_ids = data.get_token_ids()
        ids = full_ids[start:end]
        table = md.block_tables[seq_id]

        embeds = self._chunk_embeds.get(seq_id)
        if embeds is None:  # e.g. recompute-preempted mid-chunk: re-encode
            embeds, _ = self._encode_prompt_images(
                md.multi_modal_data["pixel_values"]
            )
            self._chunk_embeds[seq_id] = embeds
        img_before = sum(
            1 for t in full_ids[:start] if t == IMAGE_TOKEN_INDEX
        )

        T = bucket(len(ids), 16, self.max_num_batched_tokens * 2)
        tok, pos, sg, pg, sl, ii, li, _ = native.pack_prefill(
            [ids], [table], self.block_size, T, 1, starts=[start],
            image_token=IMAGE_TOKEN_INDEX,
        )
        # shift this chunk's marker indices to their global embed rows
        ii = np.where(tok == IMAGE_TOKEN_INDEX, ii + img_before, 0).astype(
            np.int32
        )
        bt = np.zeros((1, self.max_pages_per_seq), np.int32)
        bt[0, : len(table)] = table
        temp, topp, topk = self._sampling_arrays([md.sampling_params], 1)

        self.last_extra_samples = {}
        sp = md.sampling_params
        step_args = (
            self.params,
            cache_engine.cache,
            jnp.asarray(tok), embeds, jnp.asarray(ii),
            jnp.asarray(pos), jnp.asarray(sg), jnp.asarray(pg),
            jnp.asarray(sl), jnp.asarray(li),
            jnp.asarray(bt), jnp.int32(start),
            temp, topp, topk,
            self._next_key(),
        )
        if sp.best_of > 1 and end == len(full_ids):
            # final chunk of an n>1 image prompt: host-sample the extras
            toks, cache_engine.cache, logits = _vlm_prefill_chunk_step_logits(
                *step_args, args=self.model_args
            )
            logits_np = np.asarray(jax.device_get(logits))
            self.last_extra_samples[seq_id] = sample_host(
                logits_np[0], sp, self._host_rng, sp.best_of - 1
            )
        else:
            toks, cache_engine.cache = _vlm_prefill_chunk_step(
                *step_args, args=self.model_args
            )
        if end == len(full_ids):  # final chunk: release the cached embeds
            self._chunk_embeds.pop(seq_id, None)
        out = np.asarray(jax.device_get(toks))
        return [(seq_id, int(out[0]))]
