"""Tensor-parallel model runner: the engine hot loop over a device mesh.

The reference's TP is vestigial (models hardcode tp_size=1, distributed init
commented out — SURVEY.md §2.5). Here `-tp N` builds a (dp=1, tp=N) mesh,
quantizes the weights per shard, shards the KV cache by kv-head, and drives
the shard_map-wrapped step functions from parallel/tp.py. The engine above
is unchanged: one logical scheduler feeding one SPMD program.

Multi-host note: under `jax.distributed` the same code runs SPMD across
hosts — every host runs the identical scheduler on identical requests
(deterministic replication), the mesh spans all devices, and each host feeds
its addressable shards. Request ingestion must be replicated or broadcast by
the serving frontend (see docs/PARITY.md §parallelism).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qserve_tpu.kernels import kv_cache as kvc
from qserve_tpu.logger import init_logger
from qserve_tpu.models import llama
from qserve_tpu.parallel import tp as tpmod
from qserve_tpu.sequence import SequenceGroupMetadata
from qserve_tpu.utils.utils import bucket
from qserve_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)


class TPModelRunner(ModelRunner):
    """ModelRunner whose step functions run under shard_map over ('dp','tp')."""

    # n>1 / best_of>1 prompts: extra candidates host-sampled from the
    # all-gathered last-token logits (prefill_logits step fn)
    supports_multi_sample = True

    def __init__(
        self,
        float_params: dict,
        model_args: llama.LlamaArgs,
        max_model_len: int,
        block_size: int,
        tp_size: int,
        dp_size: int = 1,
        max_num_batched_tokens: int = 2048,
        max_num_seqs: int = 256,
        rng_seed: int = 0,
    ) -> None:
        import dataclasses

        # dp > 1 inside ONE engine needs per-replica request routing; serve
        # with one engine per dp replica instead (how the reference does DP,
        # scripts/vlm_cap_scripts/*_8gpus.sh) — the dp axis here is exercised
        # by the multi-chip dryrun at the step-function level.
        assert dp_size == 1, "engine-level dp>1: run one engine per replica"
        args = dataclasses.replace(model_args, tp_size=tp_size)
        self.mesh = tpmod.make_mesh(dp_size, tp_size)
        params, specs = tpmod.quantize_params_tp(float_params, args)
        params = tpmod.shard_params(params, specs, self.mesh)
        super().__init__(
            params, args, max_model_len, block_size,
            max_num_batched_tokens=max_num_batched_tokens,
            max_num_seqs=max_num_seqs, rng_seed=rng_seed,
        )
        self.param_specs = specs
        (self._prefill_fn, self._decode_fn, self._chunk_fn,
         self._prefill_logits_fn, self._chunk_decode_fn,
         self._chunk_logits_fn) = tpmod.build_step_fns(
            args, self.mesh, specs
        )
        # multi-host: every host runs the identical (deterministic) scheduler,
        # so host-local marshalled arrays are globally consistent; they enter
        # the mesh-spanning step fns as global arrays built from each host's
        # addressable shards (parallel/distributed.py design notes)
        self.multihost = jax.process_count() > 1

    def _feed(self, x, spec=None):
        """np/jnp host array -> step-fn input (global array when multi-host)."""
        if not self.multihost:
            return jnp.asarray(x)
        from jax.experimental import multihost_utils as mhu
        from jax.sharding import PartitionSpec as P

        return mhu.host_local_array_to_global_array(
            np.asarray(x), self.mesh, spec if spec is not None else P()
        )

    def _fetch(self, toks) -> np.ndarray:
        """Sampled tokens -> host np (replicated across a host's shards)."""
        if not self.multihost:
            return np.asarray(jax.device_get(toks))
        return np.asarray(toks.addressable_data(0))

    @classmethod
    def from_random_tp(cls, model_args, max_model_len, block_size, tp_size,
                       seed: int = 0, **kw):
        if model_args.num_experts:
            from qserve_tpu.models import mixtral

            fp = mixtral.random_float_params(jax.random.PRNGKey(seed), model_args)
        else:
            fp = llama.random_float_params(jax.random.PRNGKey(seed), model_args)
        return cls(fp, model_args, max_model_len, block_size, tp_size, **kw)

    def shard_cache(self, cache: kvc.KVCache) -> kvc.KVCache:
        return tpmod.shard_kv_cache(cache, self.mesh)

    # ------------------------------------------------------------------
    def execute_prefill(self, metadata, cache_engine):
        from qserve_tpu import native
        from qserve_tpu.worker.model_runner import sample_host

        if any(md.chunk is not None and md.chunk[0] > 0 for md in metadata):
            # prefix-continuation step (chunked prefill / prefix skip)
            assert len(metadata) == 1
            return self._execute_prefill_chunk_tp(metadata[0], cache_engine)

        prompts, tables, seq_order, sp_list, completes = [], [], [], [], []
        total = 0
        for md in metadata:
            for seq_id, data in md.seq_data.items():
                ids = data.get_token_ids()
                if md.chunk is not None:  # first chunk of a long prompt
                    ids = ids[md.chunk[0] : md.chunk[1]]
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
        tok, pos, sg, pg, sl, _, li, _ = native.pack_prefill(
            prompts, tables, self.block_size, T, B
        )
        temp, topp, topk = self._sampling_arrays(sp_list, B)
        from jax.sharding import PartitionSpec as P

        dpv = P(tpmod.DP)
        step_args = (
            self.params, cache_engine.cache,
            *(self._feed(x, dpv) for x in (tok, pos, sg, pg, sl, li)),
            self._feed(temp, dpv), self._feed(topp, dpv), self._feed(topk, dpv),
            self._feed(np.asarray(self._next_key())),
        )
        self.last_extra_samples = {}
        if any(sp.best_of > 1 and c for sp, c in zip(sp_list, completes)):
            toks, cache_engine.cache, logits = self._prefill_logits_fn(*step_args)
            logits_np = np.asarray(
                logits.addressable_data(0) if self.multihost
                else jax.device_get(logits)
            )
            for i, (sid, sp) in enumerate(zip(seq_order, sp_list)):
                if sp.best_of > 1 and completes[i]:
                    self.last_extra_samples[sid] = sample_host(
                        logits_np[i], sp, self._host_rng, sp.best_of - 1
                    )
        else:
            toks, cache_engine.cache = self._prefill_fn(*step_args)
        out = self._fetch(toks)
        return [(sid, int(out[i])) for i, sid in enumerate(seq_order)]

    def _execute_prefill_chunk_tp(self, md, cache_engine):
        """One chunk of one prompt whose prefix KV is already cached, run
        through the shard_map chunk step."""
        from qserve_tpu import native
        from jax.sharding import PartitionSpec as P

        (seq_id, data), = md.seq_data.items()
        start, end = md.chunk
        ids = data.get_token_ids()[start:end]
        table = md.block_tables[seq_id]

        T = bucket(len(ids), 16, self.max_num_batched_tokens * 2)
        tok, pos, sg, pg, sl, _, li, _ = native.pack_prefill(
            [ids], [table], self.block_size, T, 1, starts=[start]
        )
        bt = np.zeros((1, self.max_pages_per_seq), np.int32)
        bt[0, : len(table)] = table
        temp, topp, topk = self._sampling_arrays([md.sampling_params], 1)

        dpv = P(tpmod.DP)
        self.last_extra_samples = {}
        sp = md.sampling_params
        step_args = (
            self.params, cache_engine.cache,
            *(self._feed(x, dpv) for x in (tok, pos, sg, pg, sl, li)),
            self._feed(bt, P(tpmod.DP, None)),
            self._feed(np.asarray([start], np.int32), dpv),
            self._feed(temp, dpv), self._feed(topp, dpv), self._feed(topk, dpv),
            self._feed(np.asarray(self._next_key())),
        )
        if sp.best_of > 1 and end == data.get_len():
            from qserve_tpu.worker.model_runner import sample_host

            toks, cache_engine.cache, logits = self._chunk_logits_fn(*step_args)
            logits_np = np.asarray(
                logits.addressable_data(0) if self.multihost
                else jax.device_get(logits)
            )
            self.last_extra_samples[seq_id] = sample_host(
                logits_np[0], sp, self._host_rng, sp.best_of - 1
            )
        else:
            toks, cache_engine.cache = self._chunk_fn(*step_args)
        out = self._fetch(toks)
        return [(seq_id, int(out[0]))]

    def execute_chunk_with_decode(self, chunk_md, decode_mds, cache_engine):
        """Mixed step (one prefill chunk + decode batch) under shard_map."""
        from qserve_tpu import native
        from jax.sharding import PartitionSpec as P

        (seq_id, data), = chunk_md.seq_data.items()
        start, end = chunk_md.chunk
        ids = data.get_token_ids()[start:end]
        table = chunk_md.block_tables[seq_id]

        T = bucket(len(ids), 16, self.max_num_batched_tokens * 2)
        tok, pos, sg, pg, sl, _, li, _ = native.pack_prefill(
            [ids], [table], self.block_size, T, 1, starts=[start]
        )
        bt = np.zeros((1, self.max_pages_per_seq), np.int32)
        bt[0, : len(table)] = table

        d_order, d_tokens, d_ctx, d_tables, d_sps = [], [], [], [], []
        for md in decode_mds:
            for sid, d in md.seq_data.items():
                d_order.append(sid)
                d_tokens.append(d.get_last_token_id())
                d_ctx.append(d.get_len())
                d_tables.append(md.block_tables[sid])
                d_sps.append(md.sampling_params)
        B = bucket(len(d_order), 1, self.max_num_seqs)
        d_tok, d_cl, d_bt = native.pack_decode(
            d_tokens, d_ctx, d_tables, B, self.max_pages_per_seq
        )
        temp, topp, topk = self._sampling_arrays(
            [chunk_md.sampling_params] + d_sps, 1 + B
        )

        dpv = P(tpmod.DP)
        self.last_extra_samples = {}
        toks, cache_engine.cache = self._chunk_decode_fn(
            self.params, cache_engine.cache,
            *(self._feed(x, dpv) for x in (tok, pos, sg, pg, sl, li)),
            self._feed(bt, P(tpmod.DP, None)),
            self._feed(np.asarray([start], np.int32), dpv),
            self._feed(d_tok, dpv), self._feed(d_bt, P(tpmod.DP, None)),
            self._feed(d_cl, dpv),
            self._feed(temp, dpv), self._feed(topp, dpv), self._feed(topk, dpv),
            self._feed(np.asarray(self._next_key())),
        )
        out = self._fetch(toks)
        return [(seq_id, int(out[0]))] + [
            (sid, int(out[1 + i])) for i, sid in enumerate(d_order)
        ]

    def execute_decode(self, metadata, cache_engine):
        from qserve_tpu import native

        seq_order, tokens, ctx, tables, sp_list = [], [], [], [], []
        for md in metadata:
            for seq_id, data in md.seq_data.items():
                seq_order.append(seq_id)
                tokens.append(data.get_last_token_id())
                ctx.append(data.get_len())
                tables.append(md.block_tables[seq_id])
                sp_list.append(md.sampling_params)

        B = bucket(len(seq_order), 1, self.max_num_seqs)
        tok, cl, bt = native.pack_decode(
            tokens, ctx, tables, B, self.max_pages_per_seq
        )
        temp, topp, topk = self._sampling_arrays(sp_list, B)
        from jax.sharding import PartitionSpec as P

        dpv = P(tpmod.DP)
        toks, cache_engine.cache = self._decode_fn(
            self.params, cache_engine.cache,
            self._feed(tok, dpv), self._feed(bt, P(tpmod.DP, None)),
            self._feed(cl, dpv),
            self._feed(temp, dpv), self._feed(topp, dpv), self._feed(topk, dpv),
            self._feed(np.asarray(self._next_key())),
        )
        out = self._fetch(toks)
        return [(sid, int(out[i])) for i, sid in enumerate(seq_order)]
