"""Webdataset reader + resumable captioning driver tests."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from qserve_tpu.utils import webdataset as wds


def make_tar(path, n=5):
    from PIL import Image

    rng = np.random.default_rng(0)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"sample{i:04d}"
            img = Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            meta = json.dumps({"idx": i}).encode()
            info = tarfile.TarInfo(f"{key}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))


class TestWebdataset:
    def test_iter_samples(self, tmp_path):
        p = str(tmp_path / "shard.tar")
        make_tar(p, n=4)
        samples = list(wds.iter_samples(p))
        assert len(samples) == 4
        assert all("png" in s and "json" in s for s in samples)
        assert samples[0]["__key__"] == "sample0000"
        assert samples[2]["json"]["idx"] == 2
        assert wds.first_image(samples[0]) == samples[0]["png"]

    def test_brace_expansion(self):
        shards = wds.list_shards("/x/s-{00003..00005}.tar")
        assert shards == ["/x/s-00003.tar", "/x/s-00004.tar", "/x/s-00005.tar"]

    def test_worker_sharding(self):
        shards = [f"s{i}" for i in range(10)]
        parts = [wds.shard_for_worker(shards, w, 3) for w in range(3)]
        assert sorted(sum(parts, [])) == sorted(shards)
        assert parts[0] == ["s0", "s3", "s6", "s9"]


class TestCaptionDriver:
    def test_caption_shard_resumable(self, tmp_path):
        from qserve_tpu.config import CacheConfig, QuantSpec, SchedulerConfig
        from qserve_tpu.engine.llm_engine import LLMEngine
        from qserve_tpu.entrypoints.vila_caption import caption_shard
        from qserve_tpu.sampling_params import SamplingParams
        from qserve_tpu.worker.worker import Worker
        from tests.test_vlm_engine import tiny_vila_args

        class FakeTok:
            eos_token_id = 0
            bos_token_id = 1

            def encode(self, s):
                return [1] + [ord(c) % 100 + 2 for c in s.strip()][:6]

            def decode(self, ids, skip_special_tokens=True):
                return " ".join(str(i) for i in ids)

        args = tiny_vila_args()
        cache = CacheConfig(block_size=16, num_device_pages=128,
                            quant=QuantSpec.from_precision("w8a8kv8"))
        sched = SchedulerConfig(max_num_batched_tokens=512, max_num_seqs=4,
                                max_model_len=128)
        worker = Worker.create_vlm(args, cache, sched, seed=0)
        engine = LLMEngine(worker, sched, cache, tokenizer=FakeTok())

        tar = str(tmp_path / "shard.tar")
        make_tar(tar, n=5)
        out = str(tmp_path / "shard.json")
        res = caption_shard(
            engine, tar, out, "<image>\n describe",
            SamplingParams(max_tokens=3, temperature=0.0, ignore_eos=True),
            batch=4,
        )
        assert len(res) == 5
        with open(out) as f:
            assert json.load(f) == res
