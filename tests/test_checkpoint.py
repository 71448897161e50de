"""Checkpoint conversion / loading tests with a synthetic HF checkpoint."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qserve_tpu.config import QuantSpec
from qserve_tpu.convert import checkpoint_converter as cc
from qserve_tpu.models import llama, loader

CFG = dict(
    architectures=["LlamaForCausalLM"],
    vocab_size=256,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
)


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Write a tiny HF-format llama checkpoint to disk."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("hf_llama")
    with open(d / "config.json", "w") as f:
        json.dump(CFG, f)
    rng = np.random.default_rng(0)
    E, I, V = CFG["hidden_size"], CFG["intermediate_size"], CFG["vocab_size"]
    H, KV = CFG["num_attention_heads"], CFG["num_key_value_heads"]
    D = E // H
    state = {
        "model.embed_tokens.weight": rng.standard_normal((V, E), np.float32) * 0.05,
        "model.norm.weight": np.ones(E, np.float32),
        "lm_head.weight": rng.standard_normal((V, E), np.float32) * 0.05,
    }
    for li in range(CFG["num_hidden_layers"]):
        p = f"model.layers.{li}"
        state.update({
            f"{p}.input_layernorm.weight": np.ones(E, np.float32),
            f"{p}.post_attention_layernorm.weight": np.ones(E, np.float32),
            f"{p}.self_attn.q_proj.weight": rng.standard_normal((H * D, E), np.float32) * 0.05,
            f"{p}.self_attn.k_proj.weight": rng.standard_normal((KV * D, E), np.float32) * 0.05,
            f"{p}.self_attn.v_proj.weight": rng.standard_normal((KV * D, E), np.float32) * 0.05,
            f"{p}.self_attn.o_proj.weight": rng.standard_normal((E, H * D), np.float32) * 0.05,
            f"{p}.mlp.gate_proj.weight": rng.standard_normal((I, E), np.float32) * 0.05,
            f"{p}.mlp.up_proj.weight": rng.standard_normal((I, E), np.float32) * 0.05,
            f"{p}.mlp.down_proj.weight": rng.standard_normal((E, I), np.float32) * 0.05,
        })
    save_file(state, str(d / "model.safetensors"))
    return str(d)


class TestHFLoading:
    def test_load_and_quantize(self, hf_dir):
        quant = QuantSpec.from_precision("w4a8kv4")
        args, params = loader.load_model(hf_dir, quant)
        assert args.num_layers == 2
        assert params.embed.shape == (256, 128)
        # fused qkv, stacked over layers: [L, E/2 packed, (H+2KV)*D]
        assert params.layers.qkv.qweight.shape == (2, 128 // 2, (4 + 4) * 32)

    def test_tied_embeddings_fallback(self, hf_dir, tmp_path):
        """Checkpoint without lm_head uses embed.T."""
        import shutil
        from safetensors.numpy import load_file, save_file

        d = tmp_path / "tied"
        shutil.copytree(hf_dir, d)
        state = load_file(str(d / "model.safetensors"))
        del state["lm_head.weight"]
        save_file(state, str(d / "model.safetensors"))
        args, params = loader.load_model(str(d), QuantSpec.from_precision("w16a16"))
        np.testing.assert_array_equal(
            np.asarray(params.lm_head), np.asarray(params.embed.T)
        )


class TestPackedCheckpoint:
    @pytest.mark.parametrize("precision,gs", [("w4a8kv4", -1), ("w4a8kv4", 128),
                                              ("w8a8kv8", -1), ("w16a16kv8", -1)])
    def test_roundtrip(self, hf_dir, tmp_path, precision, gs):
        quant = QuantSpec.from_precision(precision, gs)
        # w4 per-group needs K % 128 == 0: E=128, I=256, q_size=128 all ok
        args, params = loader.load_model(hf_dir, quant)
        out = str(tmp_path / "packed")
        cc.save_packed_checkpoint(params, args, out)
        args2 = cc.load_packed_config(out)
        assert args2.quant == args.quant
        params2 = cc.load_packed_checkpoint(out, args2)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_convert_cli_path(self, hf_dir, tmp_path):
        out = str(tmp_path / "packed_cli")
        cc.convert_hf_checkpoint(hf_dir, out, "w4a8kv4", -1)
        args = cc.load_packed_config(out)
        params = cc.load_packed_checkpoint(out, args)
        # loading via quant_path equals converting fresh
        args3, params3 = loader.load_model(hf_dir, args.quant, quant_path=out)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params3)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_generation_identical_after_roundtrip(self, hf_dir, tmp_path):
        from qserve_tpu.kernels import kv_cache as kvc

        quant = QuantSpec.from_precision("w4a8kv4")
        args, params = loader.load_model(hf_dir, quant)
        out = str(tmp_path / "packed_gen")
        cc.save_packed_checkpoint(params, args, out)
        params2 = cc.load_packed_checkpoint(out, args)

        def gen(p):
            kv = kvc.create_kv_cache(args.num_layers, 8, args.num_kv_heads, 16,
                                     args.head_dim, 4)
            T = 16
            tok = np.zeros(T, np.int32); tok[:5] = [1, 2, 3, 4, 5]
            pos = np.zeros(T, np.int32); pos[:5] = np.arange(5)
            seg = np.zeros(T, np.int32); seg[:5] = 1
            pages = np.full(T, -1, np.int32); pages[:5] = 0
            slots = np.zeros(T, np.int32); slots[:5] = np.arange(5)
            logits, _ = llama.prefill(
                p, kv, *map(jnp.asarray, (tok, pos, seg, pages, slots,
                                          np.array([4], np.int32))), args)
            return np.asarray(logits)

        np.testing.assert_array_equal(gen(params), gen(params2))
